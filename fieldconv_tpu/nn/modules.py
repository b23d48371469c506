"""flax.linen modules mirroring the reference nn/ layer.

Parameterisations, shapes and init schemes match the reference modules
exactly (citations inline) so weights can be ported 1:1 for parity tests.
Features are planar complex: (N, C, 2) float32.  Every module takes the
device-resident :class:`EdgeTable` instead of (supp_edges, supp_sten).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as lnn
import jax.numpy as jnp

from ..ops import echo as echo_ops
from ..ops import field_conv as fc_ops
from ..ops.pallas import band_conv as band_ops
from ..ops import tangent as tangent_ops
from ..ops import trans_field as tf_ops
from ..precomp.edge_table import EdgeTable
from ..utils import complexops as co
from .init import torch_linear_bias, torch_linear_weight, xavier_uniform


class FieldConv(lnn.Module):
    """Field convolution layer (reference nn/field_conv.py:36-137).

    axis_name: when set, the vertex rows are a shard_map shard of that graph
    axis; the banded Pallas kernel runs with explicit halo exchange
    (parallel/halo.py) — ``banded`` must then be the LOCAL BandedTable shard.
    """

    in_channels: int
    out_channels: int
    band_limit: int = 1
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, table: EdgeTable, banded=None):
        O, I, R, B = self.out_channels, self.in_channels, self.n_rings, self.band_limit
        if self.ftype in (0, 1):
            zonal = self.param("zonal", xavier_uniform(), (O, I, R))
            spherical = self.param("spherical", xavier_uniform(), (O, I, R, B, 2))
            if self.ftype == 1:
                phase = self.param("phase", xavier_uniform(), (O, I, B + 1))
            else:
                phase = jnp.zeros((O, I, B + 1), dtype=x.dtype)
        else:
            zonal = self.param("zonal", xavier_uniform(), (O, I, R, 2))
            spherical = self.param("spherical", xavier_uniform(), (O, I, R, 2 * B, 2))
            phase = jnp.zeros((O, I, B + 1), dtype=x.dtype)
        if self.axis_name is not None:
            if banded is None:
                raise ValueError("graph-parallel FieldConv requires a banded table")
            from ..precomp.banded import CompactShards, PanelShards

            if isinstance(banded, CompactShards):
                # all-compact multi-chip path: one sharded
                # CompactPanelTable serves conv + ECHO + lift
                from ..parallel.panel_gp import field_conv_compact_gp

                return field_conv_compact_gp(
                    x, banded, zonal, spherical, phase, self.ftype,
                    self.axis_name)
            if isinstance(banded, PanelShards):
                # panel-sharded multi-chip path (parallel/panel_gp.py)
                from ..parallel.panel_gp import field_conv_panel_gp

                return field_conv_panel_gp(
                    x, banded, zonal, spherical, phase, self.ftype,
                    self.axis_name)
            from ..parallel.halo import halo_field_conv

            gk = band_ops.rotated_source_tensor_kmajor(x, self.band_limit)
            return halo_field_conv(
                gk, banded, zonal, spherical, phase, self.ftype, self.axis_name
            )
        if banded is not None:
            # gather-free Pallas path (ops/pallas/band_conv.py)
            return band_ops.field_conv_banded(
                x, banded, zonal, spherical, phase, self.ftype
            )
        return fc_ops.field_conv(
            x, table, zonal, spherical, phase, self.ftype, d_chunk=self.d_chunk
        )


class TransField(lnn.Module):
    """Learned gradient lift (reference nn/trans_field.py:27-113).

    When ``comp`` (a CompressedBandedTable) is passed the aggregation runs
    gather-free over the banded layout (ops/trans_field.py::
    trans_field_banded_contrib); with ``axis_name`` set it additionally
    exchanges boundary rows over the shard_map graph axis.
    """

    in_channels: int
    out_channels: int
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, table: EdgeTable, lift_cols: Tuple[int, int],
                 comp=None):
        O, I, R = self.out_channels, self.in_channels, self.n_rings
        zonal_ang = self.param("zonalAng", xavier_uniform(), (O, I, R))
        zonal_mag = self.param("zonalMag", xavier_uniform(), (O, I, R))
        if self.ftype == 1:
            phase = self.param("phase", xavier_uniform(), (O, I))
        else:
            phase = jnp.zeros((O, I), dtype=x.dtype)
        halo = None
        if self.axis_name is not None:
            if comp is None:
                raise ValueError("graph-parallel TransField requires a "
                                 "CompressedBandedTable")
            from ..precomp.banded import CompactShards, PanelShards

            if isinstance(comp, CompactShards):
                from ..parallel.panel_gp import trans_field_compact_gp

                ang, mag = trans_field_compact_gp(x, comp, lift_cols,
                                                  self.axis_name)
                return tf_ops.trans_field_weight(
                    ang, mag, zonal_ang, zonal_mag, phase, self.ftype)
            if isinstance(comp, PanelShards):
                from ..parallel.panel_gp import trans_field_panel_gp

                ang, mag = trans_field_panel_gp(x, comp, lift_cols,
                                                self.axis_name)
                return tf_ops.trans_field_weight(
                    ang, mag, zonal_ang, zonal_mag, phase, self.ftype)
            from ..parallel.halo import _exchange_halos

            halo = _exchange_halos(x, comp.nh * comp.tb, self.axis_name)
        return tf_ops.trans_field(
            x, table, zonal_ang, zonal_mag, phase, self.ftype,
            lift_cols=lift_cols, d_chunk=self.d_chunk, comp=comp, halo=halo,
        )


class TangentLin(lnn.Module):
    """Bias-free complex linear layer (reference nn/tangent_lin.py:4-29)."""

    in_channels: int
    out_channels: int

    @lnn.compact
    def __call__(self, x):
        w_re = self.param("Re", xavier_uniform(), (self.out_channels, self.in_channels))
        # Imaginary part initialised an order of magnitude smaller
        # (tangent_lin.py:25).
        w_im = self.param(
            "Im", xavier_uniform(gain=0.1), (self.out_channels, self.in_channels)
        )
        return tangent_ops.tangent_lin(x, w_re, w_im)


class TangentNonLin(lnn.Module):
    """modReLU on the radial component (reference nn/tangent_nonlin.py:8-35).

    param_width: store a wider bias than the applied channel count.  The
    reference's ECHOBlock sizes the bias by the block's ``in_channels`` but
    applies it to the ``n_des``-channel conv output (echo_block.py:57,93);
    torch's ``bias[0, nzInd[:, 1]]`` indexing then reads only the first
    ``n_des`` entries.  Keeping the full-width parameter makes reference
    state_dicts port 1:1 at configs with n_des != in_channels.
    """

    in_channels: int
    param_width: Optional[int] = None

    @lnn.compact
    def __call__(self, x):
        width = self.param_width or self.in_channels
        if width < self.in_channels:
            raise ValueError(
                f"param_width {width} < applied channels {self.in_channels}")
        bias = self.param("bias", lnn.initializers.zeros, (width,))
        return co.modrelu(x, bias[: self.in_channels])


class TangentPerceptron(lnn.Module):
    """TangentLin + modReLU (reference nn/tangent_perceptron.py:7-23)."""

    in_channels: int
    out_channels: int

    @lnn.compact
    def __call__(self, x):
        x = TangentLin(self.in_channels, self.out_channels, name="lin")(x)
        return TangentNonLin(self.out_channels, name="nonlin")(x)


class LiftBlock(lnn.Module):
    """TransField + modReLU (reference nn/lift_block.py:6-55)."""

    in_channels: int
    out_channels: int
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, table: EdgeTable, lift_cols: Tuple[int, int],
                 comp=None):
        x = TransField(
            self.in_channels, self.out_channels, self.n_rings, self.ftype,
            self.d_chunk, axis_name=self.axis_name, name="field",
        )(x, table, lift_cols, comp)
        return TangentNonLin(self.out_channels, name="nonlin")(x)


class FCResNetBlock(lnn.Module):
    """Two field convolutions + residual (reference nn/fc_resnet_block.py:7-88)."""

    in_channels: int
    out_channels: int
    band_limit: int = 1
    n_rings: int = 6
    ftype: int = 1
    frontload: bool = False
    d_chunk: int = 128
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, table: EdgeTable, banded=None):
        iC1, oC2 = self.in_channels, self.out_channels
        if self.frontload:
            oC1 = iC2 = self.in_channels
        else:
            oC1 = iC2 = self.out_channels
        kw = dict(
            band_limit=self.band_limit, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name,
        )
        h = FieldConv(iC1, oC1, name="conv1", **kw)(x, table, banded)
        h = TangentNonLin(oC1, name="nonlin1")(h)
        h = FieldConv(iC2, oC2, name="conv2", **kw)(h, table, banded)
        res = TangentLin(iC1, oC2, name="res")(x)
        return TangentNonLin(oC2, name="nonlin2")(res + h)


class ECHO(lnn.Module):
    """ECHO descriptor op (reference nn/echo.py:65-148); parameter-free.

    impl: "auto" routes to the gather-free banded path (ops/echo.py::
    echo_banded) when ``comp`` is given (the backward of the XLA path's
    x[src] gather is a scatter-add that dominates the op on TPU —
    docs/KERNEL_NOTES.md; the banded windowing has a slice-only transpose).
    "onehot"/"banded" force a path — the banded layout processes (2nh+1)×TB
    slots per target vs the CSR path's D, so it wins when C is small
    (correspondence yes, segmentation C=48 no; measured in KERNEL_NOTES.md).
    """

    channels: int
    n_bins: int = 2
    # single-pass over the slot axis by default: on TPU the one-hot splat's
    # contraction wants the full D=128 depth (3-10x faster than chunked;
    # chunk only when the (N, D, C, w) intermediates would not fit HBM)
    d_chunk: int = 128
    impl: str = "auto"
    panel_chunk: int = 8          # panels per scan step on the XLA panel path
    # panel-path implementation: "pallas" (in-VMEM channel-major kernel,
    # ops/pallas/echo_panel.py — ~6x the XLA path at 163k) or "xla"
    panel_impl: str = "pallas"
    axis_name: Optional[str] = None

    def __call__(self, x, table: EdgeTable, comp=None):
        from ..precomp.banded import CompactPanelTable, PanelTable

        if isinstance(comp, (PanelTable, CompactPanelTable)) \
                and self.axis_name is None:
            # 100k-capable panel-CSR path; the compact layout (gathered
            # source columns, ~3x less dead-slot work at 163k) only exists
            # for the Pallas kernel
            if self.panel_impl == "pallas" \
                    or isinstance(comp, CompactPanelTable):
                from ..ops.pallas.echo_panel import echo_panel_pallas

                return echo_panel_pallas(x, comp, self.n_bins)
            return echo_ops.echo_panel(x, comp, self.n_bins,
                                       panel_chunk=self.panel_chunk)
        use_banded = (comp is not None) if self.impl == "auto" \
            else self.impl == "banded"
        if self.axis_name is not None:
            if comp is None:
                raise ValueError("graph-parallel ECHO requires a "
                                 "CompressedBandedTable")
            from ..precomp.banded import CompactShards, PanelShards

            if isinstance(comp, CompactShards):
                from ..parallel.panel_gp import echo_compact_gp

                return echo_compact_gp(x, comp, self.n_bins,
                                       self.axis_name)
            if isinstance(comp, PanelShards):
                from ..parallel.panel_gp import echo_panel_gp

                return echo_panel_gp(x, comp, self.n_bins, self.axis_name,
                                     panel_chunk=self.panel_chunk,
                                     impl=self.panel_impl)
            from ..parallel.halo import _exchange_halos

            halo = _exchange_halos(x, comp.nh * comp.tb, self.axis_name)
            return echo_ops.echo_banded(x, comp, self.n_bins, halo=halo)
        if use_banded and comp is not None:
            return echo_ops.echo_banded(x, comp, self.n_bins)
        # no block table available (e.g. net.init before batches exist, or
        # impl='panel'/'banded' on a plain-table call): the XLA gather path
        # is output-identical — ECHO is parameter-free, so init through it
        # builds the same params
        return echo_ops.echo(x, table, self.n_bins, d_chunk=self.d_chunk)


class Linear(lnn.Module):
    """Dense layer with torch.nn.Linear's default init (for head parity)."""

    in_features: int
    out_features: int

    @lnn.compact
    def __call__(self, x):
        w = self.param("weight", torch_linear_weight, (self.out_features, self.in_features))
        b = self.param("bias", torch_linear_bias(self.in_features), (self.out_features,))
        return x @ w.T + b


class ECHOBlock(lnn.Module):
    """FieldConv → modReLU → ECHO → MLP + residual (reference nn/echo_block.py:20-103)."""

    in_channels: int
    out_channels: int
    n_des: Optional[int] = None
    n_bins: int = 3
    band_limit: int = 1
    n_rings: int = 6
    ftype: int = 1
    d_chunk: int = 128
    echo_impl: str = "auto"
    echo_panel_chunk: int = 8
    echo_panel_impl: str = "pallas"
    axis_name: Optional[str] = None

    @lnn.compact
    def __call__(self, x, table: EdgeTable, banded=None, comp=None):
        n_des = self.in_channels if self.n_des is None else self.n_des
        h = FieldConv(
            self.in_channels, n_des, self.band_limit, self.n_rings, self.ftype,
            self.d_chunk, axis_name=self.axis_name, name="conv",
        )(x, table, banded)
        # The reference constructs TangentNonLin(in_channels) but applies it
        # to the n_des-channel conv output (echo_block.py:57,93) — only the
        # first n_des bias entries are ever read.  param_width keeps the
        # full-width parameter so reference weights port (e.g. the
        # correspondence config: in=16, n_des=12).
        h = TangentNonLin(n_des, param_width=self.in_channels,
                          name="nonlin")(h)
        h = ECHO(n_des, self.n_bins, d_chunk=self.d_chunk,
                 impl=self.echo_impl, panel_chunk=self.echo_panel_chunk,
                 panel_impl=self.echo_panel_impl,
                 axis_name=self.axis_name, name="echo")(h, table, comp)
        h = h.reshape(h.shape[0], -1)
        mid = n_des * echo_ops.hist_dim(self.n_bins)
        h = lnn.relu(Linear(mid, 128, name="lin1")(h))
        h = lnn.relu(Linear(128, 64, name="lin2")(h))
        h = Linear(64, self.out_channels, name="lin3")(h)
        res = Linear(self.in_channels, self.out_channels, name="res")(co.soft_abs(x))
        return h + res
