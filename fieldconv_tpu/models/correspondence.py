"""FAUST dense-correspondence network (reference correspondence.ipynb cell 8)."""

from __future__ import annotations

from typing import Optional

import flax.linen as lnn

from ..nn.modules import ECHOBlock, FCResNetBlock, LiftBlock, Linear, TangentPerceptron
from ..precomp.edge_table import EdgeTable


class CorrespondenceNet(lnn.Module):
    """Lift(3→16) + 8×FCResNet with 4 meta-residuals + ECHOBlock + MLP head.

    lift_impl / echo_impl: see models/classification.py and nn.modules.ECHO;
    axis_name runs the whole net graph-parallel under shard_map.
    """

    n_classes: int = 4999
    nf: int = 32
    n_des: int = 12
    n_bins: int = 2
    band_limit: int = 1
    n_rings: int = 3
    ftype: int = 1
    dropout: float = 0.5
    d_chunk: int = 128
    lift_impl: str = "auto"
    echo_impl: str = "auto"
    echo_panel_chunk: int = 8     # panels per scan step (XLA panel path)
    echo_panel_impl: str = "pallas"   # panel-path ECHO kernel (or "xla")
    # rematerialise each FCResNet block in the backward: at 100k+ vertices
    # the per-conv activation temps ((N, 32, 2) tensors, 4x tile-padded on
    # TPU) otherwise dominate HBM (scripts/scale_100k.py)
    remat_blocks: bool = False
    axis_name: Optional[str] = None
    # return the 256-dim pre-head features instead of applying lin2: the
    # big-vocab pattern for the 100k config, where (N, 4999) logits are
    # 3.3 GB — the caller applies lin2 row-chunked with rematerialisation
    # (scripts/scale_100k.py).  Init with return_features=False so lin2's
    # params exist, then apply through a clone(return_features=True).
    return_features: bool = False

    @lnn.compact
    def __call__(self, pos, table: EdgeTable, banded=None, comp=None, *,
                 deterministic: bool = True, dropout_mask=None):
        B, nf = self.band_limit, self.nf
        kw = dict(
            band_limit=B, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name,
        )
        lift_comp = None if self.lift_impl == "gather" else comp
        x1 = LiftBlock(
            3, 16, n_rings=self.n_rings, ftype=self.ftype,
            d_chunk=self.d_chunk, axis_name=self.axis_name, name="lift",
        )(pos, table, (B, B + 1), lift_comp)

        Block = lnn.remat(FCResNetBlock) if self.remat_blocks \
            else FCResNetBlock
        x = Block(16, nf, name="resnet1", **kw)(x1, table, banded)
        x2 = Block(nf, nf, name="resnet2", **kw)(x, table, banded) + \
            TangentPerceptron(16, nf, name="res1")(x1)
        x = Block(nf, nf, name="resnet3", **kw)(x2, table, banded)
        x3 = Block(nf, nf, name="resnet4", **kw)(x, table, banded) + \
            TangentPerceptron(nf, nf, name="res2")(x2)
        x = Block(nf, nf, name="resnet5", **kw)(x3, table, banded)
        x4 = Block(nf, nf, name="resnet6", **kw)(x, table, banded) + \
            TangentPerceptron(nf, nf, name="res3")(x3)
        x = Block(nf, nf, name="resnet7", **kw)(x4, table, banded)
        x = Block(nf, 16, frontload=True, name="resnet8", **kw)(x, table, banded) + \
            TangentPerceptron(nf, 16, name="res4")(x4)

        x = ECHOBlock(
            16, nf, n_des=self.n_des, n_bins=self.n_bins,
            echo_impl=self.echo_impl,
            echo_panel_chunk=self.echo_panel_chunk,
            echo_panel_impl=self.echo_panel_impl, name="echo", **kw
        )(x, table, banded, comp)
        x = lnn.relu(Linear(nf, 256, name="lin1")(x))
        if dropout_mask is not None:
            # explicit-mask hook: training-dynamics parity tests inject the
            # SAME Bernoulli realisation into this net and the torch
            # reference (framework rngs are not comparable bit-for-bit)
            x = x * dropout_mask / (1.0 - self.dropout)
        else:
            x = lnn.Dropout(self.dropout, deterministic=deterministic)(x)
        if self.return_features:
            return x
        return Linear(256, self.n_classes, name="lin2")(x)
