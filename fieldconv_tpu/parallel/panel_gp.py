"""Graph-parallel field convolution over panel-CSR tables.

The multi-chip path for 100k+-vertex meshes (BASELINE's north-star
config): the PANEL STENCIL — the dominant memory, 3-5.5GB at 163k
vertices (docs/SCALE_100K.json) — shards by contiguous target-block
ranges over the 'graph' mesh axis (precomp/banded.py::shard_panel_table),
while the small rotated-source tensor g (N x K·2C, ~60MB at 163k/C=16)
is all_gather'ed over ICI each layer.  The gather's transpose is a
psum_scatter, so each shard's masked dG contribution (by-source backward
grid + coverage zeroing, ops/pallas/band_conv.py::_band_panel) sums
exactly onto the owner rows — N-shard values and grads match 1-device
bitwise-modulo-f32 (tests/test_panel_gp.py).

This complements parallel/halo.py (ring-halo exchange for the dense
banded layout): halo riding ppermutes is the low-latency choice when the
support fits a +-nh block window; panel sharding is the scalable choice
when it does not.  The reference has no distributed code at all
(SURVEY.md §2.14b).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..precomp.banded import (CompactHaloShards, CompactPanelTable,
                              CompactShards, PanelShards)


def halo_exchange(x, send_idx, axis_name: str):
    """Boundary-compressed row exchange: one all_to_all of (S, H)
    row-buffers instead of an all_gather of all N rows.

    x: (n_local, ...) this shard's rows; send_idx: (S, H) LOCAL rows to
    send to each peer (the local row of a CompactHaloShards.send_idx —
    pad slots repeat row 0, the receiver never references them; the
    self slot (s, s) rides the local copy, not the wire).  Returns the
    extended-domain rows [local ++ halo] of shape (n_local + S·H, ...)
    that the remapped ``src_idx`` indexes.  The AD transpose is the
    reversed all_to_all plus a halo-sized scatter-add onto the owner
    rows — the same compressed volume back.
    """
    S, H = send_idx.shape
    send = jnp.take(x, send_idx.reshape(-1), axis=0)
    send = send.reshape((S, H) + x.shape[1:])
    recv = jax.lax.all_to_all(send, axis_name, 0, 0)
    return jnp.concatenate([x, recv.reshape((S * H,) + x.shape[1:])], axis=0)


def _gather_rows(x, shard, axis_name: str):
    """Route a compact-gp op's source rows: boundary-compressed exchange
    when the shard carries halo tables, full all_gather otherwise."""
    if isinstance(shard, CompactHaloShards):
        return halo_exchange(x, shard.send_idx[0], axis_name)
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def field_conv_panel_gp(x, shard: PanelShards, zonal, spherical, phase,
                        ftype, axis_name: str, precision: str = "f32"):
    """Shard-local field convolution: (N_local, C, 2) -> (N_local, O, 2).

    Call inside shard_map over `axis_name`; `shard` must be the LOCAL
    row of a PanelShards (leading shard axis already consumed by the
    shard_map in_spec, i.e. arrays carry shapes (P, ...), (4, P), ...).
    """
    from ..ops.field_conv import filter_coefficients
    from ..ops.pallas.band_conv import (_band_panel, filters_to_wmat,
                                        rotated_source_tensor_kmajor)

    g = rotated_source_tensor_kmajor(x, shard.band_limit)
    g_full = jax.lax.all_gather(g, axis_name, axis=0, tiled=True)
    coeff = filter_coefficients(zonal, spherical, phase, ftype,
                                shard.band_limit)
    wmat = filters_to_wmat(coeff)
    y2 = _band_panel(g_full, wmat, shard.sten, shard.meta, shard.meta_s,
                     shard.coverage, shard.tb, shard.n_rings,
                     shard.band_limit, shard.compressed, precision,
                     x.shape[0])
    O = wmat.shape[-1] // 2
    return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)


def local_shard(shards: PanelShards) -> PanelShards:
    """View the shard_map-local row of a stacked PanelShards: squeeze the
    leading shard axis (shard_map in_specs P(axis) deliver shape (1, ...))."""
    return PanelShards(
        sten=shards.sten[0], meta=shards.meta[0], meta_s=shards.meta_s[0],
        coverage=shards.coverage[0],
        tb=shards.tb, n_pad=shards.n_pad, n_local=shards.n_local,
        band_limit=shards.band_limit, n_rings=shards.n_rings,
        compressed=shards.compressed,
    )


def trans_field_panel_gp(x, shard: PanelShards, lift_cols, axis_name: str,
                         panel_chunk: int = 256):
    """Shard-local TransField aggregation over panel shards: all_gather the
    (small) scalar features over the graph axis, aggregate the shard's
    panels with GLOBAL source blocks and LOCAL target blocks.  The gather's
    AD transpose psum_scatters each shard's dX onto the owner rows.

    x: (N_local, C).  Returns (contribAng, contribMag) over local rows.
    """
    from ..ops.trans_field import trans_field_panel_contrib

    x_full = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    return trans_field_panel_contrib(
        x, (shard.sten, shard.meta, shard.tb, shard.n_rings,
            shard.band_limit, shard.compressed),
        lift_cols=lift_cols, panel_chunk=panel_chunk, x_src=x_full)


def echo_panel_gp(x, shard: PanelShards, n_bins: int, axis_name: str,
                  panel_chunk: int = 8, impl: str = "pallas"):
    """Shard-local ECHO over panel shards: all_gather the tangent features
    (N × C × 2 — small next to the panel stencil) over the graph axis and
    splat the shard's panels into local target-block histograms.  The
    backward emits coverage-masked dX over global rows; the gather's AD
    transpose psum_scatters it onto the owners.

    x: (N_local, C, 2).  Returns (N_local, C, dS).
    """
    from ..ops.echo import echo_panel

    x_full = jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    if impl == "pallas":
        from ..ops.pallas.echo_panel import echo_panel_pallas

        return echo_panel_pallas(
            x, (shard.sten, shard.meta, shard.meta_s, shard.coverage,
                shard.tb), n_bins, x_src=x_full, n_out=x.shape[0])
    return echo_panel(x, (shard.sten, shard.meta, shard.tb), n_bins,
                      panel_chunk=panel_chunk, x_src=x_full,
                      n_out=x.shape[0])


def local_compact_shard(shards: CompactShards) -> CompactPanelTable:
    """View the shard_map-local row of a stacked CompactShards as a
    CompactPanelTable over LOCAL target blocks + GLOBAL source indices."""
    return CompactPanelTable(
        sten=shards.sten[0], meta=shards.meta[0],
        src_idx=shards.src_idx[0],
        tb=shards.tb, n_pad=shards.n_local,
        band_limit=shards.band_limit, n_rings=shards.n_rings,
        compressed=shards.compressed, ts=shards.ts,
    )


def trans_field_compact_gp(x, shard: CompactShards, lift_cols,
                           axis_name: str, panel_chunk: int = 256):
    """Shard-local compact-layout TransField: all_gather the scalar rows,
    aggregate the shard's compact panels (LOCAL targets, GLOBAL gathered
    columns).  The shard's segment_sum emits a full-length dX with exact
    zeros at unreferenced rows; the gather's AD transpose psum_scatters
    it onto the owners — no coverage mask needed."""
    from ..ops.trans_field import trans_field_compact_contrib

    x_full = _gather_rows(x, shard, axis_name)
    return trans_field_compact_contrib(
        x, local_compact_shard(shard), lift_cols=lift_cols,
        panel_chunk=panel_chunk, x_src=x_full)


def field_conv_compact_gp(x, shard: CompactShards, zonal, spherical, phase,
                          ftype, axis_name: str, precision: str = "f32"):
    """Shard-local compact-layout field convolution:
    (N_local, C, 2) -> (N_local, O, 2).

    all_gathers the rotated-source tensor and contracts the shard's
    compact panels (LOCAL target blocks, GLOBAL gathered source columns).
    The kernel's backward folds the per-panel disjoint dG blocks with a
    segment_sum over GLOBAL indices into a full-length dG with exact
    zeros at unreferenced rows; the all_gather's AD transpose
    psum_scatters it onto the owners — same structure as
    :func:`trans_field_compact_gp`, no coverage mask needed."""
    from ..ops.field_conv import filter_coefficients
    from ..ops.pallas.band_conv import (_band_compact, filters_to_wmat,
                                        rotated_source_tensor_kmajor)

    local = local_compact_shard(shard)
    if isinstance(shard, CompactHaloShards):
        # exchange the RAW feature rows (2C wide) and rotate the received
        # boundary rows locally — K× fewer wire bytes than exchanging g
        x_ext = halo_exchange(x, shard.send_idx[0], axis_name)
        g_full = rotated_source_tensor_kmajor(x_ext, shard.band_limit)
    else:
        g = rotated_source_tensor_kmajor(x, shard.band_limit)
        g_full = jax.lax.all_gather(g, axis_name, axis=0, tiled=True)
    coeff = filter_coefficients(zonal, spherical, phase, ftype,
                                shard.band_limit)
    wmat = filters_to_wmat(coeff)
    y2 = _band_compact(
        g_full, wmat, local.sten, local.meta, local.src_idx.reshape(-1),
        local.tb, local.ts, local.n_rings, local.band_limit,
        local.compressed, precision, x.shape[0])
    O = wmat.shape[-1] // 2
    return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)


def echo_compact_gp(x, shard: CompactShards, n_bins: int, axis_name: str,
                    cc: int = 8):
    """Shard-local compact-layout ECHO: all_gather the tangent features,
    splat the shard's compact panels into local target histograms.  Same
    transpose structure as :func:`trans_field_compact_gp`."""
    from ..ops.pallas.echo_panel import echo_panel_pallas

    x_full = _gather_rows(x, shard, axis_name)
    return echo_panel_pallas(x, local_compact_shard(shard), n_bins, cc=cc,
                             x_src=x_full, n_out=x.shape[0])


# --- full-model panel-gp trainer -------------------------------------------
#
# The multi-chip trainer for the 100k config: ONE mesh, its multi-GB panel
# stencil sharded by target-block ranges over a ('graph',) device mesh.
# Models are built with axis_name='graph'; every op routes to the panel-gp
# paths above via the PanelShards dispatch in nn/modules.py.  (Compose an
# outer data axis by running independent processes or vmapping batches of
# meshes — at 100k+ vertices one mesh per step is the realistic regime,
# DataLoader(batch_size=1) in the reference.)


@dataclasses.dataclass
class PanelGPBatch:
    """One mesh flattened for shard_map: arrays + static meta.

    pos (N, 3) / vmask (N,) / labels () or (N,) shard their vertex axis
    over 'graph'; the stacked PanelShards arrays shard their leading shard
    axis.  n_valid is the GLOBAL valid-vertex count.

    Optional MIXED mode (the single-chip optimum, multi-chip): csten /
    cmeta / csrc_idx carry stacked CompactShards arrays — the convs stay
    on the block panels while ECHO + lift run the compacted-column
    layout (c_tb/c_ts static sides).
    """

    pos: jnp.ndarray
    vmask: jnp.ndarray
    labels: jnp.ndarray
    sten: jnp.ndarray
    meta: jnp.ndarray
    meta_s: jnp.ndarray
    coverage: jnp.ndarray
    tb: int
    n_pad: int
    n_local: int
    band_limit: int
    n_rings: int
    compressed: bool
    n_valid: int
    csten: jnp.ndarray = None
    cmeta: jnp.ndarray = None
    csrc_idx: jnp.ndarray = None
    c_tb: int = 0
    c_ts: int = 0
    c_compressed: bool = True
    # boundary-compressed exchange (CompactHaloShards): when set, csrc_idx
    # is ext-domain and every compact-gp collective is the halo all_to_all
    csend_idx: jnp.ndarray = None


jax.tree_util.register_dataclass(
    PanelGPBatch,
    data_fields=["pos", "vmask", "labels", "sten", "meta", "meta_s",
                 "coverage", "csten", "cmeta", "csrc_idx", "csend_idx"],
    meta_fields=["tb", "n_pad", "n_local", "band_limit", "n_rings",
                 "compressed", "n_valid", "c_tb", "c_ts", "c_compressed"],
)


def panel_gp_batch(pos, table, labels, shards: Optional[PanelShards],
                   compact_shards: CompactShards = None) -> PanelGPBatch:
    """Assemble a PanelGPBatch from one mesh's (pos, EdgeTable, labels) and
    its shard_panel_table output; pass shard_compact_table's output as
    ``compact_shards`` for the mixed conv-panel + compact-ECHO/lift mode.
    ``shards=None`` (requires compact_shards) is the ALL-COMPACT mode: one
    sharded CompactPanelTable serves every op — the conv routes through
    field_conv_compact_gp and the block-panel shards are never built."""
    kw = {}
    if compact_shards is not None:
        kw = dict(csten=compact_shards.sten, cmeta=compact_shards.meta,
                  csrc_idx=compact_shards.src_idx,
                  c_tb=compact_shards.tb, c_ts=compact_shards.ts,
                  c_compressed=compact_shards.compressed)
        if isinstance(compact_shards, CompactHaloShards):
            kw["csend_idx"] = compact_shards.send_idx
    if shards is None:
        if compact_shards is None:
            raise ValueError("pass shards and/or compact_shards")
        return PanelGPBatch(
            pos=jnp.asarray(pos, jnp.float32),
            vmask=jnp.asarray(table.vmask), labels=jnp.asarray(labels),
            sten=None, meta=None, meta_s=None, coverage=None,
            tb=compact_shards.tb, n_pad=compact_shards.n_pad,
            n_local=compact_shards.n_local,
            band_limit=compact_shards.band_limit,
            n_rings=compact_shards.n_rings,
            compressed=compact_shards.compressed,
            n_valid=table.n_valid, **kw,
        )
    return PanelGPBatch(
        pos=jnp.asarray(pos, jnp.float32), vmask=jnp.asarray(table.vmask),
        labels=jnp.asarray(labels),
        sten=shards.sten, meta=shards.meta, meta_s=shards.meta_s,
        coverage=shards.coverage,
        tb=shards.tb, n_pad=shards.n_pad, n_local=shards.n_local,
        band_limit=shards.band_limit, n_rings=shards.n_rings,
        compressed=shards.compressed, n_valid=table.n_valid, **kw,
    )


def place_panel_gp_batch(b: PanelGPBatch, mesh: Mesh) -> PanelGPBatch:
    """Device-place: vertex rows and panel shards over the 'graph' axis."""
    g = P("graph")
    put = jax.device_put
    ns = lambda spec: jax.sharding.NamedSharding(mesh, spec)
    kw = {}
    if b.csten is not None:
        kw = dict(csten=put(b.csten, ns(g)), cmeta=put(b.cmeta, ns(g)),
                  csrc_idx=put(b.csrc_idx, ns(g)),
                  c_tb=b.c_tb, c_ts=b.c_ts, c_compressed=b.c_compressed)
        if b.csend_idx is not None:
            kw["csend_idx"] = put(b.csend_idx, ns(g))
    pkw = dict(sten=None, meta=None, meta_s=None, coverage=None)
    if b.sten is not None:
        pkw = dict(sten=put(b.sten, ns(g)), meta=put(b.meta, ns(g)),
                   meta_s=put(b.meta_s, ns(g)),
                   coverage=put(b.coverage, ns(g)))
    return PanelGPBatch(
        pos=put(b.pos, ns(g)), vmask=put(b.vmask, ns(g)),
        labels=put(b.labels, ns(g if b.labels.ndim else P())),
        **pkw,
        tb=b.tb, n_pad=b.n_pad, n_local=b.n_local,
        band_limit=b.band_limit, n_rings=b.n_rings,
        compressed=b.compressed, n_valid=b.n_valid, **kw,
    )


def _unpack_shards(meta: PanelGPBatch, targs):
    """Rebuild each shard's local table views from the flat shard_map
    args (the inverse of _table_args) — shared by the training and
    inference shard_map bodies so the positional wire format has exactly
    one reader.  Returns (conv table `sh`, ECHO/lift table `comp_sh`)."""
    all_compact = meta.sten is None
    halo = meta.csend_idx is not None
    i = 0
    sh = None
    if not all_compact:
        sten, m, m_s, cov = targs[:4]
        i = 4
        sh = local_shard(PanelShards(
            sten=sten, meta=m, meta_s=m_s, coverage=cov,
            tb=meta.tb, n_pad=meta.n_pad, n_local=meta.n_local,
            band_limit=meta.band_limit, n_rings=meta.n_rings,
            compressed=meta.compressed))
    if meta.csten is not None:
        csten, cmeta, csrc = targs[i:i + 3]
        ckw = dict(
            sten=csten, meta=cmeta, src_idx=csrc,
            tb=meta.c_tb, n_pad=meta.n_pad, n_local=meta.n_local,
            band_limit=meta.band_limit, n_rings=meta.n_rings,
            compressed=meta.c_compressed, ts=meta.c_ts)
        if halo:
            comp_sh = CompactHaloShards(send_idx=targs[i + 3], **ckw)
        else:
            comp_sh = CompactShards(**ckw)
    else:
        comp_sh = sh
    if all_compact:
        sh = comp_sh
    return sh, comp_sh


def _n_table_args(meta: PanelGPBatch) -> int:
    """How many flat table args _table_args produces (for in_specs)."""
    n = 0 if meta.sten is None else 4
    if meta.csten is not None:
        n += 4 if meta.csend_idx is not None else 3
    return n


def _table_args(meta: PanelGPBatch, b: PanelGPBatch):
    """Flatten a batch's shard tables into the positional shard_map args
    consumed by _unpack_shards."""
    targs = () if meta.sten is None else (b.sten, b.meta, b.meta_s,
                                          b.coverage)
    if meta.csten is not None:
        targs += (b.csten, b.cmeta, b.csrc_idx)
        if meta.csend_idx is not None:
            targs += (b.csend_idx,)
    return targs


def make_panel_gp_value_and_grad(net, config, n_classes: int, mesh: Mesh,
                                 meta: PanelGPBatch):
    """(params, key, batch) -> (loss, grads) for the full model over panel
    shards.  ``net`` must be built with axis_name='graph'.  Supports the
    classification / segmentation / correspondence losses (the twin path
    composes the same way via two forwards)."""
    from ..train.trainer import random_rotate_scale
    from .gp import VertexMeta, _mask_to_shard0

    task = config.task

    def loss_fn(params, key, pos, vmask, labels, *targs):
        sh, comp_sh = _unpack_shards(meta, targs)
        vm = VertexMeta(vmask=vmask, n_valid=meta.n_valid,
                        band_limit=meta.band_limit, n_rings=meta.n_rings)
        ka, kdrop = jax.random.split(key)
        # identical key on every shard -> identical per-mesh rotation
        pos = random_rotate_scale(ka, pos[None], config.random_rotate_deg,
                                  config.random_scale)[0]
        if task == "correspondence":
            kdrop = jax.random.fold_in(kdrop, jax.lax.axis_index("graph"))
            out = net.apply(params, pos, vm, sh, comp_sh,
                            deterministic=False, rngs={"dropout": kdrop})
        else:
            out = net.apply(params, pos, vm, sh, comp_sh)

        if task == "classification":
            logp = jax.nn.log_softmax(out[0], axis=-1)
            ce = -logp[labels]                      # replicated on graph
            return _mask_to_shard0(ce, "graph")

        valid = labels >= 0
        labels_safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(out, axis=-1)
        if task == "segmentation" and config.smoothing > 0:
            confidence = 1.0 - config.smoothing
            off = config.smoothing / (n_classes - 1)
            onehot = jax.nn.one_hot(labels_safe, n_classes)
            true_dist = onehot * (confidence - off) + off
            per_row = jnp.sum(-true_dist * logp, axis=-1)
        else:
            per_row = -jnp.take_along_axis(
                logp, labels_safe[:, None], axis=-1)[:, 0]
        per_row = jnp.where(valid, per_row, 0.0)
        total = jax.lax.psum(jnp.sum(per_row), "graph")
        count = jax.lax.psum(jnp.sum(valid), "graph")
        return total / jnp.maximum(count, 1)

    g = P("graph")
    label_spec = g if meta.labels.ndim else P()
    smapped = jax.shard_map(
        loss_fn, mesh=mesh,
        in_specs=(P(), P(), g, g, label_spec) + (g,) * _n_table_args(meta),
        out_specs=P(),
        check_vma=False,
    )

    def value_and_grad(params, key, b: PanelGPBatch):
        targs = _table_args(meta, b)

        def wrapped(p):
            return smapped(p, key, b.pos, b.vmask, b.labels, *targs)

        return jax.value_and_grad(wrapped)(params)

    return value_and_grad


def make_panel_gp_forward(net, config, mesh: Mesh, meta: PanelGPBatch):
    """(params, batch) -> deterministic model output over panel shards —
    the graph-parallel INFERENCE path (serving the 100k+ regime; the
    training counterpart is make_panel_gp_value_and_grad above).

    No augmentation, no dropout, no loss: each shard computes its local
    rows; per-vertex outputs come back sharded on 'graph' (global (N_pad,
    ...) under the mesh), classification's pooled logits replicated."""
    from .gp import VertexMeta

    task = config.task

    def fwd(params, pos, vmask, *targs):
        sh, comp_sh = _unpack_shards(meta, targs)
        vm = VertexMeta(vmask=vmask, n_valid=meta.n_valid,
                        band_limit=meta.band_limit, n_rings=meta.n_rings)
        if task == "correspondence":
            return net.apply(params, pos, vm, sh, comp_sh,
                             deterministic=True)
        return net.apply(params, pos, vm, sh, comp_sh)

    g = P("graph")
    out_spec = P() if task == "classification" else g
    smapped = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), g, g) + (g,) * _n_table_args(meta),
        out_specs=out_spec,
        check_vma=False,
    )

    @jax.jit
    def forward(params, b: PanelGPBatch):
        return smapped(params, b.pos, b.vmask, *_table_args(meta, b))

    return forward


def make_panel_gp_train_step(net, config, n_classes: int, opt, mesh: Mesh,
                             meta: PanelGPBatch):
    """Jitted full-model train step over panel shards (the 100k-config
    multi-chip trainer)."""
    from ..train.trainer import TrainState, _guarded_update

    vag = make_panel_gp_value_and_grad(net, config, n_classes, mesh, meta)

    @jax.jit
    def train_step(state: TrainState, key, b: PanelGPBatch):
        l, grads = vag(state.params, key, b)
        return _guarded_update(state, l, grads, opt), {"loss": l}

    return train_step
