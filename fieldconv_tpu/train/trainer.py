"""Jitted training steps over batched mesh artifacts.

The reference trains with DataLoader(batch_size=1) + optional gradient
accumulation (classification.ipynb cell 11).  Here meshes sharing a compile
bucket are stacked into a MeshBatch and the model is vmapped over the batch
axis — data parallelism falls out by sharding that axis over the device mesh
(see fieldconv_tpu/parallel).  Augmentation (random ±45° rotations + scale
of positions only — the stencils are rotation invariant, SURVEY.md §3.2)
runs on device inside the step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..nn import losses
from ..precomp.banded import (
    R_SENTINEL,
    BandedTable,
    CompressedBandedTable,
    build_banded_table,
    build_compressed_banded,
    build_panel_table,
)
from ..precomp.edge_table import EdgeTable
from .config import ExperimentConfig


@dataclasses.dataclass
class MeshBatch:
    """A stack of same-bucket mesh artifacts.

    pos: (B, N, 3) float32 — sampled vertex positions (zero at padded rows)
    table: EdgeTable whose data fields carry a leading batch axis
    labels: (B,) int32 for mesh-level tasks or (B, N) int32 (-1 = padding)
    banded: optional batched BandedTable for the Pallas conv path
    panel: optional LIST of per-mesh compressed PanelTables (panel counts
      differ per mesh, so they stack as a pytree list; batched_apply
      unrolls the batch instead of vmapping — the panel layout's regime is
      100k-vertex meshes at batch 1)
    """

    pos: jnp.ndarray
    table: EdgeTable
    labels: jnp.ndarray
    banded: Optional[BandedTable] = None
    comp: Optional[CompressedBandedTable] = None
    panel: Optional[list] = None
    # pure-panel batches: optional per-mesh CompactPanelTables for ECHO +
    # lift (the >=20k-vertex optimum, docs/KERNEL_NOTES.md r4) while the
    # convs keep the block PanelTables in `panel`
    compact: Optional[list] = None


jax.tree_util.register_dataclass(
    MeshBatch,
    data_fields=["pos", "table", "labels", "banded", "comp", "panel",
                 "compact"],
    meta_fields=[],
)


def stack_batch(items, banded_tb: Optional[int] = None,
                echo_banded: bool = False,
                panel_tb: Optional[int] = None,
                echo_panel: bool = False,
                echo_compact: bool = False,
                conv_compact: bool = False) -> MeshBatch:
    """Stack (pos, table, label) triples sharing bucket shapes.

    banded_tb: when set, also build + stack BandedTables (Pallas conv path)
    with that target-block size.
    echo_banded: when set (requires banded_tb), also build the compressed
    banded tables that drive the gather-free ECHO path
    (ops/echo.py::echo_banded) and the gather-free lift
    (ops/trans_field.py::trans_field_banded_contrib).
    panel_tb: when set, build per-mesh compressed PanelTables instead —
    the 100k-capable layout routing EVERY op through the panel paths
    (mutually exclusive with banded_tb; vertex order should be block-local,
    data.base.process_mesh(order='kd')).
    echo_panel: MIXED mode (requires banded_tb): banded tables for the
    convs plus per-mesh PanelTables routing ECHO and the lift through the
    panel kernels — the measured-optimal ECHO at BOTH production shape
    classes (corr 17.8 ms vs banded 32.0; seg 46.0 vs onehot 57.3;
    docs/KERNEL_NOTES.md r4).
    """
    poss, tables, labels = zip(*items)
    if panel_tb is not None:
        if banded_tb is not None:
            raise ValueError("pass banded_tb or panel_tb, not both")
        return _stack_batch_panel(poss, tables, labels, panel_tb,
                                  echo_compact=echo_compact,
                                  conv_compact=conv_compact)
    if conv_compact:
        raise ValueError("conv_compact is a pure-panel-layout option "
                         "(pass panel_tb)")
    t0 = tables[0]
    stacked = EdgeTable(
        src=jnp.stack([t.src for t in tables]),
        mask=jnp.stack([t.mask for t in tables]),
        rsten=jnp.stack([t.rsten for t in tables]),
        fwxp=jnp.stack([t.fwxp for t in tables]),
        ln=jnp.stack([t.ln for t in tables]),
        wxp=jnp.stack([t.wxp for t in tables]),
        vmask=jnp.stack([t.vmask for t in tables]),
        n_valid=t0.n_valid,
        band_limit=t0.band_limit,
        n_rings=t0.n_rings,
    )
    banded = None
    if banded_tb is not None:
        bs = [build_banded_table(t, tb=banded_tb) for t in tables]
        nh = max(b.nh for b in bs)
        bs = [_pad_banded(b, nh) for b in bs]
        banded = BandedTable(
            sten_band=jnp.stack([b.sten_band for b in bs]),
            tb=banded_tb, nh=nh, n_pad=bs[0].n_pad,
            band_limit=t0.band_limit, n_rings=t0.n_rings,
        )
    comp = None
    if echo_banded:
        if banded_tb is None:
            raise ValueError("echo_banded requires banded_tb")
        cs = [build_compressed_banded(t, tb=banded_tb) for t in tables]
        nh = max(c.nh for c in cs)
        cs = [_pad_comp(c, nh) for c in cs]
        comp = CompressedBandedTable(
            sten_band=jnp.stack([c.sten_band for c in cs]),
            tb=banded_tb, nh=nh, n_pad=cs[0].n_pad,
            band_limit=t0.band_limit, n_rings=t0.n_rings,
        )
    panels = None
    if echo_panel or echo_compact:
        if banded_tb is None:
            raise ValueError("echo_panel/echo_compact require banded_tb")
        if echo_banded or (echo_panel and echo_compact):
            raise ValueError("pass exactly one of echo_banded/echo_panel/"
                             "echo_compact")
        if echo_compact:
            from ..precomp.banded import build_compact_panel_table

            panels = [build_compact_panel_table(t, tb=banded_tb)
                      for t in tables]
        else:
            panels = [build_panel_table(t, tb=banded_tb, compressed=True)
                      for t in tables]
    return MeshBatch(
        pos=jnp.stack([jnp.asarray(p, jnp.float32) for p in poss]),
        table=stacked,
        labels=jnp.stack([jnp.asarray(l) for l in labels]),
        banded=banded,
        comp=comp,
        panel=panels,
    )


def _stack_batch_panel(poss, tables, labels, panel_tb: int,
                       echo_compact: bool = False,
                       conv_compact: bool = False) -> MeshBatch:
    """Panel-layout batch: stacked EdgeTable + a list of PanelTables;
    echo_compact additionally builds per-mesh CompactPanelTables so ECHO +
    lift run the compacted-column layout while the convs keep panels;
    conv_compact (requires echo_compact) routes the CONVS through the
    same CompactPanelTable too — ONE table serves every op (measured
    faster at 163k with 5.7x less stencil memory, docs/SCALE_100K.json),
    and the block-panel build is skipped entirely."""
    t0 = tables[0]
    stacked = EdgeTable(
        src=jnp.stack([t.src for t in tables]),
        mask=jnp.stack([t.mask for t in tables]),
        rsten=jnp.stack([t.rsten for t in tables]),
        fwxp=jnp.stack([t.fwxp for t in tables]),
        ln=jnp.stack([t.ln for t in tables]),
        wxp=jnp.stack([t.wxp for t in tables]),
        vmask=jnp.stack([t.vmask for t in tables]),
        n_valid=t0.n_valid,
        band_limit=t0.band_limit,
        n_rings=t0.n_rings,
    )
    if conv_compact and not echo_compact:
        raise ValueError("conv_compact requires echo_compact")
    compacts = None
    if echo_compact:
        from ..precomp.banded import build_compact_panel_table

        compacts = [build_compact_panel_table(t, tb=min(panel_tb, 32))
                    for t in tables]
    if conv_compact:
        panels = compacts       # the same objects: no duplicate arrays
    else:
        panels = [build_panel_table(t, tb=panel_tb, compressed=True)
                  for t in tables]
    return MeshBatch(
        pos=jnp.stack([jnp.asarray(p, jnp.float32) for p in poss]),
        table=stacked,
        labels=jnp.stack([jnp.asarray(l) for l in labels]),
        panel=panels,
        compact=compacts,
    )


def _pad_banded(b: BandedTable, nh: int) -> BandedTable:
    """Widen a banded table to a larger half-window (zero slots)."""
    if b.nh == nh:
        return b
    import numpy as _np

    grow = (nh - b.nh) * b.tb
    st = _np.asarray(b.sten_band)
    pad = [(0, 0)] * (st.ndim - 1) + [(grow, grow)]
    return BandedTable(
        sten_band=jnp.asarray(_np.pad(st, pad)),
        tb=b.tb, nh=nh, n_pad=b.n_pad,
        band_limit=b.band_limit, n_rings=b.n_rings,
    )


def _pad_comp(c: CompressedBandedTable, nh: int) -> CompressedBandedTable:
    """Widen a compressed banded table to a larger half-window.

    Padded slots get R_SENTINEL in the r plane (kills radial hats) and 0 in
    the phasor/wxp planes (kills votes)."""
    if c.nh == nh:
        return c
    import numpy as _np

    grow = (nh - c.nh) * c.tb
    st = _np.asarray(c.sten_band)
    pad = [(0, 0)] * (st.ndim - 1) + [(grow, grow)]
    out = _np.pad(st, pad)
    out[:, 0, :, :grow] = R_SENTINEL
    out[:, 0, :, -grow:] = R_SENTINEL
    return CompressedBandedTable(
        sten_band=jnp.asarray(out),
        tb=c.tb, nh=nh, n_pad=c.n_pad,
        band_limit=c.band_limit, n_rings=c.n_rings,
    )


def random_rotate_scale(key, pos, max_deg=45.0, scale_range=(0.85, 1.15)):
    """Per-mesh random rotation about all three axes + uniform scale
    (classification.ipynb cell 5's transform chain)."""
    B = pos.shape[0]
    kr, ks = jax.random.split(key)
    angles = jax.random.uniform(
        kr, (B, 3), minval=-max_deg, maxval=max_deg
    ) * (jnp.pi / 180.0)

    def rot_mats(a):
        cx, sx = jnp.cos(a[0]), jnp.sin(a[0])
        cy, sy = jnp.cos(a[1]), jnp.sin(a[1])
        cz, sz = jnp.cos(a[2]), jnp.sin(a[2])
        rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rz @ ry @ rx

    R = jax.vmap(rot_mats)(angles)                       # (B, 3, 3)
    out = jnp.einsum("bij,bnj->bni", R, pos)
    if scale_range is not None:
        s = jax.random.uniform(ks, (B, 1, 1), minval=scale_range[0],
                               maxval=scale_range[1])
        out = out * s
    return out


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(config: ExperimentConfig, steps_per_epoch: int = 1):
    if config.lr_decay_epoch is not None:
        sched = optax.piecewise_constant_schedule(
            config.lr,
            {config.lr_decay_epoch * steps_per_epoch: config.lr_decayed / config.lr},
        )
    else:
        sched = config.lr
    opt = optax.adam(sched)
    if config.batch_step > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=config.batch_step)
    return opt


def batched_apply(net, params, batch: MeshBatch, rngs=None, **kw):
    """vmap the model over the mesh batch axis (params broadcast).

    Panel-carrying batches unroll the batch instead (per-mesh panel
    counts differ, and the scalar-prefetch panel kernel is not vmapped).
    Pure-panel batches (stack_batch(panel_tb=...)) route EVERY op through
    panels; MIXED batches (banded_tb + echo_panel) keep the banded conv
    kernel and route ECHO + lift through the panel kernels."""
    if batch.panel is not None:
        outs = []
        for i, pn in enumerate(batch.panel):
            ti = jax.tree.map(lambda x: x[i], batch.table)
            if batch.banded is not None:
                bi = jax.tree.map(lambda x: x[i], batch.banded)
            else:
                bi = pn
            cp = batch.compact[i] if batch.compact is not None else pn
            outs.append(net.apply(params, batch.pos[i], ti, bi, cp,
                                  rngs=rngs, **kw))
        return jnp.stack(outs)
    if batch.comp is not None:
        def one_c(pos, table, banded, comp):
            return net.apply(params, pos, table, banded, comp,
                             rngs=rngs, **kw)

        return jax.vmap(one_c)(batch.pos, batch.table, batch.banded,
                               batch.comp)
    if batch.banded is not None:
        def one_b(pos, table, banded):
            return net.apply(params, pos, table, banded, rngs=rngs, **kw)

        return jax.vmap(one_b)(batch.pos, batch.table, batch.banded)

    def one(pos, table):
        return net.apply(params, pos, table, rngs=rngs, **kw)

    return jax.vmap(one)(batch.pos, batch.table)


def make_loss_fn(net, config: ExperimentConfig, n_classes: int):
    task = config.task

    def loss_fn(params, key, batch: MeshBatch):
        pos = random_rotate_scale(
            key, batch.pos, config.random_rotate_deg,
            config.random_scale,
        )
        aug = MeshBatch(pos=pos, table=batch.table, labels=batch.labels,
                        banded=batch.banded, comp=batch.comp,
                        panel=batch.panel, compact=batch.compact)
        if task == "classification":
            logits = batched_apply(net, params, aug)[:, 0, :]   # (B, C)
            return losses.cross_entropy(logits, batch.labels)
        elif task == "segmentation":
            logits = batched_apply(net, params, aug)            # (B, N, C)
            return losses.label_smoothing_loss(
                logits.reshape(-1, n_classes), batch.labels.reshape(-1),
                n_classes, smoothing=config.smoothing,
            )
        elif task == "correspondence":
            kd, _ = jax.random.split(key)
            logits = batched_apply(
                net, params, aug, deterministic=False, rngs={"dropout": kd}
            )
            return losses.cross_entropy(
                logits.reshape(-1, n_classes), batch.labels.reshape(-1)
            )
        raise ValueError(f"no generic loss for task {task}")

    return loss_fn


def _guarded_update(state: TrainState, loss, grads, opt):
    """Apply the optimizer update, keeping the previous params/opt state when
    the loss is non-finite.  The guard is device-side (SURVEY.md §5.3) so the
    training loop never reads the loss back synchronously on the hot path."""
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ok = jnp.isfinite(loss)
    params = jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), params, state.params)
    opt_state = jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), opt_state, state.opt_state)
    return TrainState(params, opt_state, state.step + 1)


def make_train_step(net, config: ExperimentConfig, n_classes: int, opt):
    loss_fn = make_loss_fn(net, config, n_classes)

    @jax.jit
    def train_step(state: TrainState, key, batch: MeshBatch):
        l, grads = jax.value_and_grad(loss_fn)(state.params, key, batch)
        return _guarded_update(state, l, grads, opt), {"loss": l}

    return train_step


def make_twin_train_step(net, config: ExperimentConfig, opt):
    """Siamese step (feature_matching.ipynb cell 13): one network, two
    meshes, twin loss over sampled positive/null pairs."""

    @jax.jit
    def train_step(state: TrainState, key, batch_s: MeshBatch, batch_t: MeshBatch,
                   pos_pairs, null_pairs):
        ka, kb, kl = jax.random.split(key, 3)

        def loss_fn(params):
            ps = random_rotate_scale(ka, batch_s.pos, config.random_rotate_deg,
                                     config.random_scale)
            pt = random_rotate_scale(kb, batch_t.pos, config.random_rotate_deg,
                                     config.random_scale)
            fs = batched_apply(net, params,
                               MeshBatch(ps, batch_s.table, batch_s.labels,
                                         batch_s.banded, batch_s.comp,
                                         batch_s.panel))
            ft = batched_apply(net, params,
                               MeshBatch(pt, batch_t.table, batch_t.labels,
                                         batch_t.banded, batch_t.comp,
                                         batch_t.panel))
            keys = jax.random.split(kl, fs.shape[0])
            per_mesh = jax.vmap(
                lambda k, s, t, pp, np_: losses.twin_loss(
                    k, s, t, pp, np_, mu=config.twin_mu)
            )(keys, fs, ft, pos_pairs, null_pairs)
            return jnp.mean(per_mesh)

        l, grads = jax.value_and_grad(loss_fn)(state.params)
        return _guarded_update(state, l, grads, opt), {"loss": l}

    return train_step
