"""Graph-parallel training: the full model under shard_map with halo kernels.

This is the integration layer that makes multi-chip training actually run
the banded Pallas path (parallel/halo.py) for every FieldConv, the
gather-free windowed paths for the lift and ECHO, and psum-based pooling —
the mesh analog of context parallelism (SURVEY.md §5.7).  The reference has
no distributed code at all (SURVEY.md §2.14b); this layer is new design.

Layout: a ('data', 'graph') device mesh.  The mesh-batch axis shards over
'data' (pure DP); each mesh's vertex rows (and the leading block axis of its
banded stencils) shard over 'graph'.  Inside shard_map every array is the
device-local shard; models are built with ``axis_name='graph'`` so their ops
exchange halo rows over ICI ppermutes instead of gathering.

Gradient correctness notes (the traps live in the loss assembly):
  * Per-vertex losses (segmentation/correspondence): local rows are true
    partials; ``psum(sum)/psum(count)`` over both axes gives the exact
    global masked mean, and shard_map's transpose of the replicated params
    psums the per-shard partial grads — exact.
  * Replicated post-psum heads (classification's pooled logits + bias, the
    matching descriptors after all_gather): every graph shard computes the
    SAME value, so naively summing their grads would count post-psum params
    n_graph times.  The fix: mask the replicated loss term to graph shard 0
    and psum it back over 'graph' — psum's transpose re-broadcasts the
    cotangent to every shard's pre-psum path (1x, exact) while the
    where-mask zeroes the duplicate post-psum paths.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..precomp.banded import BandedTable, CompressedBandedTable
from ..train.config import ExperimentConfig
from ..train.trainer import (
    MeshBatch,
    TrainState,
    _guarded_update,
    random_rotate_scale,
)


@dataclasses.dataclass
class VertexMeta:
    """Duck-typed stand-in for EdgeTable under graph-parallel execution.

    Carries only what the models read when every op runs banded: the local
    vmask rows and the GLOBAL valid-vertex count (the classification mean
    pool divides by it after psumming over the graph axis).
    """

    vmask: jnp.ndarray
    n_valid: int
    band_limit: int
    n_rings: int


jax.tree_util.register_dataclass(
    VertexMeta, data_fields=["vmask"],
    meta_fields=["n_valid", "band_limit", "n_rings"],
)


@dataclasses.dataclass
class GPBatch:
    """A MeshBatch flattened for shard_map: arrays only + static meta.

    pos (B, N, 3) / vmask (B, N) / labels (B,) or (B, N) /
    bsten (B, nb, R+2K, TB, W') / csten (B, nb, 5, TB, W').
    """

    pos: jnp.ndarray
    vmask: jnp.ndarray
    labels: jnp.ndarray
    bsten: jnp.ndarray
    csten: jnp.ndarray
    tb: int
    nh: int
    n_valid: int
    band_limit: int
    n_rings: int


jax.tree_util.register_dataclass(
    GPBatch,
    data_fields=["pos", "vmask", "labels", "bsten", "csten"],
    meta_fields=["tb", "nh", "n_valid", "band_limit", "n_rings"],
)


def gp_batch(batch: MeshBatch) -> GPBatch:
    """Flatten a stacked MeshBatch (must carry banded + comp tables)."""
    if batch.banded is None or batch.comp is None:
        raise ValueError(
            "graph-parallel training needs banded + comp tables: build the "
            "batch with stack_batch(..., banded_tb=TB, echo_banded=True)")
    if batch.banded.nh != batch.comp.nh:
        raise ValueError(
            f"banded nh {batch.banded.nh} != comp nh {batch.comp.nh}")
    t = batch.table
    return GPBatch(
        pos=batch.pos, vmask=t.vmask, labels=batch.labels,
        bsten=batch.banded.sten_band, csten=batch.comp.sten_band,
        tb=batch.banded.tb, nh=batch.banded.nh, n_valid=t.n_valid,
        band_limit=t.band_limit, n_rings=t.n_rings,
    )


def _label_spec(labels) -> P:
    # (B,) mesh-level labels shard over data only; (B, N) per-vertex labels
    # shard their vertex axis over graph.
    return P("data", "graph") if labels.ndim > 1 else P("data")


def place_gp_batch(gpb: GPBatch, mesh: Mesh,
                   process_local: bool = False) -> GPBatch:
    """Put a host GPBatch onto the ('data','graph') device mesh.

    process_local=True (multi-process runs): each process materializes only
    its own data-axis rows of the batch — gpb must still be the full-batch
    layout on every process, but only the local slice is read (process-local
    data loading; parallel/distributed.py)."""
    from .distributed import place_global, process_local_batch_slice

    n_items = gpb.pos.shape[0]
    sl = (process_local_batch_slice(n_items, mesh)
          if process_local and jax.process_count() > 1 else slice(None))

    def put(x, spec):
        return place_global(np.asarray(x[sl]), mesh, spec,
                            process_local=process_local)

    dg = P("data", "graph")
    return GPBatch(
        pos=put(gpb.pos, dg), vmask=put(gpb.vmask, dg),
        labels=put(gpb.labels, _label_spec(gpb.labels)),
        bsten=put(gpb.bsten, dg), csten=put(gpb.csten, dg),
        tb=gpb.tb, nh=gpb.nh, n_valid=gpb.n_valid,
        band_limit=gpb.band_limit, n_rings=gpb.n_rings,
    )


def _mask_to_shard0(value, axis_name):
    """Replicated-over-axis value -> same value with exact-gradient plumbing
    (see module docstring: mask to shard 0, psum back)."""
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.psum(jnp.where(idx == 0, value, 0.0), axis_name)


def make_gp_loss_fn(net, config: ExperimentConfig, n_classes: int,
                    gpb_meta: GPBatch):
    """Shard-local loss over local shards of a GPBatch.  ``net`` must be
    built with axis_name='graph' (train.loop.build_model(..., axis_name=))."""
    task = config.task
    tb, nh = gpb_meta.tb, gpb_meta.nh
    n_valid = gpb_meta.n_valid
    B, R = gpb_meta.band_limit, gpb_meta.n_rings

    def apply_one(params, pos_i, vmask_i, bsten_i, csten_i, dropkey=None):
        Nl = pos_i.shape[0]
        banded_l = BandedTable(sten_band=bsten_i, tb=tb, nh=nh, n_pad=Nl,
                               band_limit=B, n_rings=R)
        comp_l = CompressedBandedTable(sten_band=csten_i, tb=tb, nh=nh,
                                       n_pad=Nl, band_limit=B, n_rings=R)
        meta = VertexMeta(vmask=vmask_i, n_valid=n_valid, band_limit=B,
                          n_rings=R)
        if dropkey is not None:
            return net.apply(params, pos_i, meta, banded_l, comp_l,
                             deterministic=False, rngs={"dropout": dropkey})
        return net.apply(params, pos_i, meta, banded_l, comp_l)

    def loss_fn(params, key, pos, vmask, labels, bsten, csten):
        # identical key on every graph shard of a data row -> identical
        # per-mesh rotations; distinct across data shards
        kd = jax.random.fold_in(key, jax.lax.axis_index("data"))
        ka, kdrop = jax.random.split(kd)
        pos = random_rotate_scale(ka, pos, config.random_rotate_deg,
                                  config.random_scale)
        Bl = pos.shape[0]

        if task == "correspondence":
            # dropout masks decorrelated across graph shards (they apply to
            # graph-sharded per-vertex rows)
            kdrop = jax.random.fold_in(kdrop, jax.lax.axis_index("graph"))
            keys = jax.random.split(kdrop, Bl)
            out = jax.vmap(
                lambda p, v, b, c, k: apply_one(params, p, v, b, c, k)
            )(pos, vmask, bsten, csten, keys)
        else:
            out = jax.vmap(
                lambda p, v, b, c: apply_one(params, p, v, b, c)
            )(pos, vmask, bsten, csten)

        if task == "classification":
            logits = out[:, 0, :]                       # (Bl, n_classes)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            ce = jnp.mean(nll)                          # replicated on graph
            loss = _mask_to_shard0(ce, "graph")
            return jax.lax.pmean(loss, "data")

        # per-vertex tasks: masked global mean via psum(sum)/psum(count)
        logits = out.reshape(-1, n_classes)             # local rows
        labels_f = labels.reshape(-1)
        valid = labels_f >= 0
        labels_safe = jnp.where(valid, labels_f, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
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
        axes = ("data", "graph")
        total = jax.lax.psum(jnp.sum(per_row), axes)
        count = jax.lax.psum(jnp.sum(valid), axes)
        return total / jnp.maximum(count, 1)

    return loss_fn


def make_gp_value_and_grad(net, config: ExperimentConfig, n_classes: int,
                           mesh: Mesh, gpb_meta: GPBatch):
    """(params, key, gpb) -> (loss, grads): the shard_map'd loss of
    make_gp_loss_fn differentiated wrt params.  Shared by the train step and
    the N-device == 1-device parity tests."""
    loss_fn = make_gp_loss_fn(net, config, n_classes, gpb_meta)
    label_spec = _label_spec(gpb_meta.labels)
    dg = P("data", "graph")

    smapped = jax.shard_map(
        loss_fn, mesh=mesh,
        in_specs=(P(), P(), dg, dg, label_spec, dg, dg),
        out_specs=P(),
        check_vma=False,
    )

    def value_and_grad(params, key, gpb: GPBatch):
        def wrapped(p):
            return smapped(p, key, gpb.pos, gpb.vmask, gpb.labels,
                           gpb.bsten, gpb.csten)

        return jax.value_and_grad(wrapped)(params)

    return value_and_grad


def make_gp_train_step(net, config: ExperimentConfig, n_classes: int, opt,
                       mesh: Mesh, gpb_meta: GPBatch):
    """Jitted graph-parallel train step over a ('data','graph') mesh.

    net: built with axis_name='graph'.  Params/opt state replicated; the
    batch arrives as a device-placed GPBatch (place_gp_batch).
    """
    vag = make_gp_value_and_grad(net, config, n_classes, mesh, gpb_meta)

    @jax.jit
    def train_step(state: TrainState, key, gpb: GPBatch):
        l, grads = vag(state.params, key, gpb)
        return _guarded_update(state, l, grads, opt), {"loss": l}

    return train_step


def make_gp_twin_value_and_grad(net, config: ExperimentConfig, mesh: Mesh,
                                gpb_meta: GPBatch):
    """(params, key, gpb_s, gpb_t, pos_pairs, null_pairs) -> (loss, grads)
    for the graph-parallel Siamese loss: both forwards run graph-parallel;
    descriptors are all_gathered over the graph axis (small: N × descriptor
    dim) so the pair losses see global rows.  Shared by the twin train step
    and the N-device == 1-device parity tests."""
    from ..nn import losses

    tb, nh = gpb_meta.tb, gpb_meta.nh
    n_valid = gpb_meta.n_valid
    B, R = gpb_meta.band_limit, gpb_meta.n_rings

    def apply_one(params, pos_i, vmask_i, bsten_i, csten_i):
        Nl = pos_i.shape[0]
        banded_l = BandedTable(sten_band=bsten_i, tb=tb, nh=nh, n_pad=Nl,
                               band_limit=B, n_rings=R)
        comp_l = CompressedBandedTable(sten_band=csten_i, tb=tb, nh=nh,
                                       n_pad=Nl, band_limit=B, n_rings=R)
        meta = VertexMeta(vmask=vmask_i, n_valid=n_valid, band_limit=B,
                          n_rings=R)
        return net.apply(params, pos_i, meta, banded_l, comp_l)

    def loss_fn(params, key, pos_s, vmask_s, bsten_s, csten_s,
                pos_t, vmask_t, bsten_t, csten_t, pos_pairs, null_pairs):
        kd = jax.random.fold_in(key, jax.lax.axis_index("data"))
        ka, kb, kl = jax.random.split(kd, 3)
        pos_s = random_rotate_scale(ka, pos_s, config.random_rotate_deg,
                                    config.random_scale)
        pos_t = random_rotate_scale(kb, pos_t, config.random_rotate_deg,
                                    config.random_scale)
        Bl = pos_s.shape[0]

        run = jax.vmap(lambda p, v, b, c: apply_one(params, p, v, b, c))
        fs = run(pos_s, vmask_s, bsten_s, csten_s)     # (Bl, Nl, D) local rows
        ft = run(pos_t, vmask_t, bsten_t, csten_t)
        # gather global descriptor rows (vertex axis is dim 1)
        fs = jax.lax.all_gather(fs, "graph", axis=1, tiled=True)
        ft = jax.lax.all_gather(ft, "graph", axis=1, tiled=True)

        keys = jax.random.split(kl, Bl)
        per_mesh = jax.vmap(
            lambda k, s, t, pp, np_: losses.twin_loss(
                k, s, t, pp, np_, mu=config.twin_mu)
        )(keys, fs, ft, pos_pairs, null_pairs)
        tl = jnp.mean(per_mesh)                        # replicated on graph
        loss = _mask_to_shard0(tl, "graph")
        return jax.lax.pmean(loss, "data")

    dg = P("data", "graph")
    pair_spec = P("data")
    smapped = jax.shard_map(
        loss_fn, mesh=mesh,
        in_specs=(P(), P(), dg, dg, dg, dg, dg, dg, dg, dg,
                  pair_spec, pair_spec),
        out_specs=P(),
        check_vma=False,
    )

    def value_and_grad(params, key, gpb_s: GPBatch, gpb_t: GPBatch,
                       pos_pairs, null_pairs):
        def wrapped(p):
            return smapped(p, key,
                           gpb_s.pos, gpb_s.vmask, gpb_s.bsten, gpb_s.csten,
                           gpb_t.pos, gpb_t.vmask, gpb_t.bsten, gpb_t.csten,
                           pos_pairs, null_pairs)

        return jax.value_and_grad(wrapped)(params)

    return value_and_grad


def make_gp_twin_train_step(net, config: ExperimentConfig, opt, mesh: Mesh,
                            gpb_meta: GPBatch):
    """Graph-parallel Siamese train step (feature_matching.ipynb cell 13)."""
    vag = make_gp_twin_value_and_grad(net, config, mesh, gpb_meta)

    @jax.jit
    def train_step(state: TrainState, key, gpb_s: GPBatch, gpb_t: GPBatch,
                   pos_pairs, null_pairs):
        l, grads = vag(state.params, key, gpb_s, gpb_t, pos_pairs,
                       null_pairs)
        return _guarded_update(state, l, grads, opt), {"loss": l}

    return train_step
