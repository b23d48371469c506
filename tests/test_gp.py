"""Graph-parallel training step: full-model loss + grads on an 8-device
(2 data × 4 graph) CPU mesh == the 1-device banded run (VERDICT r1 #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_band_conv import banded_graph, tables_for
from fieldconv_tpu.parallel.gp import (
    gp_batch,
    make_gp_train_step,
    make_gp_value_and_grad,
    place_gp_batch,
)
from fieldconv_tpu.parallel.sharding import make_device_mesh, replicate
from fieldconv_tpu.train.config import ExperimentConfig
from fieldconv_tpu.train.loop import build_model
from fieldconv_tpu.train.trainer import (
    TrainState,
    make_loss_fn,
    make_optimizer,
    stack_batch,
)


def _setup(rng, task, bw=7, n_classes=5, n_vertices=96, **cfg_kw):
    """Two meshes on a small banded graph; batch with banded+comp."""
    g = banded_graph(rng, n_vertices=n_vertices, tb=8, bw=bw)
    table, banded = tables_for(g, tb=8)
    N = table.n_pad
    # augmentation disabled -> both paths see identical positions
    config = ExperimentConfig(
        task=task, band_limit=g["B"], n_rings=g["R"], nf=6,
        n_des=6 if task != "classification" else None, n_bins=2,
        random_rotate_deg=0.0, random_scale=None, **cfg_kw)

    items = []
    for i in range(2):
        pos = np.asarray(rng.normal(size=(N, 3)), np.float32)
        if task == "classification":
            label = np.int32(i % n_classes)
        else:
            label = rng.integers(0, n_classes, size=N).astype(np.int32)
            label[-8:] = -1          # padding rows masked
        items.append((pos, table, label))
    batch = stack_batch(items, banded_tb=8, echo_banded=True)
    return config, batch, table, n_classes


@pytest.mark.parametrize("task,bw", [
    # classification/bw=7 stays in the DEFAULT suite: the one cheap
    # full-model N-device == 1-device parity case (~25 s); the rest are slow
    pytest.param("classification", 7),
    # ^ nh=1: nb_local=4 > 2nh -> overlap halo path
    pytest.param("classification", 14, marks=pytest.mark.slow),
    # ^ nh=2: nb_local=4 = 2nh -> serial halo path
    pytest.param("segmentation", 7, marks=pytest.mark.slow),
    pytest.param("correspondence", 7, marks=pytest.mark.slow),
])
def test_gp_matches_single_device(rng, task, bw):
    config, batch, table, n_classes = _setup(rng, task, bw=bw)

    # single-device banded reference (same params; lift+conv+echo banded)
    net1 = build_model(config, n_classes)
    params = jax.jit(net1.init)(
        jax.random.key(0), batch.pos[0],
        jax.tree.map(lambda x: x[0], batch.table))
    if task == "correspondence":
        # dropout off so the deterministic-flag difference cannot matter
        net1 = net1.clone(dropout=0.0)
    loss1 = make_loss_fn(net1, config, n_classes)
    key = jax.random.key(42)
    want_l, want_g = jax.jit(jax.value_and_grad(loss1))(params, key, batch)

    # 8-device graph-parallel run
    mesh = make_device_mesh(2, 4, jax.devices()[:8])
    netg = build_model(config, n_classes, axis_name="graph")
    if task == "correspondence":
        netg = netg.clone(dropout=0.0)
    gpb = place_gp_batch(gp_batch(batch), mesh)
    vag = make_gp_value_and_grad(netg, config, n_classes, mesh, gpb)
    with mesh:
        got_l, got_g = jax.jit(vag)(replicate(params, mesh), key, gpb)

    np.testing.assert_allclose(float(got_l), float(want_l),
                               rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(want_g)
    flatg = dict(jax.tree_util.tree_leaves_with_path(got_g))
    assert len(flat1) == len(flatg)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(flatg[path]), np.asarray(leaf),
            rtol=1e-4, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_gp_train_step_runs_and_updates(rng):
    """One optimizer step through the gp path: finite loss, params move and
    stay in sync with the single-device step."""
    config, batch, table, n_classes = _setup(rng, "classification",
                                             n_vertices=64)
    mesh = make_device_mesh(2, 4, jax.devices()[:8])
    netg = build_model(config, n_classes, axis_name="graph")
    # init with the single-device twin: identical param tree, no collectives
    params = jax.jit(build_model(config, n_classes).init)(
        jax.random.key(0), batch.pos[0],
        jax.tree.map(lambda x: x[0], batch.table))
    opt = make_optimizer(config)
    gpb = place_gp_batch(gp_batch(batch), mesh)
    step = make_gp_train_step(netg, config, n_classes, opt, mesh, gpb)
    with mesh:
        state = TrainState(replicate(params, mesh),
                           replicate(opt.init(params), mesh),
                           jnp.zeros((), jnp.int32))
        state, metrics = step(state, jax.random.key(1), gpb)
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, state.params)
    assert max(jax.tree.leaves(moved)) > 0.0


@pytest.mark.slow
def test_gp_twin_matches_single_graph_shard(rng):
    """Siamese graph-parallel step (all_gather of descriptors + mask-to-
    shard0 replicated-loss plumbing): loss + grads on a (1 data x 4 graph)
    mesh == the (1 x 1) single-shard run with identical keys.  Reference
    semantics: feature_matching.ipynb cell 13 / nn/twin_loss.py:16-37."""
    from fieldconv_tpu.parallel.gp import make_gp_twin_value_and_grad

    config, batch_s, table, _ = _setup(rng, "matching")
    _, batch_t, _, _ = _setup(rng, "matching")
    N = table.n_valid
    n_pairs = 16
    pos_pairs = jnp.asarray(
        rng.integers(0, N, size=(1, n_pairs, 2)), jnp.int32)
    null_pairs = jnp.asarray(
        rng.integers(0, N, size=(1, n_pairs, 2)), jnp.int32)
    # matching batches are single-mesh per step (feature_matching cell 13)
    take1 = lambda b: jax.tree.map(lambda x: x[:1], b)
    batch_s, batch_t = take1(batch_s), take1(batch_t)

    netg = build_model(config, n_classes=0, axis_name="graph")
    params = jax.jit(build_model(config, n_classes=0).init)(
        jax.random.key(0), batch_s.pos[0],
        jax.tree.map(lambda x: x[0], batch_s.table))
    key = jax.random.key(7)

    results = []
    for n_graph in (1, 4):
        mesh = make_device_mesh(1, n_graph, jax.devices()[:n_graph])
        gpb_s = place_gp_batch(gp_batch(batch_s), mesh)
        gpb_t = place_gp_batch(gp_batch(batch_t), mesh)
        vag = make_gp_twin_value_and_grad(netg, config, mesh, gpb_s)
        with mesh:
            l, g = jax.jit(vag)(replicate(params, mesh), key, gpb_s, gpb_t,
                                pos_pairs, null_pairs)
        results.append((float(l), g))

    (l1, g1), (l4, g4) = results
    assert np.isfinite(l1)
    np.testing.assert_allclose(l4, l1, rtol=1e-5, atol=1e-7)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat4 = dict(jax.tree_util.tree_leaves_with_path(g4))
    assert len(flat1) == len(flat4)
    nonzero = 0.0
    for path, leaf in flat1:
        nonzero = max(nonzero, float(jnp.max(jnp.abs(leaf))))
        np.testing.assert_allclose(
            np.asarray(flat4[path]), np.asarray(leaf),
            rtol=1e-4, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
    assert nonzero > 0.0
