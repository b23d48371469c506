"""Graph-parallel panel-CSR conv: 4-shard == 1-device values and grads.

The multi-chip path for the 100k-vertex config (panel stencil sharded by
target blocks, g all_gather'ed, by-source backward + coverage masking,
psum_scatter via the gather transpose)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from conftest import random_graph
from fieldconv_tpu.ops.field_conv import field_conv
from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded
from fieldconv_tpu.parallel.panel_gp import field_conv_panel_gp, local_shard
from fieldconv_tpu.precomp.banded import (build_panel_table, kd_order,
                                          reorder_precompute,
                                          shard_panel_table)
from fieldconv_tpu.precomp.stencil import build_edge_table


@pytest.mark.parametrize("compressed", [True, False])
def test_panel_gp_matches_single_device(rng, compressed):
    n_shards = 4
    g = random_graph(rng, n_vertices=64, avg_deg=5, B=1, R=3, epsilon=0.5)
    pos = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos, tb=8)
    edges_r, w = reorder_precompute(perm, g["edges"], g["w"])
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w,
                             g["xp"], g["n_vertices"], g["B"], g["R"],
                             g["epsilon"], n_multiple=8)
    panel = build_panel_table(table, tb=8, compressed=compressed)
    shards = shard_panel_table(panel, n_shards)

    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                              rng.normal(size=(N, C))], -1), jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def loss1(x, zon, sph, ph):
        y = field_conv_banded(x, panel, zon, sph, ph, 1)
        return jnp.sum(y * y), y

    (l1, y1), g1 = jax.value_and_grad(loss1, argnums=(0, 1, 2, 3),
                                      has_aux=True)(x, zon, sph, ph)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    gp = P("graph")

    def loss_gp(x_l, sten, meta, meta_s, cov, zon, sph, ph):
        # in_specs P('graph') deliver the local (1, ...) rows
        sh = local_shard(type(shards)(
            sten=sten, meta=meta, meta_s=meta_s, coverage=cov,
            tb=shards.tb, n_pad=shards.n_pad, n_local=shards.n_local,
            band_limit=shards.band_limit, n_rings=shards.n_rings,
            compressed=shards.compressed))
        y = field_conv_panel_gp(x_l, sh, zon, sph, ph, 1, "graph")
        return jax.lax.psum(jnp.sum(y * y), "graph"), y

    smapped = jax.shard_map(
        loss_gp, mesh=mesh,
        in_specs=(gp, gp, gp, gp, gp, P(), P(), P()),
        out_specs=(P(), gp),
        check_vma=False,
    )

    def wrapped(x, zon, sph, ph):
        l, y = smapped(x, shards.sten, shards.meta, shards.meta_s,
                       shards.coverage, zon, sph, ph)
        return l, y

    with mesh:
        (l2, y2), g2 = jax.value_and_grad(wrapped, argnums=(0, 1, 2, 3),
                                          has_aux=True)(x, zon, sph, ph)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("task", [
    "classification",
    pytest.param("correspondence", marks=pytest.mark.slow),
])
def test_panel_gp_full_model_matches_single_device(rng, task):
    """The FULL model over panel shards (every op panel-gp: conv via
    _band_panel + all_gather'ed g, lift via trans_field_panel_gp, ECHO via
    echo_panel_gp) == the single-device panel path: loss and all parameter
    grads.  This is the multi-chip trainer for the 100k config
    (VERDICT r3 #2)."""
    import jax.numpy as jnp
    from fieldconv_tpu.models import ClassificationNet, CorrespondenceNet
    from fieldconv_tpu.parallel.panel_gp import (
        make_panel_gp_value_and_grad, panel_gp_batch, place_panel_gp_batch)
    from fieldconv_tpu.train.config import ExperimentConfig

    n_shards = 4
    B, R = (2, 6) if task == "classification" else (1, 3)
    g = random_graph(rng, n_vertices=96, avg_deg=5, B=B, R=R, epsilon=0.5)
    pos_full = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos_full, tb=8)
    edges_r, w, pos_r = reorder_precompute(perm, g["edges"], g["w"],
                                           pos_full)
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w,
                             g["xp"], g["n_vertices"], B, R,
                             g["epsilon"], n_multiple=8 * n_shards)
    panel = build_panel_table(table, tb=8, compressed=True)
    shards = shard_panel_table(panel, n_shards)

    N = table.n_pad
    pos = np.zeros((N, 3), np.float32)
    pos[:table.n_valid] = pos_r[:table.n_valid]
    if task == "classification":
        labels = np.int32(2)
        n_classes = 5
        net1 = ClassificationNet(n_classes=n_classes, nf=6, band_limit=B,
                                 n_rings=R)
        netg = ClassificationNet(n_classes=n_classes, nf=6, band_limit=B,
                                 n_rings=R, axis_name="graph")
    else:
        labels = np.full(N, -1, np.int32)
        labels[:table.n_valid] = rng.integers(0, 7, table.n_valid)
        n_classes = 7
        net1 = CorrespondenceNet(n_classes=n_classes, nf=6, n_des=4,
                                 n_bins=2, band_limit=B, n_rings=R,
                                 dropout=0.0)
        netg = net1.clone(axis_name="graph")
    config = ExperimentConfig(task=task, band_limit=B, n_rings=R,
                              random_rotate_deg=0.0, random_scale=None)

    params = net1.init(jax.random.key(0), pos, table)
    key = jax.random.key(7)

    # single-device reference: same panel layout, same loss formula
    def loss1(params):
        if task == "classification":
            out = net1.apply(params, pos, table, panel, panel)
            return -jax.nn.log_softmax(out[0])[labels]
        out = net1.apply(params, pos, table, panel, panel)
        valid = labels >= 0
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(out, axis=-1)
        per = -jnp.take_along_axis(logp, safe[:, None], 1)[:, 0]
        per = jnp.where(valid, per, 0.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)

    want_l, want_g = jax.value_and_grad(loss1)(params)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    b = panel_gp_batch(pos, table, labels, shards)
    b = place_panel_gp_batch(b, mesh)
    vag = make_panel_gp_value_and_grad(netg, config, n_classes, mesh, b)
    with mesh:
        got_l, got_g = jax.jit(vag)(params, key, b)

    np.testing.assert_allclose(float(got_l), float(want_l),
                               rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(want_g)
    flatg = dict(jax.tree_util.tree_leaves_with_path(got_g))
    assert len(flat1) == len(flatg)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(flatg[path]), np.asarray(leaf),
            rtol=1e-3, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("halo", [False, True])
def test_compact_gp_echo_lift_match_single_device(rng, halo):
    """Compact-layout graph parallelism: 4-shard ECHO + lift == 1-device
    values and grads (global-row segment_sum dX + all_gather transpose —
    no coverage mask, no by-source view).  halo=True runs the boundary-
    compressed exchange (CompactHaloShards: all_to_all of only the
    referenced remote rows) instead of the full all_gather."""
    from fieldconv_tpu.ops.pallas.echo_panel import echo_panel_pallas
    from fieldconv_tpu.ops.trans_field import trans_field_compact_contrib
    from fieldconv_tpu.parallel.panel_gp import (echo_compact_gp,
                                                 trans_field_compact_gp)
    from fieldconv_tpu.precomp.banded import (CompactHaloShards,
                                              CompactShards,
                                              build_compact_panel_table,
                                              halo_compact_shards,
                                              shard_compact_table)

    n_shards = 4
    g = random_graph(rng, n_vertices=64, avg_deg=5, B=1, R=3, epsilon=0.5)
    pos = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos, tb=8)
    edges_r, w = reorder_precompute(perm, g["edges"], g["w"])
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w,
                             g["xp"], g["n_vertices"], g["B"], g["R"],
                             g["epsilon"], n_multiple=8)
    compact = build_compact_panel_table(table, tb=8, ts=8)
    shards = shard_compact_table(compact, n_shards)
    if halo:
        shards = halo_compact_shards(shards, h_multiple=4)
    N, C = table.n_pad, 4

    z = rng.normal(size=(N, C)) + 1j * rng.normal(size=(N, C))
    xe = np.stack([z.real, z.imag], -1).astype(np.float32)
    xe[rng.random(N) < 0.2] = 0.0
    xe = jnp.asarray(xe)
    xs = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    def loss1(xe, xs):
        h = echo_panel_pallas(xe, compact, 2, cc=2)
        a, m = trans_field_compact_contrib(xs, compact, lift_cols=(1, 2))
        return jnp.sum(jnp.sin(h)) + jnp.sum(jnp.sin(a)) + jnp.sum(m * m)

    l1, g1 = jax.value_and_grad(loss1, argnums=(0, 1))(xe, xs)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    gp = P("graph")

    def loss_gp(xe_l, xs_l, sten, meta, src_idx, *send):
        kw = dict(
            sten=sten, meta=meta, src_idx=src_idx,
            tb=shards.tb, n_pad=shards.n_pad, n_local=shards.n_local,
            band_limit=shards.band_limit, n_rings=shards.n_rings,
            compressed=shards.compressed, ts=shards.ts)
        sh = CompactHaloShards(send_idx=send[0], **kw) if send \
            else CompactShards(**kw)
        h = echo_compact_gp(xe_l, sh, 2, "graph", cc=2)
        a, m = trans_field_compact_gp(xs_l, sh, (1, 2), "graph")
        return jax.lax.psum(
            jnp.sum(jnp.sin(h)) + jnp.sum(jnp.sin(a)) + jnp.sum(m * m),
            "graph")

    extra = (shards.send_idx,) if halo else ()
    smapped = jax.shard_map(
        loss_gp, mesh=mesh,
        in_specs=(gp, gp, gp, gp, gp) + (gp,) * len(extra),
        out_specs=P(),
        check_vma=False,
    )

    def wrapped(xe, xs):
        return smapped(xe, xs, shards.sten, shards.meta, shards.src_idx,
                       *extra)

    with mesh:
        l2, g2 = jax.value_and_grad(wrapped, argnums=(0, 1))(xe, xs)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("halo", [False, True])
def test_all_compact_gp_full_model_matches_single_device(rng, halo):
    """ALL-COMPACT graph parallelism: the FULL model with ONE sharded
    CompactPanelTable serving every op (convs via field_conv_compact_gp,
    lift + ECHO via the compact gp paths; the block-panel shards are
    never built) == the single-device all-compact path: loss and all
    parameter grads.  halo=True runs every collective boundary-compressed
    (CompactHaloShards; the conv exchanges RAW feature rows and rotates
    the received boundary rows locally)."""
    import jax.numpy as jnp
    from fieldconv_tpu.models import CorrespondenceNet
    from fieldconv_tpu.parallel.panel_gp import (
        make_panel_gp_value_and_grad, panel_gp_batch, place_panel_gp_batch)
    from fieldconv_tpu.precomp.banded import (build_compact_panel_table,
                                              halo_compact_shards,
                                              shard_compact_table)
    from fieldconv_tpu.train.config import ExperimentConfig

    n_shards = 4
    B, R = 1, 3
    g = random_graph(rng, n_vertices=96, avg_deg=5, B=B, R=R, epsilon=0.5)
    pos_full = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos_full, tb=8)
    edges_r, w, pos_r = reorder_precompute(perm, g["edges"], g["w"],
                                           pos_full)
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w,
                             g["xp"], g["n_vertices"], B, R,
                             g["epsilon"], n_multiple=8 * n_shards)
    compact = build_compact_panel_table(table, tb=8, ts=8)
    cshards = shard_compact_table(compact, n_shards)
    if halo:
        cshards = halo_compact_shards(cshards, h_multiple=4)

    N = table.n_pad
    pos = np.zeros((N, 3), np.float32)
    pos[:table.n_valid] = pos_r[:table.n_valid]
    labels = np.full(N, -1, np.int32)
    labels[:table.n_valid] = rng.integers(0, 7, table.n_valid)
    n_classes = 7
    net1 = CorrespondenceNet(n_classes=n_classes, nf=6, n_des=4,
                             n_bins=2, band_limit=B, n_rings=R,
                             dropout=0.0)
    netg = net1.clone(axis_name="graph")
    config = ExperimentConfig(task="correspondence", band_limit=B,
                              n_rings=R, random_rotate_deg=0.0,
                              random_scale=None, echo_impl="compact",
                              conv_impl="compact")

    params = net1.init(jax.random.key(0), pos, table)
    key = jax.random.key(7)

    def loss1(params):
        out = net1.apply(params, pos, table, compact, compact)
        valid = labels >= 0
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(out, axis=-1)
        per = -jnp.take_along_axis(logp, safe[:, None], 1)[:, 0]
        per = jnp.where(valid, per, 0.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1)

    want_l, want_g = jax.value_and_grad(loss1)(params)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    b = panel_gp_batch(pos, table, labels, None, compact_shards=cshards)
    assert b.sten is None and b.csten is not None
    b = place_panel_gp_batch(b, mesh)
    vag = make_panel_gp_value_and_grad(netg, config, n_classes, mesh, b)
    with mesh:
        got_l, got_g = jax.jit(vag)(params, key, b)

    np.testing.assert_allclose(float(got_l), float(want_l),
                               rtol=1e-5, atol=1e-6)
    flat1 = jax.tree_util.tree_leaves_with_path(want_g)
    flatg = dict(jax.tree_util.tree_leaves_with_path(got_g))
    assert len(flat1) == len(flatg)
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(flatg[path]), np.asarray(leaf),
            rtol=1e-3, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("halo", [False, True])
def test_panel_gp_forward_matches_single_device(rng, halo):
    """The graph-parallel INFERENCE path (make_panel_gp_forward — serving
    at the 100k+ regime): sharded deterministic forward output == the
    single-device all-compact forward, every vertex row."""
    import jax.numpy as jnp
    from fieldconv_tpu.models import CorrespondenceNet
    from fieldconv_tpu.parallel.panel_gp import (
        make_panel_gp_forward, panel_gp_batch, place_panel_gp_batch)
    from fieldconv_tpu.precomp.banded import (build_compact_panel_table,
                                              halo_compact_shards,
                                              shard_compact_table)
    from fieldconv_tpu.train.config import ExperimentConfig

    n_shards = 4
    B, R = 1, 3
    g = random_graph(rng, n_vertices=96, avg_deg=5, B=B, R=R, epsilon=0.5)
    pos_full = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos_full, tb=8)
    edges_r, w, pos_r = reorder_precompute(perm, g["edges"], g["w"],
                                           pos_full)
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w,
                             g["xp"], g["n_vertices"], B, R,
                             g["epsilon"], n_multiple=8 * n_shards)
    compact = build_compact_panel_table(table, tb=8, ts=8)
    cshards = shard_compact_table(compact, n_shards)
    if halo:
        cshards = halo_compact_shards(cshards, h_multiple=4)

    N = table.n_pad
    pos = np.zeros((N, 3), np.float32)
    pos[:table.n_valid] = pos_r[:table.n_valid]
    labels = np.full(N, -1, np.int32)
    net1 = CorrespondenceNet(n_classes=7, nf=6, n_des=4, n_bins=2,
                             band_limit=B, n_rings=R, dropout=0.0)
    netg = net1.clone(axis_name="graph")
    config = ExperimentConfig(task="correspondence", band_limit=B,
                              n_rings=R, echo_impl="compact",
                              conv_impl="compact")

    params = net1.init(jax.random.key(0), pos, table)
    want = np.asarray(net1.apply(params, pos, table, compact, compact,
                                 deterministic=True))

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("graph",))
    b = panel_gp_batch(pos, labels=labels, table=table, shards=None,
                       compact_shards=cshards)
    b = place_panel_gp_batch(b, mesh)
    fwd = make_panel_gp_forward(netg, config, mesh, b)
    with mesh:
        got = np.asarray(fwd(params, b))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
