"""Banded Pallas field-conv kernel: parity vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import random_graph, random_field
from fieldconv_tpu.precomp.stencil import build_edge_table
from fieldconv_tpu.precomp.banded import (
    BandedTable,
    bandwidth,
    build_banded_table,
    rcm_order,
    reorder_precompute,
)
from fieldconv_tpu.ops.field_conv import field_conv, field_conv_contrib
from fieldconv_tpu.ops.pallas.band_conv import (
    band_contrib,
    field_conv_banded,
    rotated_source_tensor_kmajor,
)


def banded_graph(rng, n_vertices=32, tb=8, bw=7, B=2, R=6):
    """Random support graph whose edges satisfy |src-tgt| <= bw (pre-banded)."""
    edges = []
    for i in range(n_vertices):
        lo, hi = max(0, i - bw), min(n_vertices, i + bw + 1)
        nbrs = rng.choice(np.arange(lo, hi), size=min(6, hi - lo), replace=False)
        for j in nbrs:
            edges.append((j, i))
    g = dict(
        edges=np.asarray(edges, dtype=np.int64),
        log_mag=rng.uniform(0.0, 0.3, len(edges)),
        log_ang=rng.uniform(-np.pi, np.pi, len(edges)),
        w=rng.uniform(0.1, 1.0, n_vertices),
        xp=np.exp(1j * rng.uniform(-np.pi, np.pi, len(edges))),
        n_vertices=n_vertices, B=B, R=R, epsilon=0.35,
    )
    return g


def tables_for(g, tb=8):
    table = build_edge_table(
        g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"],
        g["n_vertices"], g["B"], g["R"], g["epsilon"],
        n_multiple=tb,
    )
    banded = build_banded_table(table, tb=tb)
    return table, banded


def test_band_contrib_matches_reference(rng):
    g = banded_graph(rng)
    table, banded = tables_for(g)
    N, C = table.n_pad, 4
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    want = field_conv_contrib(x, table, d_chunk=1024)         # (N, R, C, K, 2)
    gk = rotated_source_tensor_kmajor(x, g["B"])
    got = band_contrib(gk, banded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_band_full_conv_and_grads(rng):
    g = banded_graph(rng)
    table, banded = tables_for(g)
    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    y_ref = field_conv(x, table, zr, sph, ph, 1, d_chunk=1024)
    y_band = field_conv_banded(x, banded, zr, sph, ph, 1)
    np.testing.assert_allclose(np.asarray(y_band), np.asarray(y_ref), atol=2e-5)

    def loss_band(x, zr):
        return jnp.sum(field_conv_banded(x, banded, zr, sph, ph, 1) ** 2)

    def loss_ref(x, zr):
        return jnp.sum(field_conv(x, table, zr, sph, ph, 1, d_chunk=1024) ** 2)

    gb = jax.grad(loss_band, argnums=(0, 1))(x, zr)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, zr)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gr[0]),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gr[1]),
                               atol=3e-4, rtol=1e-3)


def test_rcm_reordering_reduces_bandwidth(rng):
    g = random_graph(rng, n_vertices=60, avg_deg=5)
    bw0 = bandwidth(g["edges"])
    perm = rcm_order(g["edges"], g["n_vertices"])
    new_edges, = reorder_precompute(perm, g["edges"])
    bw1 = bandwidth(new_edges)
    assert bw1 <= bw0
    assert sorted(map(tuple, new_edges.tolist())) != sorted(
        map(tuple, g["edges"].tolist())
    ) or (perm == np.arange(len(perm))).all()


def test_reorder_preserves_convolution(rng):
    """Permuting vertices then convolving == convolving then permuting."""
    g = random_graph(rng, n_vertices=40, avg_deg=5)
    N, C, O, B, R = g["n_vertices"], 3, 2, g["B"], g["R"]
    x = random_field(rng, N, C, zero_frac=0.0)
    zr = rng.normal(size=(O, C, R)).astype(np.float32)
    sph = rng.normal(size=(O, C, R, B, 2)).astype(np.float32)
    ph = rng.normal(size=(O, C, B + 1)).astype(np.float32)

    def run(edges, log_mag, log_ang, w, xp, xc):
        table = build_edge_table(edges, log_mag, log_ang, w, xp, N, B, R,
                                 g["epsilon"])
        xpad = np.zeros((table.n_pad, C, 2), np.float32)
        xpad[:N, :, 0] = xc.real
        xpad[:N, :, 1] = xc.imag
        y = field_conv(jnp.asarray(xpad), table, jnp.asarray(zr),
                       jnp.asarray(sph), jnp.asarray(ph), 1, d_chunk=1024)
        return np.asarray(y)[:N]

    y0 = run(g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"], x)

    perm = rcm_order(g["edges"], N)
    new_edges, w2, x2 = reorder_precompute(perm, g["edges"], g["w"], x)
    y1 = run(new_edges, g["log_mag"], g["log_ang"], w2, g["xp"], x2)
    np.testing.assert_allclose(y1, y0[perm], atol=2e-5)


def test_fused_matches_unfused_all_params(rng):
    """Fused in-kernel filter contraction == unfused path, values and grads
    wrt every differentiable input (x, zonal, spherical, phase)."""
    g = banded_graph(rng)
    table, banded = tables_for(g)
    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def loss(fuse):
        def f(x, zr, sph, ph):
            y = field_conv_banded(x, banded, zr, sph, ph, 1,
                                  fuse_filters=fuse)
            return jnp.sum(y ** 2 + y)
        return f

    yf = field_conv_banded(x, banded, zr, sph, ph, 1, fuse_filters=True)
    yu = field_conv_banded(x, banded, zr, sph, ph, 1, fuse_filters=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yu), atol=2e-5)

    gf = jax.grad(loss(True), argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    gu = jax.grad(loss(False), argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


def test_band_contrib_bf16(rng):
    g = banded_graph(rng)
    table, banded = tables_for(g)
    N, C = table.n_pad, 4
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    gk = rotated_source_tensor_kmajor(x, g["B"])
    ref = band_contrib(gk, banded, "f32")
    got = band_contrib(gk, banded, "bf16")
    denom = float(jnp.linalg.norm(ref)) + 1e-9
    rel = float(jnp.linalg.norm(got - ref)) / denom
    assert rel < 0.02, rel


def test_compressed_matches_fused(rng):
    """Compressed-stencil kernel (in-VMEM hat/phasor reconstruction) ==
    dense-stencil fused path, values and all grads."""
    from fieldconv_tpu.precomp.banded import build_compressed_banded

    g = banded_graph(rng)
    table, banded = tables_for(g)
    comp = build_compressed_banded(table, tb=8)
    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    y_ref = field_conv_banded(x, banded, zr, sph, ph, 1)
    y_cmp = field_conv_banded(x, comp, zr, sph, ph, 1)
    np.testing.assert_allclose(np.asarray(y_cmp), np.asarray(y_ref),
                               atol=2e-5)

    def loss(tbl):
        def f(x, zr, sph, ph):
            y = field_conv_banded(x, tbl, zr, sph, ph, 1)
            return jnp.sum(y ** 2 + y)
        return f

    gr = jax.grad(loss(banded), argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    gc = jax.grad(loss(comp), argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    for a, b in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.slow
def test_g_resident_matches_block_dma(rng):
    """VMEM-resident g (whole-array constant-index-map fetch + in-kernel
    dynamic slices) == the NJ-block-DMA path, values and all grads."""
    g = banded_graph(rng)
    table, banded = tables_for(g)
    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    y_res = field_conv_banded(x, banded, zr, sph, ph, 1, g_resident=True)
    y_blk = field_conv_banded(x, banded, zr, sph, ph, 1, g_resident=False)
    np.testing.assert_allclose(np.asarray(y_res), np.asarray(y_blk),
                               atol=1e-6)

    def loss(gres):
        def f(x, zr, sph, ph):
            y = field_conv_banded(x, banded, zr, sph, ph, 1, g_resident=gres)
            return jnp.sum(y ** 2 + y)
        return f

    ga = jax.grad(loss(True), argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    gb = jax.grad(loss(False), argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("ftype", [0, 2])
def test_fused_ftypes(rng, ftype):
    """The fused kernel's W-matrix packing covers all three filter types."""
    g = banded_graph(rng)
    table, banded = tables_for(g)
    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(
        np.stack([rng.normal(size=(N, C)), rng.normal(size=(N, C))], -1),
        jnp.float32,
    )
    if ftype == 2:
        zr = jnp.asarray(rng.normal(size=(O, C, R, 2)), jnp.float32)
        sph = jnp.asarray(rng.normal(size=(O, C, R, 2 * B, 2)), jnp.float32)
    else:
        zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
        sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    y_ref = field_conv(x, table, zr, sph, ph, ftype, d_chunk=1024)
    y_fused = field_conv_banded(x, banded, zr, sph, ph, ftype)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)


def test_echo_banded_matches_xla(rng):
    """Gather-free banded ECHO == XLA echo (values + grads)."""
    from fieldconv_tpu.precomp.banded import build_compressed_banded
    from fieldconv_tpu.ops.echo import echo, echo_banded

    g = banded_graph(rng, n_vertices=64, tb=8, bw=14)
    table, _ = tables_for(g, tb=8)
    comp = build_compressed_banded(table, tb=8)
    N, C, n_bins = table.n_pad, 3, 2
    z = random_field(rng, N, C)
    x = jnp.asarray(np.stack([z.real, z.imag], -1), jnp.float32)

    want = echo(x, table, n_bins, d_chunk=1024)
    got = echo_banded(x, comp, n_bins, block_chunk=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=2e-5)

    def loss_ref(x):
        return jnp.sum(jnp.sin(echo(x, table, n_bins, d_chunk=1024)))

    def loss_band(x):
        return jnp.sum(jnp.sin(echo_banded(x, comp, n_bins, block_chunk=4)))

    g_ref = jax.grad(loss_ref)(x)
    g_band = jax.grad(loss_band)(x)
    np.testing.assert_allclose(np.asarray(g_band), np.asarray(g_ref),
                               atol=3e-5, rtol=2e-5)


def test_trans_field_banded_matches_xla(rng):
    """Gather-free banded lift == XLA gather lift (values + grads, both
    lift-column choices incl. the legacy classification slice)."""
    from fieldconv_tpu.precomp.banded import build_compressed_banded
    from fieldconv_tpu.ops.trans_field import (
        trans_field,
        trans_field_banded_contrib,
        trans_field_contrib,
    )

    g = banded_graph(rng)
    table, _ = tables_for(g, tb=8)
    comp = build_compressed_banded(table, tb=8)
    N, C, O, R, B = table.n_pad, 3, 5, g["R"], g["B"]
    x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

    for cols in [(0, 1), (B, B + 1)]:
        a0, m0 = trans_field_contrib(x, table, lift_cols=cols, d_chunk=1024)
        a1, m1 = trans_field_banded_contrib(x, comp, lift_cols=cols)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=2e-5)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=2e-5)

    za = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    zm = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C)), jnp.float32)

    def loss(f):
        def l(x, za, zm, ph):
            y = f(x, za, zm, ph)
            return jnp.sum(y ** 2 + y)
        return l

    f_ref = lambda x, za, zm, ph: trans_field(
        x, table, za, zm, ph, 1, lift_cols=(B, B + 1), d_chunk=1024)
    f_band = lambda x, za, zm, ph: trans_field(
        x, None, za, zm, ph, 1, lift_cols=(B, B + 1), comp=comp)
    np.testing.assert_allclose(
        np.asarray(f_band(x, za, zm, ph)), np.asarray(f_ref(x, za, zm, ph)),
        atol=2e-5)
    g_ref = jax.grad(loss(f_ref), argnums=(0, 1, 2, 3))(x, za, zm, ph)
    g_band = jax.grad(loss(f_band), argnums=(0, 1, 2, 3))(x, za, zm, ph)
    for a, b in zip(g_band, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("pipeline", [
    pytest.param("mega", marks=pytest.mark.slow),
    # megaw is pipeline='auto''s first choice (the default production path)
    # so its grid parity stays in the DEFAULT suite
    "megaw",
])
def test_mega_pipeline_matches_grid(rng, pipeline):
    """The single-grid-step manual-DMA mega kernels (classic + wide) == the
    grid pipeline: values and grads (x + all filter params), even/odd block
    counts."""
    from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded

    for nv in (48, 40):                       # even / odd nb at tb=8
        g = banded_graph(rng, n_vertices=nv, tb=8, bw=10)
        table, banded = tables_for(g, tb=8)
        N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
        x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                                  rng.normal(size=(N, C))], -1), jnp.float32)
        zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
        sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
        ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

        def loss(x, zon, sph, ph, pipeline):
            y = field_conv_banded(x, banded, zon, sph, ph, 1,
                                  pipeline=pipeline)
            return jnp.sum(y * y), y

        (l1, y1), g1 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                          has_aux=True)(x, zon, sph, ph,
                                                        "grid")
        (l2, y2), g2 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                          has_aux=True)(x, zon, sph, ph,
                                                        pipeline)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


def test_block_sparse_matches_gather(rng):
    """Block-sparse band (per-block neighbor lists, scalar-prefetch /
    SMEM-nbr kernels) == the XLA gather path: values and grads, both
    pipelines, on a ragged RCM-ordered graph."""
    from conftest import random_graph
    from fieldconv_tpu.precomp.banded import (
        build_block_sparse_banded, reorder_precompute)

    g = random_graph(rng, n_vertices=64, avg_deg=5, B=1, R=3, epsilon=0.5)
    perm = rcm_order(g["edges"], g["n_vertices"])
    edges_r, w = reorder_precompute(perm, g["edges"], g["w"])
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w, g["xp"],
                             g["n_vertices"], g["B"], g["R"], g["epsilon"],
                             n_multiple=8)
    sparse = build_block_sparse_banded(table, tb=8)
    assert sparse.nj <= table.n_pad // 8

    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                              rng.normal(size=(N, C))], -1), jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def loss_ref(x, zon, sph, ph):
        y = field_conv(x, table, zon, sph, ph, 1)
        return jnp.sum(y * y), y

    (l1, y1), g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3),
                                      has_aux=True)(x, zon, sph, ph)
    for pipe in ("grid", "mega"):
        def loss_sp(x, zon, sph, ph):
            y = field_conv_banded(x, sparse, zon, sph, ph, 1, pipeline=pipe)
            return jnp.sum(y * y), y

        (l2, y2), g2 = jax.value_and_grad(loss_sp, argnums=(0, 1, 2, 3),
                                          has_aux=True)(x, zon, sph, ph)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("compressed,chunk", [
    (False, 1), (True, 1), (True, 4)])
def test_panel_matches_gather(rng, compressed, chunk):
    """Panel-CSR band (grid over (tgt,src)-block panels, by-source backward
    emitting dG directly) == the XLA gather path: values and grads on a
    ragged kd-ordered graph, dense and compressed panel stencils."""
    from fieldconv_tpu.precomp.banded import (
        build_panel_table, kd_order, reorder_precompute)

    g = random_graph(rng, n_vertices=64, avg_deg=5, B=1, R=3, epsilon=0.5)
    pos = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos, tb=8)
    edges_r, w = reorder_precompute(perm, g["edges"], g["w"])
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w, g["xp"],
                             g["n_vertices"], g["B"], g["R"], g["epsilon"],
                             n_multiple=8)
    panel = build_panel_table(table, tb=8, compressed=compressed,
                              chunk=chunk)
    nb = table.n_pad // 8
    # panel bookkeeping invariants: sorted by tgt, every block covered both
    # as target and as source
    meta = np.asarray(panel.meta)           # (4, P) field-major rows
    assert (np.diff(meta[0]) >= 0).all()
    assert set(meta[0]) == set(range(nb)) and set(meta[1]) == set(range(nb))

    N, C, O, B, R = table.n_pad, 4, 3, g["B"], g["R"]
    x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                              rng.normal(size=(N, C))], -1), jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def loss_ref(x, zon, sph, ph):
        y = field_conv(x, table, zon, sph, ph, 1)
        return jnp.sum(y * y), y

    (l1, y1), g1 = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3),
                                      has_aux=True)(x, zon, sph, ph)

    def loss_pn(x, zon, sph, ph):
        y = field_conv_banded(x, panel, zon, sph, ph, 1)
        return jnp.sum(y * y), y

    (l2, y2), g2 = jax.value_and_grad(loss_pn, argnums=(0, 1, 2, 3),
                                      has_aux=True)(x, zon, sph, ph)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def _panel_setup(rng, compressed=True, B=1, R=3, tb=8, n_vertices=64,
                 chunk=1):
    from fieldconv_tpu.precomp.banded import (
        build_panel_table, kd_order, reorder_precompute)

    g = random_graph(rng, n_vertices=n_vertices, avg_deg=5, B=B, R=R,
                     epsilon=0.5)
    pos = rng.normal(size=(g["n_vertices"], 3))
    perm = kd_order(pos, tb=tb)
    edges_r, w = reorder_precompute(perm, g["edges"], g["w"])
    table = build_edge_table(edges_r, g["log_mag"], g["log_ang"], w, g["xp"],
                             g["n_vertices"], g["B"], g["R"], g["epsilon"],
                             n_multiple=tb)
    panel = build_panel_table(table, tb=tb, compressed=compressed,
                              chunk=chunk)
    return g, table, panel


@pytest.mark.parametrize("compressed,lift_cols", [
    (True, "correct"), (False, "correct"), (True, "quirk")])
def test_trans_field_panel_matches_gather(rng, compressed, lift_cols):
    """Panel-CSR TransField aggregation (the 100k-capable lift) == the XLA
    gather path: values and grads, compressed + dense panels, both the
    correct (0,+1)-frequency slice and the classification-notebook quirk
    slice (SURVEY.md §6c.1)."""
    from fieldconv_tpu.ops.trans_field import (
        trans_field_contrib, trans_field_panel_contrib)

    B = 1
    g, table, panel = _panel_setup(rng, compressed=compressed, B=B)
    cols = (B, B + 1) if lift_cols == "correct" else (0, 1)
    N, C = table.n_pad, 3
    x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

    def f_ref(x):
        ang, mag = trans_field_contrib(x, table, lift_cols=cols)
        return jnp.sum(jnp.sin(ang)) + jnp.sum(jnp.cos(mag)), (ang, mag)

    def f_pan(x):
        ang, mag = trans_field_panel_contrib(x, panel, lift_cols=cols,
                                             panel_chunk=5)
        return jnp.sum(jnp.sin(ang)) + jnp.sum(jnp.cos(mag)), (ang, mag)

    (l1, (a1, m1)), g1 = jax.value_and_grad(f_ref, has_aux=True)(x)
    (l2, (a2, m2)), g2 = jax.value_and_grad(f_pan, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("n_bins", [2, 3])
def test_echo_panel_matches_xla(rng, n_bins):
    """Panel-CSR ECHO (the 100k-capable descriptor path) == the XLA one-hot
    path: values and grads, including origin features whose votes vanish."""
    from fieldconv_tpu.ops.echo import echo, echo_panel

    g, table, panel = _panel_setup(rng, compressed=True, B=1, R=3)
    N, C = table.n_pad, 5
    z = random_field(rng, N, C)
    x = np.stack([z.real, z.imag], -1).astype(np.float32)
    x[rng.random(N) < 0.2] = 0.0
    x = jnp.asarray(x)

    want = echo(x, table, n_bins, d_chunk=1024)
    got = echo_panel(x, panel, n_bins, panel_chunk=5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=2e-5)

    def loss_ref(x):
        return jnp.sum(jnp.sin(echo(x, table, n_bins, d_chunk=1024)))

    def loss_pn(x):
        return jnp.sum(jnp.sin(echo_panel(x, panel, n_bins, panel_chunk=5)))

    g_ref = jax.grad(loss_ref)(x)
    g_pn = jax.grad(loss_pn)(x)
    np.testing.assert_allclose(np.asarray(g_pn), np.asarray(g_ref),
                               atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("n_bins", [2, 3])
def test_echo_panel_pallas_matches_xla(rng, n_bins):
    """The in-VMEM panel ECHO kernel (channel-major, by-source backward)
    == the XLA gather path: values and grads, origin features included."""
    from fieldconv_tpu.ops.echo import echo
    from fieldconv_tpu.ops.pallas.echo_panel import echo_panel_pallas

    g, table, panel = _panel_setup(rng, compressed=True, B=1, R=3)
    N, C = table.n_pad, 5
    z = random_field(rng, N, C)
    x = np.stack([z.real, z.imag], -1).astype(np.float32)
    x[rng.random(N) < 0.2] = 0.0
    x = jnp.asarray(x)

    want = echo(x, table, n_bins, d_chunk=1024)
    got = echo_panel_pallas(x, panel, n_bins, cc=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=2e-5)

    def loss_ref(x):
        return jnp.sum(jnp.sin(echo(x, table, n_bins, d_chunk=1024)))

    def loss_pl(x):
        return jnp.sum(jnp.sin(echo_panel_pallas(x, panel, n_bins, cc=2)))

    g_ref = jax.grad(loss_ref)(x)
    g_pl = jax.grad(loss_pl)(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("lift_cols", ["correct", "quirk"])
def test_trans_field_compact_matches_gather(rng, lift_cols):
    """Compacted-panel TransField aggregation == the XLA gather path:
    values and grads (the hand-rolled VJP folds per-panel column grads
    with a segment_sum instead of XLA's scatter-add)."""
    from fieldconv_tpu.ops.trans_field import (
        trans_field_compact_contrib, trans_field_contrib)
    from fieldconv_tpu.precomp.banded import build_compact_panel_table

    B = 1
    g, table, panel = _panel_setup(rng, compressed=True, B=B)
    compact = build_compact_panel_table(table, tb=8, ts=8)
    cols = (B, B + 1) if lift_cols == "correct" else (0, 1)
    N, C = table.n_pad, 3
    x = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)

    want_a, want_m = trans_field_contrib(x, table, lift_cols=cols)
    got_a, got_m = trans_field_compact_contrib(x, compact, lift_cols=cols,
                                               panel_chunk=3)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(x):
        a, m = trans_field_contrib(x, table, lift_cols=cols)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(m))

    def loss_cp(x):
        a, m = trans_field_compact_contrib(x, compact, lift_cols=cols,
                                           panel_chunk=3)
        return jnp.sum(jnp.sin(a)) + jnp.sum(jnp.cos(m))

    g_ref = jax.grad(loss_ref)(x)
    g_cp = jax.grad(loss_cp)(x)
    np.testing.assert_allclose(np.asarray(g_cp), np.asarray(g_ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n_bins,tb", [(2, 8), (3, 8), (2, 4)])
def test_echo_compact_matches_xla(rng, n_bins, tb):
    """The compacted-panel ECHO kernel (gathered source columns, per-panel
    disjoint backward + segment_sum fold) == the XLA gather path: values
    and grads, origin features included; tb=4 exercises the rectangular
    (target-block != column-width) layout used by the 163k TB sweep."""
    from fieldconv_tpu.ops.echo import echo
    from fieldconv_tpu.ops.pallas.echo_panel import echo_panel_pallas
    from fieldconv_tpu.precomp.banded import build_compact_panel_table

    g, table, panel = _panel_setup(rng, compressed=True, B=1, R=3)
    compact = build_compact_panel_table(table, tb=tb, ts=8)
    # compaction is real on this fixture: fewer slot-pairs than the
    # block-pair panel layout
    assert compact.sten.shape[0] * 8 * 8 \
        < panel.sten.shape[0] * panel.tb * panel.tb
    N, C = table.n_pad, 5
    z = random_field(rng, N, C)
    x = np.stack([z.real, z.imag], -1).astype(np.float32)
    x[rng.random(N) < 0.2] = 0.0
    x = jnp.asarray(x)

    want = echo(x, table, n_bins, d_chunk=1024)
    got = echo_panel_pallas(x, compact, n_bins, cc=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=2e-5)

    def loss_ref(x):
        return jnp.sum(jnp.sin(echo(x, table, n_bins, d_chunk=1024)))

    def loss_cp(x):
        return jnp.sum(jnp.sin(echo_panel_pallas(x, compact, n_bins, cc=2)))

    g_ref = jax.grad(loss_ref)(x)
    g_cp = jax.grad(loss_cp)(x)
    np.testing.assert_allclose(np.asarray(g_cp), np.asarray(g_ref),
                               atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("tb,ftype", [(8, 1), (4, 0), (8, 2)])
def test_conv_compact_matches_xla(rng, tb, ftype):
    """The compact-layout field convolution (gathered source columns,
    per-panel disjoint dG blocks folded by a segment_sum) == the XLA
    gather path: values and grads (x AND all three filter params), all
    ftypes; tb=4 exercises the rectangular (TBt != TS) layout the 163k
    TBt sweep uses."""
    from fieldconv_tpu.ops.pallas.band_conv import field_conv_compact
    from fieldconv_tpu.precomp.banded import build_compact_panel_table

    B, R = 1, 3
    g, table, panel = _panel_setup(rng, compressed=True, B=B, R=R)
    compact = build_compact_panel_table(table, tb=tb, ts=8)
    N, C, O = table.n_pad, 4, 3
    x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                              rng.normal(size=(N, C))], -1), jnp.float32)
    if ftype == 2:
        zon = jnp.asarray(rng.normal(size=(O, C, R, 2)), jnp.float32)
        sph = jnp.asarray(rng.normal(size=(O, C, R, 2 * B, 2)), jnp.float32)
    else:
        zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
        sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    want = field_conv(x, table, zon, sph, ph, ftype, d_chunk=1024)
    got = field_conv_compact(x, compact, zon, sph, ph, ftype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=2e-5)

    def loss_ref(x, zon, sph, ph):
        return jnp.sum(jnp.sin(
            field_conv(x, table, zon, sph, ph, ftype, d_chunk=1024)))

    def loss_cp(x, zon, sph, ph):
        return jnp.sum(jnp.sin(
            field_conv_compact(x, compact, zon, sph, ph, ftype)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, zon, sph, ph)
    g_cp = jax.grad(loss_cp, argnums=(0, 1, 2, 3))(x, zon, sph, ph)
    for a, b in zip(g_cp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=2e-5)


def test_panel_bf16_stencil_close(rng):
    """cast_panel_sten(bf16): conv and ECHO panel paths stay within bf16
    quantisation of the f32 results (the storage/DMA-halving knob)."""
    from fieldconv_tpu.ops.echo import echo_panel
    from fieldconv_tpu.precomp.banded import cast_panel_sten

    g, table, panel = _panel_setup(rng, compressed=True, B=1, R=3)
    panel_h = cast_panel_sten(panel)
    assert panel_h.sten.dtype == jnp.bfloat16

    N, C, O, B, R = table.n_pad, 4, 3, 1, 3
    x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                              rng.normal(size=(N, C))], -1), jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    y32 = field_conv_banded(x, panel, zon, sph, ph, 1)
    y16 = field_conv_banded(x, panel_h, zon, sph, ph, 1)
    scale = float(jnp.max(jnp.abs(y32)))
    assert float(jnp.max(jnp.abs(y16 - y32))) < 2e-2 * scale

    xe = jnp.asarray(np.stack([rng.normal(size=(N, 3)),
                               rng.normal(size=(N, 3))], -1), jnp.float32)
    h32 = echo_panel(xe, panel, 2, panel_chunk=5)
    h16 = echo_panel(xe, panel_h, 2, panel_chunk=5)
    hscale = float(jnp.max(jnp.abs(h32)))
    assert float(jnp.max(jnp.abs(h16 - h32))) < 3e-2 * hscale

    # compact layout: the same bf16 knob through cast_panel_sten
    from fieldconv_tpu.ops.pallas.echo_panel import echo_panel_pallas
    from fieldconv_tpu.precomp.banded import build_compact_panel_table

    compact = build_compact_panel_table(table, tb=8, ts=8)
    compact_h = cast_panel_sten(compact)
    assert compact_h.sten.dtype == jnp.bfloat16
    c32 = echo_panel_pallas(xe, compact, 2, cc=2)
    c16 = echo_panel_pallas(xe, compact_h, 2, cc=2)
    cscale = float(jnp.max(jnp.abs(c32)))
    assert float(jnp.max(jnp.abs(c16 - c32))) < 3e-2 * cscale


def test_panel_chunk_src_pad_without_tgt_pad(rng):
    """chunk>1 on a graph whose TARGET group counts already divide `chunk`
    but whose SOURCE group counts do not: the builder must append a zero
    panel for the by-source pads to reference (it used to assert).  Panel
    structure (tgt_blk, src_blk): (0,0),(0,1),(1,0),(1,2),(2,0),(2,1) —
    tgt counts [2,2,2], src counts [3,2,1] with chunk=2."""
    from fieldconv_tpu.precomp.banded import build_panel_table

    tb, nblk = 8, 3
    N = tb * nblk
    pairs = [(0, 0), (0, 1), (1, 0), (1, 2), (2, 0), (2, 1)]
    edges = []
    for bt, bs in pairs:
        for t_loc in range(tb):
            edges.append((bs * tb + (t_loc * 3 + bt) % tb, bt * tb + t_loc))
    edges = np.asarray(edges, np.int64)
    E = len(edges)
    B, R, eps = 1, 3, 0.5
    table = build_edge_table(
        edges, rng.uniform(0.0, 0.4, E), rng.uniform(-np.pi, np.pi, E),
        rng.uniform(0.1, 1.0, N), np.exp(1j * rng.uniform(-np.pi, np.pi, E)),
        N, B, R, eps, n_multiple=tb)
    panel = build_panel_table(table, tb=tb, compressed=True, chunk=2)
    meta = np.asarray(panel.meta)
    assert panel.n_panels % 2 == 0
    assert panel.n_panels > len(pairs)        # the appended zero group

    C, O = 4, 3
    x = jnp.asarray(np.stack([rng.normal(size=(N, C)),
                              rng.normal(size=(N, C))], -1), jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def loss(x, use_panel):
        y = (field_conv_banded(x, panel, zon, sph, ph, 1) if use_panel
             else field_conv(x, table, zon, sph, ph, 1))
        return jnp.sum(y * y), y

    (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(x, False)
    (l2, y2), g2 = jax.value_and_grad(loss, has_aux=True)(x, True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-3, atol=1e-4)
