"""Halo-exchange graph-parallel band conv: N-device == 1-device parity
(the fake multi-chip backend of SURVEY.md §4: 8 virtual CPU devices)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from test_band_conv import banded_graph, tables_for
from fieldconv_tpu.ops.pallas.band_conv import (
    band_contrib,
    rotated_source_tensor_kmajor,
)
from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded
from fieldconv_tpu.parallel.halo import halo_contrib, halo_field_conv
from fieldconv_tpu.precomp.banded import BandedTable


def shard_banded(banded: BandedTable, n_dev: int):
    """Slice per-device banded tables along the target-vertex axis."""
    outs = []
    N = banded.n_pad
    per = N // n_dev
    for d in range(n_dev):
        nb_per = per // banded.tb
        outs.append(BandedTable(
            sten_band=banded.sten_band[d * nb_per:(d + 1) * nb_per],
            tb=banded.tb, nh=banded.nh, n_pad=per,
            band_limit=banded.band_limit, n_rings=banded.n_rings,
        ))
    return outs


def test_halo_matches_single_device(rng):
    n_dev = 4
    # 16 blocks of 8 vertices over 4 devices (4 blocks each), bandwidth <= TB
    g = banded_graph(rng, n_vertices=128, tb=8, bw=7)
    table, banded = tables_for(g, tb=8)
    assert banded.nh == 1
    N, C, B = table.n_pad, 3, g["B"]
    x = jnp.asarray(rng.normal(size=(N, C, 2)), jnp.float32)
    gk = rotated_source_tensor_kmajor(x, B)

    want = band_contrib(gk, banded)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("graph",))

    def sharded_fn(gk, sten):
        local = BandedTable(
            sten_band=sten, tb=banded.tb, nh=banded.nh,
            n_pad=gk.shape[0], band_limit=banded.band_limit,
            n_rings=banded.n_rings,
        )
        return halo_contrib(gk, local, "graph")

    fn = jax.jit(jax.shard_map(
        sharded_fn,
        mesh=mesh,
        in_specs=(P("graph"), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    ))
    got = fn(gk, banded.sten_band)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_halo_gradients_match(rng):
    n_dev = 4
    g = banded_graph(rng, n_vertices=128, tb=8, bw=7)
    table, banded = tables_for(g, tb=8)
    N, C, B = table.n_pad, 3, g["B"]
    x = jnp.asarray(rng.normal(size=(N, C, 2)), jnp.float32)
    gk = rotated_source_tensor_kmajor(x, B)

    grad_ref = jax.grad(lambda gk: jnp.sum(band_contrib(gk, banded) ** 2))(gk)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("graph",))

    def sharded_loss(gk, sten):
        local = BandedTable(
            sten_band=sten, tb=banded.tb, nh=banded.nh,
            n_pad=gk.shape[0], band_limit=banded.band_limit,
            n_rings=banded.n_rings,
        )
        out = halo_contrib(gk, local, "graph")
        return jax.lax.psum(jnp.sum(out ** 2), "graph")

    def loss(gk, sten):
        per_dev = jax.shard_map(
            sharded_loss, mesh=mesh,
            in_specs=(P("graph"), P("graph")),
            out_specs=P(),
            check_vma=False,
        )(gk, sten)
        return per_dev

    grad_sharded = jax.jit(jax.grad(loss))(
        gk, banded.sten_band
    )
    np.testing.assert_allclose(
        np.asarray(grad_sharded), np.asarray(grad_ref), atol=5e-4, rtol=1e-3
    )


def test_halo_overlap_matches_serial(rng):
    """Overlapped (interior/boundary split) halo conv == serial halo conv,
    values and grads, over 4 devices."""
    n_dev = 4
    g = banded_graph(rng, n_vertices=96, tb=8, bw=7)
    table, banded = tables_for(g, tb=8)
    N, C, O, B, R = table.n_pad, 3, 5, g["B"], g["R"]
    x = jnp.asarray(rng.normal(size=(N, C, 2)), jnp.float32)
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("graph",))

    def make(overlap):
        def sharded_fn(x, zr, sph, ph, sten):
            local = BandedTable(
                sten_band=sten, tb=banded.tb, nh=banded.nh,
                n_pad=x.shape[0], band_limit=banded.band_limit,
                n_rings=banded.n_rings,
            )
            gk = rotated_source_tensor_kmajor(x, banded.band_limit)
            return halo_field_conv(gk, local, zr, sph, ph, 1, "graph",
                                   overlap=overlap)

        return jax.shard_map(
            sharded_fn, mesh=mesh,
            in_specs=(P("graph"), P(), P(), P(), P("graph")),
            out_specs=P("graph"),
            check_vma=False,
        )

    f_ser, f_ovl = make(False), make(True)
    y_ser = jax.jit(f_ser)(x, zr, sph, ph, banded.sten_band)
    y_ovl = jax.jit(f_ovl)(x, zr, sph, ph, banded.sten_band)
    np.testing.assert_allclose(np.asarray(y_ovl), np.asarray(y_ser),
                               atol=1e-6)

    def loss(f):
        def l(x, zr, sph, ph):
            y = f(x, zr, sph, ph, banded.sten_band)
            return jnp.sum(y ** 2 + y)
        return l

    g_ser = jax.jit(jax.grad(loss(f_ser), argnums=(0, 1, 2, 3)))(
        x, zr, sph, ph)
    g_ovl = jax.jit(jax.grad(loss(f_ovl), argnums=(0, 1, 2, 3)))(
        x, zr, sph, ph)
    for a, b in zip(g_ovl, g_ser):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_halo_fused_conv_matches_single_device(rng):
    """Fused sharded full conv (values + grads wrt x and all filter params)
    == single-device fused path."""
    n_dev = 4
    g = banded_graph(rng, n_vertices=128, tb=8, bw=7)
    table, banded = tables_for(g, tb=8)
    N, C, O, B, R = table.n_pad, 3, 5, g["B"], g["R"]
    x = jnp.asarray(rng.normal(size=(N, C, 2)), jnp.float32)
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def ref_loss(x, zr, sph, ph):
        y = field_conv_banded(x, banded, zr, sph, ph, 1, fuse_filters=True)
        return jnp.sum(y ** 2 + y)

    want_y = field_conv_banded(x, banded, zr, sph, ph, 1, fuse_filters=True)
    want_g = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(x, zr, sph, ph)

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("graph",))

    def sharded_fn(x, zr, sph, ph, sten):
        local = BandedTable(
            sten_band=sten, tb=banded.tb, nh=banded.nh,
            n_pad=x.shape[0], band_limit=banded.band_limit,
            n_rings=banded.n_rings,
        )
        gk = rotated_source_tensor_kmajor(x, banded.band_limit)
        return halo_field_conv(gk, local, zr, sph, ph, 1, "graph")

    smap = jax.shard_map(
        sharded_fn, mesh=mesh,
        in_specs=(P("graph"), P(), P(), P(), P("graph")),
        out_specs=P("graph"),
        check_vma=False,
    )
    got_y = jax.jit(smap)(x, zr, sph, ph, banded.sten_band)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=2e-5)

    def sharded_loss(x, zr, sph, ph):
        y = smap(x, zr, sph, ph, banded.sten_band)
        return jnp.sum(y ** 2 + y)

    got_g = jax.jit(jax.grad(sharded_loss, argnums=(0, 1, 2, 3)))(
        x, zr, sph, ph)
    for a, b in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
