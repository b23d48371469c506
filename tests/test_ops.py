"""Parity tests: TPU padded-CSR ops vs the numpy golden reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import random_graph, random_field
import ref_numpy as ref

from fieldconv_tpu.precomp.stencil import build_edge_table, dense_stencil
from fieldconv_tpu.ops.field_conv import (
    field_conv,
    field_conv_contrib,
    filter_coefficients,
    apply_filters,
)
from fieldconv_tpu.ops.trans_field import trans_field
from fieldconv_tpu.ops.tangent import tangent_lin
from fieldconv_tpu.ops import echo as echo_mod
from fieldconv_tpu.utils import complexops as co


def make_table(g, **kw):
    return build_edge_table(
        g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"],
        g["n_vertices"], g["B"], g["R"], g["epsilon"], **kw,
    )


def ref_precomp(g):
    return ref.fc_precomp(
        g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"],
        g["B"], g["R"], g["epsilon"], g["n_vertices"],
    )


def planar(zc):
    return jnp.asarray(np.stack([zc.real, zc.imag], axis=-1), dtype=jnp.float32)


def pad_rows(a, n_pad):
    """Zero-pad the vertex axis to the table's padded size."""
    pad = [(0, n_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.asarray(np.pad(np.asarray(a), pad))


def test_stencil_matches_reference(rng):
    g = random_graph(rng)
    edges, sten, ln, wxp = ref_precomp(g)
    table = make_table(g)

    # Pack the reference ragged stencil into the same padded layout and compare.
    got = dense_stencil(table)  # (N, D, R, K) complex
    want = np.zeros_like(got)
    fill = np.zeros(g["n_vertices"], dtype=int)
    ln_pad = np.zeros(got.shape[:2], dtype=np.complex128)
    wxp_pad = np.zeros(got.shape[:2], dtype=np.complex128)
    src_pad = -np.ones(got.shape[:2], dtype=int)
    for e in range(len(edges)):
        j, i = edges[e]
        s = fill[i]; fill[i] += 1
        want[i, s] = sten[e]
        ln_pad[i, s] = ln[e]
        wxp_pad[i, s] = wxp[e]
        src_pad[i, s] = j

    np.testing.assert_allclose(got, want, atol=1e-6)
    tl = np.asarray(table.ln[..., 0]) + 1j * np.asarray(table.ln[..., 1])
    tw = np.asarray(table.wxp[..., 0]) + 1j * np.asarray(table.wxp[..., 1])
    np.testing.assert_allclose(tl, ln_pad, atol=1e-6)
    np.testing.assert_allclose(tw, wxp_pad, atol=1e-6)
    # sources agree on valid slots
    m = np.asarray(table.mask) > 0
    np.testing.assert_array_equal(np.asarray(table.src)[m], src_pad[m])


@pytest.mark.parametrize("ftype", [0, 1, 2])
@pytest.mark.parametrize("d_chunk", [8, 1024])
def test_field_conv(rng, ftype, d_chunk):
    g = random_graph(rng)
    N, C, O, B, R = g["n_vertices"], 5, 4, g["B"], g["R"]
    x = random_field(rng, N, C)
    zr = rng.normal(size=(O, C, R)) * 0.3
    sph = rng.normal(size=(O, C, R, B, 2)) * 0.3
    phase = rng.normal(size=(O, C, B + 1)) * 0.3
    if ftype == 2:
        zr = rng.normal(size=(O, C, R, 2)) * 0.3
        sph = rng.normal(size=(O, C, R, 2 * B, 2)) * 0.3

    edges, sten, _, _ = ref_precomp(g)
    want = ref.field_conv(x, edges, sten, zr, sph, phase, ftype, B, N)

    table = make_table(g)
    y = field_conv(
        pad_rows(planar(x), table.n_pad), table,
        jnp.asarray(zr, jnp.float32), jnp.asarray(sph, jnp.float32),
        jnp.asarray(phase, jnp.float32), ftype, d_chunk=d_chunk,
    )
    got = np.asarray(y[..., 0] + 1j * y[..., 1])[: N]
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("ftype", [0, 1])
@pytest.mark.parametrize("lift_cols", [(0, 1), None])
def test_trans_field(rng, ftype, lift_cols):
    g = random_graph(rng)
    N, C, O, B, R = g["n_vertices"], 3, 4, g["B"], g["R"]
    if lift_cols is None:
        lift_cols = (B, B + 1)  # correct frequency-(0,+1) columns
    x = rng.normal(size=(N, C))
    za = rng.normal(size=(O, C, R)) * 0.4
    zm = rng.normal(size=(O, C, R)) * 0.4
    phase = rng.normal(size=(O, C)) * 0.4

    edges, sten, _, _ = ref_precomp(g)
    lift_sten = sten[:, :, list(lift_cols)]
    want = ref.trans_field(x, edges, lift_sten, za, zm, phase, ftype, N)

    table = make_table(g)
    y = trans_field(
        pad_rows(jnp.asarray(x, jnp.float32), table.n_pad), table,
        jnp.asarray(za, jnp.float32), jnp.asarray(zm, jnp.float32),
        jnp.asarray(phase, jnp.float32), ftype, lift_cols=lift_cols, d_chunk=8,
    )
    got = np.asarray(y[..., 0] + 1j * y[..., 1])[: N]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tangent_lin(rng):
    x = random_field(rng, 17, 6)
    wr = rng.normal(size=(4, 6))
    wi = rng.normal(size=(4, 6))
    want = ref.tangent_lin(x, wr, wi)
    y = tangent_lin(planar(x), jnp.asarray(wr, jnp.float32), jnp.asarray(wi, jnp.float32))
    got = np.asarray(y[..., 0] + 1j * y[..., 1])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_modrelu(rng):
    x = random_field(rng, 23, 5)
    b = rng.normal(size=5) * 0.5
    want = ref.modrelu(x, b)
    y = co.modrelu(planar(x), jnp.asarray(b, jnp.float32))
    got = np.asarray(y[..., 0] + 1j * y[..., 1])
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n_bins", [2, 3])
@pytest.mark.parametrize("d_chunk", [8, 1024])
def test_echo(rng, n_bins, d_chunk):
    g = random_graph(rng)
    N = g["n_vertices"]
    C = 3
    x = random_field(rng, N, C)
    edges, sten, ln, wxp = ref_precomp(g)
    want = ref.echo(x, edges, ln, wxp, n_bins, N)

    table = make_table(g)
    got = np.asarray(
        echo_mod.echo(pad_rows(planar(x), table.n_pad), table, n_bins, d_chunk=d_chunk)
    )[:N]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_soft_math_matches(rng):
    z = random_field(rng, 50, 4)
    zp = planar(z)
    np.testing.assert_allclose(np.asarray(co.soft_abs(zp)), ref.soft_abs(z), atol=1e-6)
    np.testing.assert_allclose(np.asarray(co.soft_angle(zp)), ref.soft_angle(z), atol=1e-6)


def test_soft_grads_finite(rng):
    """Gradients must be finite at exact zeros (SURVEY.md §7.4)."""
    z = planar(random_field(rng, 11, 3, zero_frac=0.5))

    for fn in [
        lambda a: jnp.sum(co.soft_abs(a)),
        lambda a: jnp.sum(co.soft_angle(a)),
        lambda a: jnp.sum(co.modrelu(a, jnp.ones(3) * 0.1) ** 2),
        lambda a: jnp.sum(co.soft_unit(a)),
    ]:
        gr = jax.grad(fn)(z)
        assert np.all(np.isfinite(np.asarray(gr))), fn


def test_field_conv_grads_finite(rng):
    g = random_graph(rng, n_vertices=16, avg_deg=4)
    N, C, O, B, R = g["n_vertices"], 3, 2, g["B"], g["R"]
    table = make_table(g)
    x = pad_rows(planar(random_field(rng, N, C, zero_frac=0.4)), table.n_pad)
    zr = jnp.asarray(rng.normal(size=(O, C, R)), jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)), jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)), jnp.float32)

    def loss(x, zr, sph, ph):
        y = field_conv(x, table, zr, sph, ph, 1)
        return jnp.sum(co.soft_abs(y))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, zr, sph, ph)
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))
