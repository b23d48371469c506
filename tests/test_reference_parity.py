"""Golden parity against the ACTUAL reference implementation (torch, CPU).

Imports the reference modules read-only from /root/reference at test time
(torch_scatter is absent in this image, so a faithful shim built on
``torch.index_add_`` is installed first), runs them in their native float32
on random ragged graphs, and asserts:

  * the numpy golden (`ref_numpy`) matches the live torch reference —
    test_ops.py already pins the JAX ops to `ref_numpy`, closing the chain
    torch-reference == numpy-golden == TPU-ops;
  * torch block state_dicts round-trip through utils/port_weights into the
    flax modules with matching activations (module-assembly parity).

No reference code is copied; the reference package is executed in place.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import random_graph, random_field
import ref_numpy as refnp

from fieldconv_tpu.nn import losses as our_losses
from fieldconv_tpu.nn import modules as our_nn
from fieldconv_tpu.precomp.stencil import build_edge_table
from fieldconv_tpu.utils.port_weights import torch_state_dict_to_flax

REF_PATH = "/root/reference"


# --- torch_scatter / torch_geometric shims ---------------------------------

def _scatter_add(src, index, dim=-1, out=None, dim_size=None):
    """torch_scatter.scatter_add semantics for the reference's call sites:
    1-D `index` of length src.shape[dim] (field_conv.py:134, echo.py:144-147,
    fc_precomp.py:87)."""
    if src.dim() == 0:
        raise ValueError("scalar src unsupported")
    d = dim % src.dim()
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if index.numel() else 0
    size = list(src.shape)
    size[d] = dim_size
    base = torch.zeros(size, dtype=src.dtype, device=src.device) if out is None else out
    return base.index_add_(d, index, src)


def _degree(index, num_nodes=None, dtype=None):
    n = int(num_nodes) if num_nodes is not None else int(index.max().item()) + 1
    out = torch.zeros(n, dtype=dtype if dtype is not None else torch.long)
    return out.index_add_(0, index, torch.ones(index.numel(), dtype=out.dtype))


def _scatter_min(src, index, dim=-1, out=None, dim_size=None):
    d = dim % src.dim()
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if index.numel() else 0
    size = list(src.shape)
    size[d] = dim_size
    base = torch.full(size, torch.inf, dtype=src.dtype) if out is None else out
    vals = base.index_reduce_(d, index, src, "amin", include_self=True)
    arg = torch.zeros(size, dtype=torch.long)
    return vals, arg  # argmin unused by the reference paths we exercise


def _pyg_zeros(t):
    if t is not None:
        with torch.no_grad():
            t.fill_(0.0)


def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []  # mark as package so submodule imports resolve
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def _install_shims():
    _mod("torch_scatter", scatter_add=_scatter_add, scatter_min=_scatter_min)
    tg = _mod("torch_geometric")
    tg.utils = _mod("torch_geometric.utils", degree=_degree)
    tg.nn = _mod("torch_geometric.nn")
    tg.nn.inits = _mod("torch_geometric.nn.inits", zeros=_pyg_zeros)
    tg.data = _mod("torch_geometric.data", Data=types.SimpleNamespace)


@pytest.fixture(scope="module")
def ref():
    _install_shims()
    sys.path.insert(0, REF_PATH)
    try:
        import nn as ref_nn  # /root/reference/nn
        import utils.field as ref_field  # /root/reference/utils/field.py

        # transforms/__init__ drags in torch_sparse + fcutils; load the one
        # module we need straight from its file instead.
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_fc_precomp", f"{REF_PATH}/transforms/fc_precomp.py")
        fcp = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fcp)

        yield types.SimpleNamespace(
            nn=ref_nn, field=ref_field, FCPrecomp=fcp.FCPrecomp)
    finally:
        sys.path.remove(REF_PATH)


# --- helpers ---------------------------------------------------------------

def tc(z):
    """cfloat torch tensor (the reference hard-codes float32 internally,
    e.g. fc_precomp.py:20 `.float()`)."""
    return torch.tensor(np.asarray(z), dtype=torch.complex64)


def tf64(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def ref_precomp_torch(ref, g):
    data = types.SimpleNamespace(
        logMag=tf64(g["log_mag"]),
        logAng=tf64(g["log_ang"]),
        w=tf64(g["w"][:, None]),
        supp_edges=torch.tensor(g["edges"], dtype=torch.long),
        xp=tc(g["xp"]),
    )
    pre = ref.FCPrecomp(g["B"], g["R"], g["epsilon"])
    edges, sten, ln, wxp = pre(data)
    return (edges.numpy(), sten.numpy(), ln.numpy(), wxp.numpy())


def set_params(mod, rng, scale=0.5):
    """Overwrite every parameter of a (double()'d) torch module with fixed
    random values; returns the module."""
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.tensor(rng.normal(size=tuple(p.shape)) * scale,
                                 dtype=p.dtype))
    return mod


# --- soft math -------------------------------------------------------------

def test_soft_math_vs_reference(ref, rng):
    z = random_field(rng, 40, 3, zero_frac=0.3)
    zt = tc(z)
    np.testing.assert_allclose(
        ref.field.softAbs(zt).numpy(), refnp.soft_abs(z), atol=1e-6)
    np.testing.assert_allclose(
        ref.field.softAngle(zt).numpy(), refnp.soft_angle(z), atol=1e-6)
    np.testing.assert_array_equal(
        ref.field.isOrigin(zt).numpy(), refnp.is_origin(z))


# --- FCPrecomp -------------------------------------------------------------

def test_fc_precomp_vs_reference(ref, rng):
    g = random_graph(rng)
    edges_t, sten_t, ln_t, wxp_t = ref_precomp_torch(ref, g)
    edges_n, sten_n, ln_n, wxp_n = refnp.fc_precomp(
        g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"],
        g["B"], g["R"], g["epsilon"], g["n_vertices"],
    )
    np.testing.assert_array_equal(edges_t, edges_n)
    np.testing.assert_allclose(sten_t, sten_n, atol=1e-6)
    np.testing.assert_allclose(ln_t, ln_n, atol=1e-6)
    np.testing.assert_allclose(wxp_t, wxp_n, atol=1e-6)


# --- FieldConv -------------------------------------------------------------

@pytest.mark.parametrize("ftype", [0, 1, 2])
def test_field_conv_vs_reference(ref, rng, ftype):
    g = random_graph(rng)
    N, C, O, B, R = g["n_vertices"], 5, 4, g["B"], g["R"]
    x = random_field(rng, N, C, zero_frac=0.2)

    conv = ref.nn.FieldConv(C, O, band_limit=B, n_rings=R, ftype=ftype)
    set_params(conv, rng)
    edges, sten, _, _ = ref_precomp_torch(ref, g)
    want = conv(tc(x), torch.tensor(edges), tc(sten)).detach().numpy()

    zonal = conv.zonal.detach().numpy()
    sph = conv.spherical.detach().numpy()
    phase = conv.phase.detach().numpy()
    got = refnp.field_conv(x, edges, sten, zonal, sph, phase, ftype, B, N)
    np.testing.assert_allclose(got, want, atol=5e-5)


# --- TransField ------------------------------------------------------------

@pytest.mark.parametrize("ftype", [0, 1])
def test_trans_field_vs_reference(ref, rng, ftype):
    g = random_graph(rng)
    N, C, O, R = g["n_vertices"], 3, 4, g["R"]
    x = rng.normal(size=(N, C))

    tfm = ref.nn.TransField(C, O, n_rings=R, ftype=ftype)
    set_params(tfm, rng)
    edges, sten, _, _ = ref_precomp_torch(ref, g)
    lift_sten = sten[:, :, :2]  # any 2 columns; reference slices upstream
    want = tfm(tf64(x), torch.tensor(edges), tc(lift_sten)).detach().numpy()

    got = refnp.trans_field(
        x, edges, lift_sten,
        tfm.zonalAng.detach().numpy(), tfm.zonalMag.detach().numpy(),
        tfm.phase.detach().numpy(), ftype, N,
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


# --- TangentLin / TangentNonLin -------------------------------------------

def test_tangent_lin_nonlin_vs_reference(ref, rng):
    x = random_field(rng, 19, 6, zero_frac=0.3)
    lin = ref.nn.TangentLin(6, 4)
    set_params(lin, rng)
    want = lin(tc(x)).detach().numpy()
    got = refnp.tangent_lin(x, lin.Re.detach().numpy(), lin.Im.detach().numpy())
    np.testing.assert_allclose(got, want, atol=1e-6)

    nl = ref.nn.TangentNonLin(6)
    set_params(nl, rng, scale=0.3)
    want = nl(tc(x)).detach().numpy()
    got = refnp.modrelu(x, nl.bias.detach().numpy()[0])
    np.testing.assert_allclose(got, want, atol=1e-6)


# --- ECHO ------------------------------------------------------------------

@pytest.mark.parametrize("n_bins", [2, 3])
def test_echo_vs_reference(ref, rng, n_bins):
    g = random_graph(rng, n_vertices=25, avg_deg=6)
    N, C = g["n_vertices"], 3
    x = random_field(rng, N, C, zero_frac=0.25)
    edges, sten, ln, wxp = ref_precomp_torch(ref, g)

    echo = ref.nn.ECHO(C, n_bins=n_bins)
    want = echo(tc(x), torch.tensor(edges), tc(ln), tc(wxp)).detach().numpy()
    got = refnp.echo(x, edges, ln, wxp, n_bins, N)
    np.testing.assert_allclose(got, want, atol=5e-5)


# --- losses ----------------------------------------------------------------

def test_label_smoothing_vs_reference(ref, rng):
    logits = rng.normal(size=(13, 7))
    labels = rng.integers(0, 7, size=13)
    weight = rng.uniform(0.5, 1.5, size=7)
    for smoothing, w in [(0.0, None), (0.2, None), (0.2, weight)]:
        mod = ref.nn.LabelSmoothingLoss(
            7, smoothing=smoothing,
            weight=None if w is None else tf64(w))
        want = mod(tf64(logits), torch.tensor(labels)).item()
        got = our_losses.label_smoothing_loss(
            jnp.asarray(logits, jnp.float32), jnp.asarray(labels), 7,
            smoothing=smoothing,
            weight=None if w is None else jnp.asarray(w, jnp.float32))
        np.testing.assert_allclose(float(got), want, atol=1e-5)


def test_twin_eval_vs_reference(ref, rng):
    xs = rng.normal(size=(30, 8))
    xt = rng.normal(size=(30, 8)) * 0.6
    p = rng.integers(0, 30, size=(12, 2))
    n = rng.integers(0, 30, size=(20, 2))
    mod = ref.nn.TwinEval(mu=5, ratio=0.5)
    want_fn, want_fp = mod(tf64(xs), tf64(xt), torch.tensor(p), torch.tensor(n))
    got_fn, got_fp = our_losses.twin_eval(
        jnp.asarray(xs, jnp.float32), jnp.asarray(xt, jnp.float32),
        jnp.asarray(p), jnp.asarray(n))
    assert (int(got_fn), int(got_fp)) == (want_fn, want_fp)


def test_twin_loss_vs_reference(ref, rng, monkeypatch):
    xs = rng.normal(size=(30, 8))
    xt = rng.normal(size=(30, 8))
    p = rng.integers(0, 30, size=(12, 2))
    n = rng.integers(0, 30, size=(20, 2))

    key = jax.random.key(3)
    got = float(our_losses.twin_loss(
        key, jnp.asarray(xs, jnp.float32), jnp.asarray(xt, jnp.float32),
        jnp.asarray(p), jnp.asarray(n), mu=5.0))

    # Feed the reference the exact uniforms our implementation drew.
    yn_unit = np.asarray(jax.random.uniform(key, (n.shape[0],)), np.float64)
    monkeypatch.setattr(
        torch, "rand",
        lambda *a, **k: torch.tensor(yn_unit, dtype=torch.float32))
    mod = ref.nn.TwinLoss(mu=5)
    want = mod(tf64(xs), tf64(xt), torch.tensor(p), torch.tensor(n)).item()
    np.testing.assert_allclose(got, want, rtol=2e-5)


# --- full blocks: torch state_dict -> flax, matching activations -----------

def make_table(g):
    return build_edge_table(
        g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"],
        g["n_vertices"], g["B"], g["R"], g["epsilon"],
    )


def planar_pad(z, n_pad):
    p = np.zeros((n_pad,) + z.shape[1:] + (2,), np.float32)
    p[: z.shape[0], ..., 0] = z.real
    p[: z.shape[0], ..., 1] = z.imag
    return jnp.asarray(p)


def _state64(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("frontload", [False, True])
def test_fc_resnet_block_port(ref, rng, frontload):
    g = random_graph(rng)
    N, CI, CO, B, R = g["n_vertices"], 3, 5, g["B"], g["R"]
    x = random_field(rng, N, CI, zero_frac=0.2)

    blk = ref.nn.FCResNetBlock(
        CI, CO, band_limit=B, n_rings=R, ftype=1, frontload=frontload)
    set_params(blk, rng, scale=0.4)
    edges, sten, _, _ = ref_precomp_torch(ref, g)
    want = blk(tc(x), torch.tensor(edges), tc(sten)).detach().numpy()

    table = make_table(g)
    ours = our_nn.FCResNetBlock(CI, CO, band_limit=B, n_rings=R, ftype=1,
                                frontload=frontload)
    xin = planar_pad(x, table.n_pad)
    template = ours.init(jax.random.key(0), xin, table)
    params = torch_state_dict_to_flax(_state64(blk), template)
    y = ours.apply(params, xin, table)
    got = np.asarray(y[..., 0] + 1j * y[..., 1])[:N]
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_lift_block_port(ref, rng):
    g = random_graph(rng)
    N, CI, CO, B, R = g["n_vertices"], 3, 6, g["B"], g["R"]
    x = rng.normal(size=(N, CI))

    blk = ref.nn.LiftBlock(CI, CO, n_rings=R, ftype=1)
    set_params(blk, rng, scale=0.4)
    edges, sten, _, _ = ref_precomp_torch(ref, g)
    # correct frequency-(0,+1) slice (README.md:214)
    lift_sten = sten[:, :, [B, B + 1]]
    want = blk(tf64(x), torch.tensor(edges), tc(lift_sten)).detach().numpy()

    table = make_table(g)
    ours = our_nn.LiftBlock(CI, CO, n_rings=R, ftype=1)
    xin = jnp.asarray(
        np.pad(x, [(0, table.n_pad - N), (0, 0)]).astype(np.float32))
    template = ours.init(jax.random.key(0), xin, table, (B, B + 1))
    params = torch_state_dict_to_flax(_state64(blk), template)
    y = ours.apply(params, xin, table, (B, B + 1))
    got = np.asarray(y[..., 0] + 1j * y[..., 1])[:N]
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_echo_block_port(ref, rng):
    g = random_graph(rng, n_vertices=25, avg_deg=6)
    N, C, B, R = g["n_vertices"], 4, g["B"], g["R"]
    n_bins, n_out = 2, 5
    x = random_field(rng, N, C, zero_frac=0.2)

    blk = ref.nn.ECHOBlock(
        C, n_out, band_limit=B, n_rings=R, n_bins=n_bins, ftype=1)
    set_params(blk, rng, scale=0.3)
    edges, sten, ln, wxp = ref_precomp_torch(ref, g)
    want = blk(tc(x), torch.tensor(edges), tc(sten), tc(ln),
               tc(wxp)).detach().numpy()

    table = make_table(g)
    ours = our_nn.ECHOBlock(C, n_out, n_bins=n_bins, band_limit=B, n_rings=R,
                            ftype=1)
    xin = planar_pad(x, table.n_pad)
    template = ours.init(jax.random.key(0), xin, table)
    params = torch_state_dict_to_flax(_state64(blk), template)
    got = np.asarray(ours.apply(params, xin, table))[:N]
    np.testing.assert_allclose(got, want, atol=3e-4)
