"""Pallas TPU kernel: panel-CSR ECHO rasterisation — the 100k hot op.

The XLA echo_panel (ops/echo.py) measured 5.45 s fwd+bwd at the 163k
correspondence config — 72% of the full-model step.  Its intermediates
carry the channel (C=12) or polarisation (2) axis minor, which the TPU
tiles to 128 lanes (10-25x padding), and every scan step round-trips
them through HBM.  This kernel runs the whole splat in VMEM with
CHANNEL-MAJOR (C, TB_t, TB_s) tensors — the minor axis is always the
128-slot panel axis, so tiling is exact — on the panel grid of
precomp.banded.PanelTable (one (tgt-block, src-block) stencil panel per
grid step, histogram accumulated across each target's panel run, exactly
like band_conv._band_panel).

Grid-cell loop structure per ops/pallas/echo_band.py's r4 restructure:
the output layout (nb, 2·w², C, TB) puts the cell index q on a leading
dynamically-indexable axis, so one lax.fori_loop body serves all w²
cells.  Backward: the by-source panel ordering (meta_s) accumulates each
SOURCE block's dx in scratch and writes it once — no scatter.  Gradients
flow through the votes and the bilinear weights; the cell masks and
floor/ceil corners are piecewise-constant (zero gradient), matching
XLA's autodiff of the int casts (parity: tests/test_band_conv.py::
test_echo_panel_pallas_matches_xla).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.complexops import EPS, soft_abs
from ..echo import disk_map
from .band_conv import _compiler_params, _interpret


def _chunk_cols(C, cc):
    return [(c0, min(c0 + cc, C)) for c0 in range(0, C, cc)]


def _panel_tensors(sten_ref, x_ref, C, c0, c1, nbins):
    """Per-(panel, channel-chunk) forward tensors, channel-major.

    sten_ref: (1, 5, TB, TB) compressed panel; x_ref: (2C, TB) planar
    source rows (re rows then im rows).  All (CC, TB_t, TB_s) tensors
    keep the source-slot axis minor (exact 128-lane tiling)."""
    f32 = jnp.float32
    rv = sten_ref[0, 0].astype(f32)                  # (TBt, TBs)
    ln_re = rv * sten_ref[0, 1].astype(f32)
    ln_im = rv * sten_ref[0, 2].astype(f32)
    wre = sten_ref[0, 3].astype(f32)
    wim = sten_ref[0, 4].astype(f32)

    xre = x_ref[c0:c1, :]                            # (CC, TBs)
    xim = x_ref[C + c0:C + c1, :]
    nz = jnp.logical_or(jnp.abs(xre) >= EPS, jnp.abs(xim) >= EPS)
    nzf = nz.astype(jnp.float32)
    r2 = xre * xre + xim * xim
    inv_r = jax.lax.rsqrt(jnp.where(nz, r2, 1.0))
    uR = xre * inv_r * nzf                           # unit(x) components
    uI = xim * inv_r * nzf

    # aligned = ln · conj(unit(x)); p = nbins·aligned; p*[c, t, s]
    p1 = nbins * (ln_re[None] * uR[:, None, :] + ln_im[None] * uI[:, None, :])
    p2 = nbins * (-ln_re[None] * uI[:, None, :] + ln_im[None] * uR[:, None, :])
    fnb = float(nbins)
    pC1 = jnp.clip(jnp.ceil(p1), -fnb, fnb)
    pF1 = jnp.clip(jnp.floor(p1), -fnb, fnb)
    pC2 = jnp.clip(jnp.ceil(p2), -fnb, fnb)
    pF2 = jnp.clip(jnp.floor(p2), -fnb, fnb)
    w0 = (pC1 - p1) * (pC2 - p2)
    w1 = (p1 - pF1) * (p2 - pF2)
    w2 = (p1 - pF1) * (pC2 - p2)
    w3 = (pC1 - p1) * (p2 - pF2)

    v_re = (xre[:, None, :] * wre[None] - xim[:, None, :] * wim[None]) \
        * nzf[:, None, :]
    v_im = (xre[:, None, :] * wim[None] + xim[:, None, :] * wre[None]) \
        * nzf[:, None, :]

    return dict(ln_re=ln_re, ln_im=ln_im, wre=wre, wim=wim,
                xre=xre, xim=xim, nzf=nzf, inv_r=inv_r, uR=uR, uI=uI,
                p1=p1, p2=p2, pC1=pC1, pF1=pF1, pC2=pC2, pF2=pF2,
                w0=w0, w1=w1, w2=w2, w3=w3, v_re=v_re, v_im=v_im)


def _b_factors(t, nbins, w):
    """Per-b hoisted mask products: QF_b = w0·BF_b + w3·BC_b and
    QC_b = w2·BF_b + w1·BC_b, so each cell (a, b) only needs
    W = AF_a·QF_b + AC_a·QC_b — ~2× fewer VPU passes than rebuilding the
    four masks per cell.  Returned as python lists (the b loop stays
    STATICALLY unrolled inside the a-fori body: no dynamic value
    indexing)."""
    qf, qc = [], []
    for b_i in range(w):
        vb = float(b_i - nbins)
        BF = (t["pF2"] == vb).astype(jnp.float32)
        BC = (t["pC2"] == vb).astype(jnp.float32)
        qf.append(t["w0"] * BF + t["w3"] * BC)
        qc.append(t["w2"] * BF + t["w1"] * BC)
    return qf, qc


def _a_masks(t, a, nbins):
    """AF/AC for row a of the grid (a traced: one body serves all rows)."""
    va = (a - nbins).astype(jnp.float32)
    AF = (t["pF1"] == va).astype(jnp.float32)
    AC = (t["pC1"] == va).astype(jnp.float32)
    return AF, AC


def _fwd_kernel(meta_ref, x_ref, sten_ref, out_ref, *, TB, C, nbins, cc):
    p = pl.program_id(0)
    w = 2 * nbins + 1
    first = meta_ref[2, p] == 1
    for c0, c1 in _chunk_cols(C, cc):
        t = _panel_tensors(sten_ref, x_ref, C, c0, c1, nbins)
        qf, qc = _b_factors(t, nbins, w)

        def row(a, _):
            AF, AC = _a_masks(t, a, nbins)
            for b_i in range(w):
                W = AF * qf[b_i] + AC * qc[b_i]
                se = jnp.sum(W * t["v_re"], axis=2)      # (CC, TBt)
                si = jnp.sum(W * t["v_im"], axis=2)
                q = a * w + b_i

                @pl.when(first)
                def _(se=se, si=si, q=q):
                    out_ref[0, q, c0:c1, :] = se
                    out_ref[0, w * w + q, c0:c1, :] = si

                @pl.when(jnp.logical_not(first))
                def _(se=se, si=si, q=q):
                    out_ref[0, q, c0:c1, :] += se
                    out_ref[0, w * w + q, c0:c1, :] += si

            return 0

        jax.lax.fori_loop(0, w, row, 0)


def _bwd_kernel(meta_s_ref, dg_ref, x_ref, sten_ref, dx_ref, dx_acc,
                *, TB, C, nbins, cc):
    p = pl.program_id(0)
    w = 2 * nbins + 1
    nbf = float(nbins)
    flags = meta_s_ref[3, p]                 # first_s + 2·last_s

    @pl.when(flags % 2 == 1)
    def _():
        dx_acc[:] = jnp.zeros_like(dx_acc)

    for c0, c1 in _chunk_cols(C, cc):
        t = _panel_tensors(sten_ref, x_ref, C, c0, c1, nbins)

        qf, qc = _b_factors(t, nbins, w)
        zero = jnp.zeros_like(t["v_re"])

        def row(a, carry):
            dv_re, dv_im = carry[0], carry[1]
            dqf = list(carry[2])
            dqc = list(carry[3])
            AF, AC = _a_masks(t, a, nbins)
            for b_i in range(w):
                W = AF * qf[b_i] + AC * qc[b_i]
                q = a * w + b_i
                dgr = dg_ref[0, q, c0:c1, :][:, :, None]     # (CC, TBt, 1)
                dgi = dg_ref[0, w * w + q, c0:c1, :][:, :, None]
                dv_re = dv_re + W * dgr
                dv_im = dv_im + W * dgi
                dW = t["v_re"] * dgr + t["v_im"] * dgi
                dqf[b_i] = dqf[b_i] + AF * dW
                dqc[b_i] = dqc[b_i] + AC * dW
            return (dv_re, dv_im, tuple(dqf), tuple(dqc))

        dv_re, dv_im, dqf, dqc = jax.lax.fori_loop(
            0, w, row,
            (zero, zero, tuple(zero for _ in range(w)),
             tuple(zero for _ in range(w))))

        # QF_b = w0·BF_b + w3·BC_b, QC_b = w2·BF_b + w1·BC_b -> dw0..dw3
        dw0 = dw1 = dw2 = dw3 = zero
        for b_i in range(w):
            vb = float(b_i - nbins)
            BF = (t["pF2"] == vb).astype(jnp.float32)
            BC = (t["pC2"] == vb).astype(jnp.float32)
            dw0 = dw0 + BF * dqf[b_i]
            dw3 = dw3 + BC * dqf[b_i]
            dw2 = dw2 + BF * dqc[b_i]
            dw1 = dw1 + BC * dqc[b_i]

        e1C = t["pC1"] - t["p1"]
        e1F = t["p1"] - t["pF1"]
        e2C = t["pC2"] - t["p2"]
        e2F = t["p2"] - t["pF2"]
        dp1 = -dw0 * e2C + dw1 * e2F + dw2 * e2C - dw3 * e2F
        dp2 = -dw0 * e1C + dw1 * e1F - dw2 * e1F + dw3 * e1C
        da_re = nbf * dp1
        da_im = nbf * dp2
        # aligned = ln·(uR, -uI): sum over the TARGET (sublane) axis
        lr, li = t["ln_re"][None], t["ln_im"][None]
        duR = jnp.sum(da_re * lr + da_im * li, axis=1)       # (CC, TBs)
        duI = -jnp.sum(-da_re * li + da_im * lr, axis=1)
        # unit(x) = x/|x|: symmetric Jacobian (I - ûûᵀ)/r, 0 at origin
        dot = t["uR"] * duR + t["uI"] * duI
        dx_re_u = (duR - t["uR"] * dot) * t["inv_r"] * t["nzf"]
        dx_im_u = (duI - t["uI"] * dot) * t["inv_r"] * t["nzf"]
        # votes = (x · wxp)·nz: dx += conj(wxp)·dv, summed over targets
        wre_, wim_ = t["wre"][None], t["wim"][None]
        dx_re_v = jnp.sum(dv_re * wre_ + dv_im * wim_, axis=1) * t["nzf"]
        dx_im_v = jnp.sum(-dv_re * wim_ + dv_im * wre_, axis=1) * t["nzf"]
        dx_acc[c0:c1, :] += dx_re_u + dx_re_v
        dx_acc[C + c0:C + c1, :] += dx_im_u + dx_im_v

    @pl.when(flags >= 2)
    def _():
        dx_ref[:] = dx_acc[:]


def _bwd_kernel_compact(meta_ref, dg_ref, x_ref, sten_ref, dx_ref,
                        *, TB, C, nbins, cc):
    """Backward over the SAME panel order as the forward: each panel owns
    its gathered columns, so dx blocks are disjoint — direct writes, no
    by-source ordering, no scratch accumulator (the per-vertex fold is one
    segment_sum outside the kernel)."""
    w = 2 * nbins + 1
    nbf = float(nbins)
    for c0, c1 in _chunk_cols(C, cc):
        t = _panel_tensors(sten_ref, x_ref, C, c0, c1, nbins)
        qf, qc = _b_factors(t, nbins, w)
        zero = jnp.zeros_like(t["v_re"])

        def row(a, carry):
            dv_re, dv_im = carry[0], carry[1]
            dqf = list(carry[2])
            dqc = list(carry[3])
            AF, AC = _a_masks(t, a, nbins)
            for b_i in range(w):
                W = AF * qf[b_i] + AC * qc[b_i]
                q = a * w + b_i
                dgr = dg_ref[0, q, c0:c1, :][:, :, None]     # (CC, TBt, 1)
                dgi = dg_ref[0, w * w + q, c0:c1, :][:, :, None]
                dv_re = dv_re + W * dgr
                dv_im = dv_im + W * dgi
                dW = t["v_re"] * dgr + t["v_im"] * dgi
                dqf[b_i] = dqf[b_i] + AF * dW
                dqc[b_i] = dqc[b_i] + AC * dW
            return (dv_re, dv_im, tuple(dqf), tuple(dqc))

        dv_re, dv_im, dqf, dqc = jax.lax.fori_loop(
            0, w, row,
            (zero, zero, tuple(zero for _ in range(w)),
             tuple(zero for _ in range(w))))

        dw0 = dw1 = dw2 = dw3 = zero
        for b_i in range(w):
            vb = float(b_i - nbins)
            BF = (t["pF2"] == vb).astype(jnp.float32)
            BC = (t["pC2"] == vb).astype(jnp.float32)
            dw0 = dw0 + BF * dqf[b_i]
            dw3 = dw3 + BC * dqf[b_i]
            dw2 = dw2 + BF * dqc[b_i]
            dw1 = dw1 + BC * dqc[b_i]

        e1C = t["pC1"] - t["p1"]
        e1F = t["p1"] - t["pF1"]
        e2C = t["pC2"] - t["p2"]
        e2F = t["p2"] - t["pF2"]
        dp1 = -dw0 * e2C + dw1 * e2F + dw2 * e2C - dw3 * e2F
        dp2 = -dw0 * e1C + dw1 * e1F - dw2 * e1F + dw3 * e1C
        da_re = nbf * dp1
        da_im = nbf * dp2
        lr, li = t["ln_re"][None], t["ln_im"][None]
        duR = jnp.sum(da_re * lr + da_im * li, axis=1)       # (CC, TBs)
        duI = -jnp.sum(-da_re * li + da_im * lr, axis=1)
        dot = t["uR"] * duR + t["uI"] * duI
        dx_re_u = (duR - t["uR"] * dot) * t["inv_r"] * t["nzf"]
        dx_im_u = (duI - t["uI"] * dot) * t["inv_r"] * t["nzf"]
        wre_, wim_ = t["wre"][None], t["wim"][None]
        dx_re_v = jnp.sum(dv_re * wre_ + dv_im * wim_, axis=1) * t["nzf"]
        dx_im_v = jnp.sum(-dv_re * wim_ + dv_im * wre_, axis=1) * t["nzf"]
        dx_ref[c0:c1, :] = dx_re_u + dx_re_v
        dx_ref[C + c0:C + c1, :] = dx_im_u + dx_im_v


def _fwd_impl_compact(xg2t, sten, meta, tb, ts, n_bins, cc, nb_out):
    C2 = xg2t.shape[0]
    C = C2 // 2
    TB = tb
    P = sten.shape[0]
    w = 2 * n_bins + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((C2, ts), lambda p, m: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, TB, ts), lambda p, m: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * w * w, C, TB),
                               lambda p, m: (m[0, p], 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, TB=TB, C=C, nbins=n_bins, cc=cc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_out, 2 * w * w, C, TB),
                                       jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta, xg2t, sten)


def _bwd_impl_compact(dg, xg2t, sten, meta, tb, ts, n_bins, cc):
    C2 = xg2t.shape[0]
    C = C2 // 2
    TB = tb
    P = sten.shape[0]
    w = 2 * n_bins + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((1, 2 * w * w, C, TB),
                         lambda p, m: (m[0, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2, ts), lambda p, m: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, TB, ts), lambda p, m: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C2, ts), lambda p, m: (0, p),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel_compact, TB=TB, C=C, nbins=n_bins,
                          cc=cc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C2, P * ts), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta, dg, xg2t, sten)


def _compact_gather(xr, src_flat):
    """(N, 2C) feature rows -> channel-major gathered panels (2C, P*ts)."""
    return jnp.take(xr, src_flat, axis=0).T


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _echo_compact_grid(xr, sten, meta, src_flat, tb, ts, n_bins, cc,
                       nb_out):
    xg2t = _compact_gather(xr, src_flat)
    return _fwd_impl_compact(xg2t, sten, meta, tb, ts, n_bins, cc, nb_out)


def _echo_compact_grid_fwd(xr, sten, meta, src_flat, tb, ts, n_bins, cc,
                           nb_out):
    g = _echo_compact_grid(xr, sten, meta, src_flat, tb, ts, n_bins, cc,
                           nb_out)
    return g, (xr, sten, meta, src_flat)


def _echo_compact_grid_bwd(tb, ts, n_bins, cc, nb_out, res, dg):
    xr, sten, meta, src_flat = res
    xg2t = _compact_gather(xr, src_flat)
    dxg = _bwd_impl_compact(dg, xg2t, sten, meta, tb, ts, n_bins, cc)
    # fold gathered-column grads onto vertices: dead columns carry exact
    # zeros (their stencil planes are zero), so their segment at vertex 0
    # adds nothing
    dxr = jax.ops.segment_sum(dxg.T, src_flat,
                              num_segments=xr.shape[0])
    zero_meta = np.zeros(meta.shape, dtype=jax.dtypes.float0)
    zero_src = np.zeros(src_flat.shape, dtype=jax.dtypes.float0)
    return dxr, jnp.zeros_like(sten), zero_meta, zero_src


_echo_compact_grid.defvjp(_echo_compact_grid_fwd, _echo_compact_grid_bwd)


def _fwd_impl(x2t, sten, meta, tb, n_bins, cc, nb_out):
    C2, N = x2t.shape
    C = C2 // 2
    TB = tb
    P = sten.shape[0]
    w = 2 * n_bins + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((C2, TB), lambda p, m: (0, m[1, p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, TB, TB), lambda p, m: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * w * w, C, TB),
                               lambda p, m: (m[0, p], 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, TB=TB, C=C, nbins=n_bins, cc=cc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_out, 2 * w * w, C, TB),
                                       jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta, x2t, sten)


def _bwd_impl(dg, x2t, sten, meta_s, coverage, tb, n_bins, cc):
    C2, N = x2t.shape
    C = C2 // 2
    TB = tb
    P = sten.shape[0]
    Ps = meta_s.shape[1]
    w = 2 * n_bins + 1
    nb_src = N // TB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Ps,),
        in_specs=[
            pl.BlockSpec((1, 2 * w * w, C, TB),
                         lambda p, m: (m[1, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C2, TB), lambda p, m: (0, m[2, p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, TB, TB), lambda p, m: (m[0, p], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C2, TB), lambda p, m: (0, m[2, p]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C2, TB), jnp.float32)],
    )
    dx2t = pl.pallas_call(
        functools.partial(_bwd_kernel, TB=TB, C=C, nbins=n_bins, cc=cc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C2, N), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta_s, dg, x2t, sten)
    if coverage is not None:
        # source blocks with no panel on this shard are never written
        cols = jnp.repeat(coverage, TB)[None, :]
        dx2t = jnp.where(cols > 0, dx2t, 0.0)
    return dx2t


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _echo_panel_grid(x2t, sten, meta, meta_s, coverage, tb, n_bins, cc,
                     nb_out):
    return _fwd_impl(x2t, sten, meta, tb, n_bins, cc, nb_out)


def _echo_panel_grid_fwd(x2t, sten, meta, meta_s, coverage, tb, n_bins, cc,
                         nb_out):
    g = _fwd_impl(x2t, sten, meta, tb, n_bins, cc, nb_out)
    return g, (x2t, sten, meta, meta_s, coverage)


def _echo_panel_grid_bwd(tb, n_bins, cc, nb_out, res, dg):
    x2t, sten, meta, meta_s, coverage = res
    dx2t = _bwd_impl(dg, x2t, sten, meta_s, coverage, tb, n_bins, cc)
    zero_meta = np.zeros(meta.shape, dtype=jax.dtypes.float0)
    zero_meta_s = np.zeros(meta_s.shape, dtype=jax.dtypes.float0)
    d_cov = None if coverage is None else jnp.zeros_like(coverage)
    return dx2t, jnp.zeros_like(sten), zero_meta, zero_meta_s, d_cov


_echo_panel_grid.defvjp(_echo_panel_grid_fwd, _echo_panel_grid_bwd)


def echo_panel_pallas(x, panel, n_bins: int, cc: int = 8, x_src=None,
                      n_out=None):
    """Panel-CSR ECHO through the in-VMEM kernel: (N, C, 2) -> (N, C, dS).

    panel: compressed PanelTable, a CompactPanelTable (gathered-column
    panels — ~3x less dead-slot VPU work at 163k, scatter-free backward),
    or a (sten, meta, meta_s, coverage, tb) tuple for the graph-parallel
    path (coverage masks unwritten source blocks; see _band_panel).
    x_src: global source rows (default x)."""
    from ...precomp.banded import CompactPanelTable, PanelTable

    x = jnp.asarray(x)
    N, C = x.shape[0], x.shape[1]
    n_out = N if n_out is None else n_out
    x_src = x if x_src is None else jnp.asarray(x_src)
    w = 2 * n_bins + 1
    dmap_np, dS = disk_map(n_bins)
    fold_np = np.zeros((w * w, dS), dtype=np.float32)
    fold_np[np.arange(w * w), dmap_np] = 1.0
    fold = jnp.asarray(fold_np)

    if isinstance(panel, CompactPanelTable):
        # feature rows (N_src, 2C): re columns then im columns — the
        # compact grid gathers per-panel columns and transposes to the
        # kernel's channel-major layout
        xr = jnp.concatenate([x_src[..., 0], x_src[..., 1]], axis=1)
        grid = _echo_compact_grid(
            xr, panel.sten, panel.meta, panel.src_idx.reshape(-1),
            panel.tb, panel.ts, n_bins, min(cc, C), n_out // panel.tb)
        TB = panel.tb
    else:
        if isinstance(panel, PanelTable):
            if not panel.compressed:
                raise ValueError("echo_panel_pallas needs a compressed "
                                 "PanelTable")
            sten, meta, meta_s, coverage, TB = (
                panel.sten, panel.meta, panel.meta_s, None, panel.tb)
        else:
            sten, meta, meta_s, coverage, TB = panel
        # channel-major planar rows: (2C, N_src), re rows then im rows
        x2t = jnp.concatenate([x_src[..., 0].T, x_src[..., 1].T], axis=0)
        grid = _echo_panel_grid(x2t, sten, meta, meta_s, coverage, TB,
                                n_bins, min(cc, C), n_out // TB)
    # (nb, 2w², C, TB) -> (N, C, 2, w²)
    grid4 = jnp.transpose(grid, (0, 3, 2, 1)).reshape(n_out, C, 2, w * w)
    hist = jnp.einsum("ncpu,us->ncps", grid4, fold,
                      preferred_element_type=jnp.float32)
    return soft_abs(jnp.moveaxis(hist, 2, 3))
