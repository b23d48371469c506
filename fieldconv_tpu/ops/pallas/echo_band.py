"""Pallas TPU kernel: banded ECHO rasterisation (VERDICT r1 #7).

Semantically identical to ops.echo.echo_banded (reference nn/echo.py:65-148
via the banded slot layout), but the whole per-block pipeline — feature
alignment, bilinear corner weights, masked votes, and the w×w grid splat —
runs in VMEM.  Under XLA the op is bound on HBM-materialised
(TB, W', C, ·) temporaries (measured 57 ms fwd+bwd at segmentation shapes,
31.6 ms at correspondence); in-VMEM the same math is pure VPU work.

The kernel emits the complex w×w GRID per (target, channel); the disk-map
fold (a tiny static matmul) and soft_abs stay in XLA where autodiff handles
them.  The backward is hand-derived (custom_vjp): gradients flow through
the votes (linear in x) AND through the splat position p = nbins·ln·conj(
x/|x|) into the bilinear weights — the one-hot cell masks and the
floor/ceil corners are piecewise-constant (zero gradient), exactly like
XLA's autodiff of the int casts.  dx partials are emitted per
(block, shift) and combined with the band transpose's aligned block shifts
(no scatter), reusing band_conv._shift_combine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...precomp.banded import CompressedBandedTable
from ...utils.complexops import EPS, soft_abs
from ..echo import disk_map
from .band_conv import _compiler_params, _g_specs, _interpret, _shift_combine


def _csten_block_spec(TB, NJ):
    return pl.BlockSpec((1, 5, TB, NJ * TB), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _chunk_cols(C, cc=16):
    return [(c0, min(c0 + cc, C)) for c0 in range(0, C, cc)]


def _slot_tensors(sten_ref, xs_ref, j, TB, C, c0, c1, nbins):
    """Shared fwd tensors for shift j, channel chunk [c0, c1)."""
    sl = slice(j * TB, (j + 1) * TB)
    rv = sten_ref[0, 0, :, sl]                       # (TBt, TBs)
    ln_re = rv * sten_ref[0, 1, :, sl]
    ln_im = rv * sten_ref[0, 2, :, sl]
    wre = sten_ref[0, 3, :, sl]
    wim = sten_ref[0, 4, :, sl]

    xre = xs_ref[:, c0:c1]                           # (TBs, CC)
    xim = xs_ref[:, C + c0:C + c1]
    nz = jnp.logical_or(jnp.abs(xre) >= EPS, jnp.abs(xim) >= EPS)
    nzf = nz.astype(jnp.float32)
    r2 = xre * xre + xim * xim
    inv_r = jax.lax.rsqrt(jnp.where(nz, r2, 1.0))
    uR = xre * inv_r * nzf                           # unit(x) components
    uI = xim * inv_r * nzf

    # aligned = ln · conj(unit(x)) = ln · (uR, -uI); p = nbins·aligned
    p1 = nbins * (ln_re[:, :, None] * uR[None] + ln_im[:, :, None] * uI[None])
    p2 = nbins * (-ln_re[:, :, None] * uI[None] + ln_im[:, :, None] * uR[None])
    fnb = float(nbins)
    pC1 = jnp.clip(jnp.ceil(p1), -fnb, fnb)
    pF1 = jnp.clip(jnp.floor(p1), -fnb, fnb)
    pC2 = jnp.clip(jnp.ceil(p2), -fnb, fnb)
    pF2 = jnp.clip(jnp.floor(p2), -fnb, fnb)
    w0 = (pC1 - p1) * (pC2 - p2)
    w1 = (p1 - pF1) * (p2 - pF2)
    w2 = (p1 - pF1) * (pC2 - p2)
    w3 = (pC1 - p1) * (p2 - pF2)

    v_re = (xre[None] * wre[:, :, None] - xim[None] * wim[:, :, None]) * nzf[None]
    v_im = (xre[None] * wim[:, :, None] + xim[None] * wre[:, :, None]) * nzf[None]

    return dict(ln_re=ln_re, ln_im=ln_im, wre=wre, wim=wim,
                xre=xre, xim=xim, nzf=nzf, inv_r=inv_r, uR=uR, uI=uI,
                p1=p1, p2=p2, pC1=pC1, pF1=pF1, pC2=pC2, pF2=pF2,
                w0=w0, w1=w1, w2=w2, w3=w3, v_re=v_re, v_im=v_im)


def _cell_masks(t, nbins, w):
    """Per-cell weight builder: W_ab = AF·(w0·BF + w3·BC) + AC·(w2·BF + w1·BC).

    Yields (a, b, W) for every grid cell.  QF/QC are hoisted per b.
    """
    qs = []
    for b_i in range(w):
        val = float(b_i - nbins)
        BF = (t["pF2"] == val).astype(jnp.float32)
        BC = (t["pC2"] == val).astype(jnp.float32)
        qs.append((t["w0"] * BF + t["w3"] * BC, t["w2"] * BF + t["w1"] * BC))
    for a_i in range(w):
        val = float(a_i - nbins)
        AF = (t["pF1"] == val).astype(jnp.float32)
        AC = (t["pC1"] == val).astype(jnp.float32)
        for b_i in range(w):
            QF, QC = qs[b_i]
            yield a_i, b_i, AF * QF + AC * QC


def _fwd_echo_kernel(*refs, TB, NJ, C, nbins, cc):
    xs_refs = refs[:NJ]
    sten_ref, out_ref = refs[NJ], refs[NJ + 1]
    w = 2 * nbins + 1
    for c0, c1 in _chunk_cols(C, cc):
        CC = c1 - c0
        pieces = [[None] * (w * w), [None] * (w * w)]   # [p][a*w+b] -> (TB, CC)
        for j in range(NJ):
            t = _slot_tensors(sten_ref, xs_refs[j], j, TB, C, c0, c1, nbins)
            for a_i, b_i, W in _cell_masks(t, nbins, w):
                se = jnp.sum(W * t["v_re"], axis=1)      # (TBt, CC)
                si = jnp.sum(W * t["v_im"], axis=1)
                k = a_i * w + b_i
                pieces[0][k] = se if pieces[0][k] is None else pieces[0][k] + se
                pieces[1][k] = si if pieces[1][k] is None else pieces[1][k] + si
        # q-major output layout: column (p·w² + k)·C + c.  Mosaic cannot
        # shape-cast a (TB, CC, 2, w²) stack into lanes (w²=25 is not a
        # lane multiple), so emit each (TB, CC) piece as its own 2D write.
        for p_i in range(2):
            for k in range(w * w):
                q = p_i * w * w + k
                out_ref[:, q * C + c0:q * C + c1] = pieces[p_i][k]


def _bwd_echo_kernel(*refs, TB, NJ, C, nbins, cc):
    dg_ref = refs[0]
    xs_refs = refs[1:1 + NJ]
    sten_ref, parts_ref = refs[1 + NJ], refs[2 + NJ]
    w = 2 * nbins + 1
    nbf = float(nbins)
    for j in range(NJ):
        for c0, c1 in _chunk_cols(C, cc):
            CC = c1 - c0
            t = _slot_tensors(sten_ref, xs_refs[j], j, TB, C, c0, c1, nbins)
            dv_re = jnp.zeros_like(t["v_re"])
            dv_im = jnp.zeros_like(t["v_im"])
            dw0 = jnp.zeros_like(t["w0"])
            dw1 = jnp.zeros_like(t["w0"])
            dw2 = jnp.zeros_like(t["w0"])
            dw3 = jnp.zeros_like(t["w0"])
            for a_i in range(w):
                AF = (t["pF1"] == float(a_i - nbins)).astype(jnp.float32)
                AC = (t["pC1"] == float(a_i - nbins)).astype(jnp.float32)
                for b_i in range(w):
                    BF = (t["pF2"] == float(b_i - nbins)).astype(jnp.float32)
                    BC = (t["pC2"] == float(b_i - nbins)).astype(jnp.float32)
                    W = (AF * (t["w0"] * BF + t["w3"] * BC)
                         + AC * (t["w2"] * BF + t["w1"] * BC))
                    k = a_i * w + b_i
                    # q-major dg layout matching the fwd's 2D writes
                    dgr = dg_ref[:, k * C + c0:k * C + c1][:, None, :]
                    dgi = dg_ref[:, (w * w + k) * C + c0:
                                 (w * w + k) * C + c1][:, None, :]
                    dv_re += W * dgr
                    dv_im += W * dgi
                    dW = t["v_re"] * dgr + t["v_im"] * dgi
                    dw0 += (AF * BF) * dW
                    dw1 += (AC * BC) * dW
                    dw2 += (AC * BF) * dW
                    dw3 += (AF * BC) * dW
            # bilinear weights -> dp
            e1C = t["pC1"] - t["p1"]
            e1F = t["p1"] - t["pF1"]
            e2C = t["pC2"] - t["p2"]
            e2F = t["p2"] - t["pF2"]
            dp1 = -dw0 * e2C + dw1 * e2F + dw2 * e2C - dw3 * e2F
            dp2 = -dw0 * e1C + dw1 * e1F - dw2 * e1F + dw3 * e1C
            da_re = nbf * dp1
            da_im = nbf * dp2
            # aligned = ln·(uR, -uI): sum over targets t
            lr, li = t["ln_re"][:, :, None], t["ln_im"][:, :, None]
            duR = jnp.sum(da_re * lr + da_im * li, axis=0)       # (TBs, CC)
            dnegUI = jnp.sum(-da_re * li + da_im * lr, axis=0)
            duI = -dnegUI
            # unit(x) = x/|x|: symmetric Jacobian (I - ûûᵀ)/r, 0 at origin
            dot = t["uR"] * duR + t["uI"] * duI
            dx_re_u = (duR - t["uR"] * dot) * t["inv_r"] * t["nzf"]
            dx_im_u = (duI - t["uI"] * dot) * t["inv_r"] * t["nzf"]
            # votes = (x · wxp)·nz: dx += conj(wxp)·dv, summed over targets
            wre_, wim_ = t["wre"][:, :, None], t["wim"][:, :, None]
            dx_re_v = jnp.sum(dv_re * wre_ + dv_im * wim_, axis=0) * t["nzf"]
            dx_im_v = jnp.sum(-dv_re * wim_ + dv_im * wre_, axis=0) * t["nzf"]
            parts_ref[j * TB:(j + 1) * TB, c0:c1] = dx_re_u + dx_re_v
            parts_ref[j * TB:(j + 1) * TB, C + c0:C + c1] = dx_im_u + dx_im_v


def _echo_grid_fwd_impl(x2, sten_band, tb, nh, n_bins, cc):
    N, C2 = x2.shape
    C = C2 // 2
    TB = tb
    NJ = 2 * nh + 1
    nb = N // TB
    w = 2 * n_bins + 1

    return pl.pallas_call(
        functools.partial(_fwd_echo_kernel, TB=TB, NJ=NJ, C=C, nbins=n_bins,
                          cc=cc),
        grid=(nb,),
        in_specs=_g_specs(nb, nh, TB, C2) + [_csten_block_spec(TB, NJ)],
        out_specs=pl.BlockSpec((TB, C * 2 * w * w), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C * 2 * w * w), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*([x2] * NJ), sten_band)


def _echo_grid_bwd_impl(dg, x2, sten_band, tb, nh, n_bins, cc):
    N, C2 = x2.shape
    C = C2 // 2
    TB = tb
    NJ = 2 * nh + 1
    nb = N // TB
    w = 2 * n_bins + 1

    parts = pl.pallas_call(
        functools.partial(_bwd_echo_kernel, TB=TB, NJ=NJ, C=C, nbins=n_bins,
                          cc=cc),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, C * 2 * w * w), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + _g_specs(nb, nh, TB, C2) + [_csten_block_spec(TB, NJ)],
        out_specs=pl.BlockSpec((NJ * TB, C2), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * NJ * TB, C2), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dg, *([x2] * NJ), sten_band)
    return _shift_combine(parts, nb, NJ, nh, TB, C2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _echo_grid(x2, sten_band, tb, nh, n_bins, cc):
    return _echo_grid_fwd_impl(x2, sten_band, tb, nh, n_bins, cc)


def _echo_grid_fwd(x2, sten_band, tb, nh, n_bins, cc):
    g = _echo_grid_fwd_impl(x2, sten_band, tb, nh, n_bins, cc)
    return g, (x2, sten_band)


def _echo_grid_bwd(tb, nh, n_bins, cc, res, dg):
    x2, sten_band = res
    dx2 = _echo_grid_bwd_impl(dg, x2, sten_band, tb, nh, n_bins, cc)
    return dx2, jnp.zeros_like(sten_band)


_echo_grid.defvjp(_echo_grid_fwd, _echo_grid_bwd)


def echo_banded_pallas(x, comp: CompressedBandedTable, n_bins: int,
                       cc: int = 16):
    """Pallas in-VMEM ECHO over the banded layout: (N, C, 2) -> (N, C, dS).

    Single-device path (the graph-parallel halo variant keeps the XLA
    windowed echo_banded).  cc: channel chunk per kernel inner loop.
    """
    N, C = x.shape[0], x.shape[1]
    w = 2 * n_bins + 1
    dmap_np, dS = disk_map(n_bins)
    fold_np = np.zeros((w * w, dS), dtype=np.float32)
    fold_np[np.arange(w * w), dmap_np] = 1.0
    fold = jnp.asarray(fold_np)

    x2 = jnp.concatenate([x[..., 0], x[..., 1]], axis=1)      # (N, 2C)
    grid = _echo_grid(x2, comp.sten_band, comp.tb, comp.nh, n_bins,
                      min(cc, C))
    # kernel emits q-major columns (p·w² + k)·C + c
    grid4 = jnp.moveaxis(grid.reshape(N, 2, w * w, C), 3, 1)  # (N, C, 2, w²)
    hist = jnp.einsum("ncpu,us->ncps", grid4, fold,
                      preferred_element_type=jnp.float32)
    return soft_abs(jnp.moveaxis(hist, 2, 3))
