"""Pallas TPU kernel: banded field-convolution contraction.

Computes, entirely on the MXU with zero gathers,

    contrib[n, r, k] (complex, per channel c) =
        Σ_{w'} rsten_band[r, n, w'] · fwxp_band[k, ·, n, w'] ⊙ G[src(n,w'), k, ·, c]

over the banded layout of precomp/banded.py: the sources of target block b
live in vertex blocks b-nh … b+nh, so the slot contraction decomposes into
(2nh+1) dense (R·TB, TB) × (TB, 2C) matmuls per angular frequency k, with
the complex arithmetic hand-written on planar pairs.

The stencil ships block-major packed — one contiguous (R+2K, TB, W') chunk
per target block — so each grid step issues a single large DMA.  Measured
on-chip: the pipeline is dominated by per-transfer overhead, not bandwidth
(~19 strided ~200KB transfers/step ran at ~200GB/s effective vs ~2TB/s for
contiguous streams).

The XLA fallback for the same math is ops/field_conv.field_conv_contrib —
it bottlenecks on XLA's gather; this kernel replaces it at ~100× on real
chips.  `fuse_filters` additionally applies the (O,C,R,K) filter
contraction inside the kernel (per-ring W matrices against the VMEM-resident
block contrib), so the (N, R·K·2C) contrib tensor never touches HBM.

Backward: the transposed band matmul (Sᴴ · dO) emits per-(block, shift)
partials of dG that are summed with aligned block shifts outside the kernel
(the band transpose of a scatter — no atomics, deterministic); the fused
backward rematerialises contrib from g (FLOPs are far cheaper than the HBM
round-trip) and accumulates dW across grid steps in a revisited output
block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...precomp.banded import (BandedTable, BlockSparseTable,
                               CompressedBandedTable, PanelTable)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    """Raise the per-kernel VMEM budget: the fused kernels' unrolled K x NJ
    bodies plus double-buffered stencil blocks exceed the conservative 16MB
    default scoped limit; v5e cores have far more physical VMEM."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _mxu_dtype(precision):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32


# --- packed-stencil accessors ----------------------------------------------
#
# sten_ref block: (1, R+2K, TB, NJ·TB).  Planes 0..R-1 = radial weights;
# plane R+2k+p = fwxp_k re (p=0) / im (p=1).

def _rs_plane(sten_ref, R, j, TB):
    return sten_ref[0, :R, :, j * TB:(j + 1) * TB]          # (R, TB, TB)


def _f_planes(sten_ref, R, k, j, TB):
    fre = sten_ref[0, R + 2 * k, :, j * TB:(j + 1) * TB]    # (TB, TB)
    fim = sten_ref[0, R + 2 * k + 1, :, j * TB:(j + 1) * TB]
    return fre, fim


def _sten_spec(R, K, TB, NJ):
    return pl.BlockSpec((1, R + 2 * K, TB, NJ * TB), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _g_specs(nb, nh, TB, M):
    return [
        pl.BlockSpec(
            (TB, M),
            functools.partial(
                lambda b, jj: (jnp.clip(b - nh + jj, 0, nb - 1), 0), jj=j
            ),
            memory_space=pltpu.VMEM,
        )
        for j in range(2 * nh + 1)
    ]


# --- unfused kernels (contrib out) -----------------------------------------

def _fwd_kernel(*refs, R, K, C, TB, NJ, mxu_dtype=jnp.float32):
    g_refs = refs[:NJ]
    sten_ref, out_ref = refs[NJ], refs[NJ + 1]
    C2 = 2 * C
    for k in range(K):
        acc_a = jnp.zeros((R * TB, C2), jnp.float32)
        acc_b = jnp.zeros((R * TB, C2), jnp.float32)
        for j in range(NJ):
            rs = _rs_plane(sten_ref, R, j, TB)
            fre, fim = _f_planes(sten_ref, R, k, j, TB)
            s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
            gj = g_refs[j][:, k * C2:(k + 1) * C2].astype(mxu_dtype)
            acc_a += jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            acc_b += jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        out_ref[:, (2 * k) * C:(2 * k + 1) * C] = acc_a[:, :C] - acc_b[:, C:]
        out_ref[:, (2 * k + 1) * C:(2 * k + 2) * C] = acc_a[:, C:] + acc_b[:, :C]


def _bwd_kernel(*refs, R, K, C, TB, NJ, mxu_dtype=jnp.float32):
    dout_ref, sten_ref, part_ref = refs
    C2 = 2 * C
    contract_rows = (((0,), (0,)), ((), ()))
    for k in range(K):
        d_both = dout_ref[:, k * C2:(k + 1) * C2].astype(mxu_dtype)  # (R·TB, 2C)
        for j in range(NJ):
            rs = _rs_plane(sten_ref, R, j, TB)
            fre, fim = _f_planes(sten_ref, R, k, j, TB)
            s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
            p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            part_ref[j * TB:(j + 1) * TB, (2 * k) * C:(2 * k + 1) * C] = \
                p1[:, :C] + p2[:, C:]
            part_ref[j * TB:(j + 1) * TB, (2 * k + 1) * C:(2 * k + 2) * C] = \
                p1[:, C:] - p2[:, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _band_contrib(g, sten_band, tb, nh, n_rings, k_width, precision):
    return _band_contrib_fwd_impl(g, sten_band, tb, nh, n_rings, k_width,
                                  precision)


def _band_contrib_fwd_impl(g, sten_band, tb, nh, n_rings, k_width,
                           precision="f32"):
    N, M = g.shape               # M = K·2·C
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    nb = N // TB

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          mxu_dtype=_mxu_dtype(precision)),
        grid=(nb,),
        in_specs=_g_specs(nb, nh, TB, M) + [_sten_spec(R, K, TB, NJ)],
        out_specs=pl.BlockSpec((R * TB, M), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * R * TB, M), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*([g] * NJ), sten_band)
    return out


def _band_contrib_fwd(g, sten_band, tb, nh, n_rings, k_width, precision):
    out = _band_contrib_fwd_impl(g, sten_band, tb, nh, n_rings, k_width,
                                 precision)
    return out, (g, sten_band)


def _shift_combine(parts, nb, NJ, nh, TB, M):
    """Sum per-(block, shift) dG partials onto their owner blocks."""
    parts = parts.reshape(nb, NJ, TB, M)
    dg = jnp.zeros((nb, TB, M), jnp.float32)
    for j in range(NJ):
        d = j - nh
        if d == 0:
            dg = dg + parts[:, j]
        elif d > 0:
            dg = dg.at[d:].add(parts[:-d, j])
        else:
            dg = dg.at[:d].add(parts[-d:, j])
    return dg.reshape(nb * TB, M)


def _band_contrib_bwd(tb, nh, n_rings, k_width, precision, res, dout):
    g, sten_band = res
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    nb = N // TB

    parts = pl.pallas_call(
        functools.partial(_bwd_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          mxu_dtype=_mxu_dtype(precision)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((R * TB, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            _sten_spec(R, K, TB, NJ),
        ],
        out_specs=pl.BlockSpec((NJ * TB, M), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * NJ * TB, M), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dout, sten_band)

    dg = _shift_combine(parts, nb, NJ, nh, TB, M)
    # zero cotangent for the (constant) stencil table; DCE'd by XLA
    return dg, jnp.zeros_like(sten_band)


_band_contrib.defvjp(_band_contrib_fwd, _band_contrib_bwd)


# --- fused kernel: filter contraction folded into the band contraction ----

def filters_to_wmat(coeff):
    """Pack the planar filter bank (O, C, R, K, 2) into per-ring real
    matrices W (R, K·2C, 2O) such that

        [y_re | y_im][t] = (1/K) Σ_r contrib_block_r[t] @ W[r]

    with contrib columns laid out k-major as [re C | im C] per k (the
    kernel's native layout) and output columns [o_re O | o_im O]."""
    O, C, R, K, _ = coeff.shape
    wre = jnp.transpose(coeff[..., 0], (2, 3, 1, 0))      # (R, K, C, O)
    wim = jnp.transpose(coeff[..., 1], (2, 3, 1, 0))
    top = jnp.concatenate([wre, wim], axis=-1)             # rows p=0 (re)
    bot = jnp.concatenate([-wim, wre], axis=-1)            # rows p=1 (im)
    w = jnp.stack([top, bot], axis=2)                      # (R, K, 2, C, 2O)
    return (w / K).reshape(R, K * 2 * C, 2 * O)


def _gj_from_refs(g_refs, C2):
    """Slot accessor over per-shift block inputs (one DMA'd block per j)."""
    def get(j, k):
        return g_refs[j][:, k * C2:(k + 1) * C2]
    return get


def _gj_resident(g_ref, b, nh, nb, TB, C2):
    """Slot accessor over the whole-array VMEM-resident g (constant index
    map: fetched ONCE for the entire grid, then dynamically sliced).  Kills
    the NJ per-step g block pipelines — the grid pipeline is per-transfer
    -overhead-bound, not bandwidth-bound (docs/KERNEL_NOTES.md)."""
    def get(j, k):
        row0 = jnp.clip(b - nh + j, 0, nb - 1) * TB
        return g_ref[pl.ds(row0, TB), k * C2:(k + 1) * C2]
    return get


def _contrib_to_scratch(get_gj, sten_ref, scratch, *, R, K, C, TB, NJ,
                        mxu_dtype):
    """Shared fwd contraction: write the block's contrib into VMEM scratch."""
    C2 = 2 * C
    for k in range(K):
        acc_a = jnp.zeros((R * TB, C2), jnp.float32)
        acc_b = jnp.zeros((R * TB, C2), jnp.float32)
        for j in range(NJ):
            rs = _rs_plane(sten_ref, R, j, TB)
            fre, fim = _f_planes(sten_ref, R, k, j, TB)
            s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
            gj = get_gj(j, k).astype(mxu_dtype)
            acc_a += jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            acc_b += jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        scratch[:, (2 * k) * C:(2 * k + 1) * C] = acc_a[:, :C] - acc_b[:, C:]
        scratch[:, (2 * k + 1) * C:(2 * k + 2) * C] = acc_a[:, C:] + acc_b[:, :C]


def _apply_w(scratch, w_ref, out_ref, *, R, TB, O2, mxu_dtype):
    y = jnp.zeros((TB, O2), jnp.float32)
    for r in range(R):
        cr = scratch[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
        y += jnp.dot(cr, w_ref[r].astype(mxu_dtype),
                     preferred_element_type=jnp.float32)
    out_ref[:] = y


def _fwd_fused_kernel(*refs, R, K, C, TB, NJ, O2, mxu_dtype=jnp.float32):
    g_refs = refs[:NJ]
    sten_ref, w_ref, out_ref, scratch = refs[NJ:NJ + 4]
    _contrib_to_scratch(_gj_from_refs(g_refs, 2 * C), sten_ref, scratch,
                        R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
    _apply_w(scratch, w_ref, out_ref, R=R, TB=TB, O2=O2, mxu_dtype=mxu_dtype)


def _fwd_fused_res_kernel(*refs, R, K, C, TB, NJ, O2, nb, nh,
                          mxu_dtype=jnp.float32):
    g_ref, sten_ref, w_ref, out_ref, scratch = refs
    b = pl.program_id(0)
    get_gj = _gj_resident(g_ref, b, nh, nb, TB, 2 * C)
    _contrib_to_scratch(get_gj, sten_ref, scratch,
                        R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
    _apply_w(scratch, w_ref, out_ref, R=R, TB=TB, O2=O2, mxu_dtype=mxu_dtype)


def _bwd_fused_body(get_gj, dy_ref, sten_ref, w_ref, part_ref, dw_ref,
                    contrib, dcontrib, *, R, K, C, TB, NJ, O2, mxu_dtype):
    C2 = 2 * C

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    # rematerialise the block's contrib for the dW product
    _contrib_to_scratch(get_gj, sten_ref, contrib,
                        R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)

    dy = dy_ref[:].astype(mxu_dtype)                       # (TB, O2)
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))
    for r in range(R):
        cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
        dw_ref[r] += jax.lax.dot_general(
            cr, dy, contract_rows, preferred_element_type=jnp.float32)
        dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
            dy, w_ref[r].astype(mxu_dtype), contract_cols,
            preferred_element_type=jnp.float32)

    # transposed band contraction: dcontrib -> per-(block, shift) dG partials
    for k in range(K):
        d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        for j in range(NJ):
            rs = _rs_plane(sten_ref, R, j, TB)
            fre, fim = _f_planes(sten_ref, R, k, j, TB)
            s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
            p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            part_ref[j * TB:(j + 1) * TB, (2 * k) * C:(2 * k + 1) * C] = \
                p1[:, :C] + p2[:, C:]
            part_ref[j * TB:(j + 1) * TB, (2 * k + 1) * C:(2 * k + 2) * C] = \
                p1[:, C:] - p2[:, :C]


def _bwd_fused_kernel(*refs, R, K, C, TB, NJ, O2, mxu_dtype=jnp.float32):
    dy_ref = refs[0]
    g_refs = refs[1:1 + NJ]
    sten_ref, w_ref = refs[1 + NJ:3 + NJ]
    part_ref, dw_ref = refs[3 + NJ:5 + NJ]
    contrib, dcontrib = refs[5 + NJ:7 + NJ]
    _bwd_fused_body(_gj_from_refs(g_refs, 2 * C), dy_ref, sten_ref, w_ref,
                    part_ref, dw_ref, contrib, dcontrib,
                    R=R, K=K, C=C, TB=TB, NJ=NJ, O2=O2, mxu_dtype=mxu_dtype)


def _bwd_fused_res_kernel(*refs, R, K, C, TB, NJ, O2, nb, nh,
                          mxu_dtype=jnp.float32):
    dy_ref, g_ref, sten_ref, w_ref, part_ref, dw_ref, contrib, dcontrib = refs
    b = pl.program_id(0)
    get_gj = _gj_resident(g_ref, b, nh, nb, TB, 2 * C)
    _bwd_fused_body(get_gj, dy_ref, sten_ref, w_ref,
                    part_ref, dw_ref, contrib, dcontrib,
                    R=R, K=K, C=C, TB=TB, NJ=NJ, O2=O2, mxu_dtype=mxu_dtype)


def _use_g_resident(g, override=None):
    """Whether to keep the whole rotated-source tensor g VMEM-resident
    across the grid (one fetch total instead of NJ block DMAs per step).

    Auto (override None) is OFF: measured on one TPU chip the resident
    variant is a wash — the stencil stream, ~6x the g traffic, dominates
    (docs/KERNEL_NOTES.md).  The knob stays for hardware where per-buffer
    pipeline overhead is costlier; pass g_resident=True to force it."""
    if override is not None:
        return bool(override)
    return False


def _whole_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _band_fused(g, wmat, sten_band, tb, nh, n_rings, k_width, precision,
                gres):
    return _band_fused_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, k_width,
                                precision, gres)


def _band_fused_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, k_width,
                         precision, gres):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB
    mxu = _mxu_dtype(precision)

    if gres:
        kern = functools.partial(_fwd_fused_res_kernel, R=R, K=K, C=C, TB=TB,
                                 NJ=NJ, O2=O2, nb=nb, nh=nh, mxu_dtype=mxu)
        g_specs, g_args = [_whole_spec((N, M))], (g,)
    else:
        kern = functools.partial(_fwd_fused_kernel, R=R, K=K, C=C, TB=TB,
                                 NJ=NJ, O2=O2, mxu_dtype=mxu)
        g_specs, g_args = _g_specs(nb, nh, TB, M), (g,) * NJ

    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=g_specs + [
            _sten_spec(R, K, TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, O2), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*g_args, sten_band, wmat)


def _band_fused_fwd(g, wmat, sten_band, tb, nh, n_rings, k_width, precision,
                    gres):
    y = _band_fused_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, k_width,
                             precision, gres)
    return y, (g, wmat, sten_band)


def _band_fused_bwd(tb, nh, n_rings, k_width, precision, gres, res, dy):
    g, wmat, sten_band = res
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB
    mxu = _mxu_dtype(precision)

    if gres:
        kern = functools.partial(_bwd_fused_res_kernel, R=R, K=K, C=C, TB=TB,
                                 NJ=NJ, O2=O2, nb=nb, nh=nh, mxu_dtype=mxu)
        g_specs, g_args = [_whole_spec((N, M))], (g,)
    else:
        kern = functools.partial(_bwd_fused_kernel, R=R, K=K, C=C, TB=TB,
                                 NJ=NJ, O2=O2, mxu_dtype=mxu)
        g_specs, g_args = _g_specs(nb, nh, TB, M), (g,) * NJ

    parts, dw = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, O2), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + g_specs + [
            _sten_spec(R, K, TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NJ * TB, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            # revisited accumulator: every grid step maps to the same block
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * NJ * TB, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy, *g_args, sten_band, wmat)

    dg = _shift_combine(parts, nb, NJ, nh, TB, M)
    return dg, dw, jnp.zeros_like(sten_band)


_band_fused.defvjp(_band_fused_fwd, _band_fused_bwd)


# --- mega kernel: single grid step, manual double-buffered stencil DMA -----
#
# The implicit grid pipeline was measured ~90% per-step-overhead-bound
# (docs/KERNEL_NOTES.md: load-only ≈ full kernel; contiguous streams reach
# ~2TB/s vs ~200GB/s through the pipeline).  This variant runs the whole
# band contraction as ONE grid step: g / wmat / dy / outputs live whole in
# VMEM (fetched exactly once), and the 16-plane packed stencil — the
# dominant stream — is hand-pipelined from HBM with make_async_copy into two
# VMEM slots (compute block b while block b+1 streams).  The backward
# additionally accumulates dG in a VMEM-resident (N, M) buffer via aligned
# block shifts (read-modify-write, serial so deterministic), eliminating the
# (nb·NJ·TB, M) parts tensor and the XLA shift-combine pass entirely.
#
# VMEM cost is O(N·M), so the mega path is routed by footprint: see
# _mega_fits / field_conv_banded(pipeline=...).


def _mega_sten_io(sten_hbm, slots, sems):
    def start(sl, b):
        pltpu.make_async_copy(sten_hbm.at[b], slots.at[sl], sems.at[sl]).start()

    def wait(sl, b):
        pltpu.make_async_copy(sten_hbm.at[b], slots.at[sl], sems.at[sl]).wait()

    return start, wait


def _gj_mega(g_ref, b, nh, nb, TB, C2):
    """Slot accessor over VMEM-whole g with a traced block index."""
    def get(j, k):
        row0 = jnp.clip(b - nh + j, 0, nb - 1) * TB
        return g_ref[pl.ds(row0, TB), k * C2:(k + 1) * C2]
    return get


def _mega_planes(sref, R, j, TB):
    """Packed-plane accessors on a (R+2K, TB, NJ·TB) slot ref view."""
    rs = sref[:R, :, j * TB:(j + 1) * TB]

    def f(k):
        return (sref[R + 2 * k, :, j * TB:(j + 1) * TB],
                sref[R + 2 * k + 1, :, j * TB:(j + 1) * TB])

    return rs, f


def _mega_contrib(get_gj, sref, scratch, *, R, K, C, TB, NJ, mxu_dtype):
    C2 = 2 * C
    for k in range(K):
        acc_a = jnp.zeros((R * TB, C2), jnp.float32)
        acc_b = jnp.zeros((R * TB, C2), jnp.float32)
        for j in range(NJ):
            rs, f = _mega_planes(sref, R, j, TB)
            fre, fim = f(k)
            s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
            gj = get_gj(j, k).astype(mxu_dtype)
            acc_a += jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            acc_b += jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        scratch[:, (2 * k) * C:(2 * k + 1) * C] = acc_a[:, :C] - acc_b[:, C:]
        scratch[:, (2 * k + 1) * C:(2 * k + 2) * C] = acc_a[:, C:] + acc_b[:, :C]


def _mega_loop(nb, start, wait, compute, n_slots=2):
    """Multi-buffered block schedule with STATIC slot ids (Mosaic lowers
    static-slot DMA descriptors far better than traced ones): the body
    processes n_slots blocks per iteration; a slot is refilled right after
    its compute, keeping n_slots-1 DMAs in flight to hide per-transfer
    latency."""
    ns = min(n_slots, nb)
    for s in range(ns):
        start(s, s)

    def body(i, _):
        for s in range(ns):
            b = i * ns + s
            wait(s, b)
            compute(s, b)

            @pl.when(b + ns < nb)
            def _():
                start(s, b + ns)

        return 0

    jax.lax.fori_loop(0, nb // ns, body, 0)
    for s in range(nb % ns):                       # static tail
        b = (nb // ns) * ns + s
        wait(s, b)
        compute(s, b)


def _fwd_mega_kernel(g_ref, sten_hbm, w_ref, out_ref, slots, sems, contrib,
                     *, R, K, C, TB, NJ, O2, nb, nh, n_slots=2,
                     mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)

    def compute(sl, b):
        sref = slots.at[sl]
        _mega_contrib(_gj_mega(g_ref, b, nh, nb, TB, 2 * C), sref, contrib,
                      R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        y = jnp.zeros((TB, O2), jnp.float32)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            y += jnp.dot(cr, w_ref[r].astype(mxu_dtype),
                         preferred_element_type=jnp.float32)
        out_ref[pl.ds(b * TB, TB), :] = y

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _bwd_mega_kernel(dy_ref, g_ref, sten_hbm, w_ref, dg_ref, dw_ref,
                     slots, sems, contrib, dcontrib,
                     *, R, K, C, TB, NJ, O2, nb, nh, n_slots=2,
                     mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)
    C2 = 2 * C
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    dg_ref[:] = jnp.zeros_like(dg_ref)
    dw_ref[:] = jnp.zeros_like(dw_ref)

    def compute(sl, b):
        sref = slots.at[sl]
        get_gj = _gj_mega(g_ref, b, nh, nb, TB, C2)
        _mega_contrib(get_gj, sref, contrib,
                      R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        dy = dy_ref[pl.ds(b * TB, TB), :].astype(mxu_dtype)       # (TB, O2)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            dw_ref[r] += jax.lax.dot_general(
                cr, dy, contract_rows, preferred_element_type=jnp.float32)
            dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
                dy, w_ref[r].astype(mxu_dtype), contract_cols,
                preferred_element_type=jnp.float32)
        # transposed band contraction, accumulated straight into dG: the
        # (b, j) partial belongs to source block b-nh+j; out-of-range js
        # carry zero stencil planes, so the clipped row add is a no-op
        for j in range(NJ):
            rs, f = _mega_planes(sref, R, j, TB)
            row0 = jnp.clip(b - nh + j, 0, nb - 1) * TB
            for k in range(K):
                fre, fim = f(k)
                s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
                s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
                d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
                p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                         preferred_element_type=jnp.float32)
                p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                         preferred_element_type=jnp.float32)
                dg_ref[pl.ds(row0, TB), (2 * k) * C:(2 * k + 1) * C] += \
                    p1[:, :C] + p2[:, C:]
                dg_ref[pl.ds(row0, TB), (2 * k + 1) * C:(2 * k + 2) * C] += \
                    p1[:, C:] - p2[:, :C]

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


_MEGA_VMEM_BUDGET = 96 * 1024 * 1024

# stencil DMA slots in the mega kernels (prefetch depth n-1); override for
# A/B runs with FIELDCONV_MEGA_SLOTS
import os as _os

_MEGA_SLOTS = int(_os.environ.get("FIELDCONV_MEGA_SLOTS", "4"))


def _mega_fits(N, M, O2, R, K, TB, NJ):
    """Whether the mega kernels' VMEM-whole working set fits the budget
    (bwd is the larger: dy + g + dG + dW + wmat + 2 stencil slots +
    contrib + dcontrib).  g is counted at the megaw row count
    (N + 2·nh·TB for gp and dgp) since pipeline='auto' routes to the wide
    kernel first; for the classic mega/cmega paths this over-counts by
    2·nh·TB rows, a conservative error."""
    f = 4
    n_pad_rows = N + (NJ - 1) * TB      # megaw pads g by nh·TB on each side
    sten_slot = (R + 2 * K) * TB * NJ * TB * f
    need = (N * O2 * f + 2 * n_pad_rows * M * f + 2 * R * M * O2 * f
            + _MEGA_SLOTS * sten_slot + 2 * R * TB * M * f)
    return need <= _MEGA_VMEM_BUDGET


def _band_fused_mega_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, k_width,
                              precision):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    return pl.pallas_call(
        functools.partial(_fwd_mega_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2, nb=nb, nh=nh, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, O2), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, R + 2 * K, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(g, sten_band, wmat)


def _band_fused_mega_bwd_impl(dy, g, wmat, sten_band, tb, nh, n_rings,
                              k_width, precision):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    dg, dw = pl.pallas_call(
        functools.partial(_bwd_mega_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2, nb=nb, nh=nh, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, O2), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, R + 2 * K, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy, g, sten_band, wmat)
    return dg, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _band_fused_mega(g, wmat, sten_band, tb, nh, n_rings, k_width, precision):
    return _band_fused_mega_fwd_impl(g, wmat, sten_band, tb, nh, n_rings,
                                     k_width, precision)


def _band_fused_mega_fwd(g, wmat, sten_band, tb, nh, n_rings, k_width,
                         precision):
    y = _band_fused_mega_fwd_impl(g, wmat, sten_band, tb, nh, n_rings,
                                  k_width, precision)
    return y, (g, wmat, sten_band)


def _band_fused_mega_bwd(tb, nh, n_rings, k_width, precision, res, dy):
    g, wmat, sten_band = res
    dg, dw = _band_fused_mega_bwd_impl(dy, g, wmat, sten_band, tb, nh,
                                       n_rings, k_width, precision)
    return dg, dw, jnp.zeros_like(sten_band)


_band_fused_mega.defvjp(_band_fused_mega_fwd, _band_fused_mega_bwd)


# --- block-sparse band kernels ---------------------------------------------
#
# Same contraction as the dense band, but panel j of target block b reads
# source block nbr[b, j] (precomp.banded.BlockSparseTable) instead of
# b - nh + j: on real surface meshes RCM bandwidth grows ~sqrt(N), so the
# contiguous band's NJ = 2·ceil(bw/TB)+1 explodes (nh=25 at 163k vertices)
# while the actual number of touched source blocks stays small and
# constant.  Grid pipeline: nbr rides as a scalar-prefetch operand feeding
# the g BlockSpec index maps; mega pipeline: nbr sits in SMEM and feeds
# dynamic row slices.  Backward: per-(block, panel) dG partials are
# combined by a block-granular scatter-add over nbr (padding panels carry
# zero stencil, so their self-block adds are no-ops).


def _sparse_g_specs(TB, M, NJ):
    return [
        pl.BlockSpec(
            (TB, M),
            functools.partial(lambda b, nbr_ref, jj: (nbr_ref[b, jj], 0),
                              jj=j),
            memory_space=pltpu.VMEM,
        )
        for j in range(NJ)
    ]


def _sparse_sten_spec(R, K, TB, NJ):
    return pl.BlockSpec((1, R + 2 * K, TB, NJ * TB),
                        lambda b, nbr_ref: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_sparse_kernel(nbr_ref, *refs, **kw):
    _fwd_fused_kernel(*refs, **kw)


def _bwd_sparse_kernel(nbr_ref, *refs, **kw):
    _bwd_fused_kernel(*refs, **kw)


def _sparse_combine(parts, nbr, nb, NJ, TB, M):
    """Sum per-(block, panel) dG partials onto their owner blocks."""
    parts = parts.reshape(nb * NJ, TB, M)
    dg = jnp.zeros((nb, TB, M), parts.dtype).at[nbr.reshape(-1)].add(parts)
    return dg.reshape(nb * TB, M)


def _band_sparse_fwd_impl(g, wmat, sten_band, nbr, tb, n_rings, k_width,
                          precision):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = nbr.shape[1]
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB
    mxu = _mxu_dtype(precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=_sparse_g_specs(TB, M, NJ) + [
            _sparse_sten_spec(R, K, TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b, nbr_ref: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, O2), lambda b, nbr_ref: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_sparse_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2, mxu_dtype=mxu),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(nbr, *([g] * NJ), sten_band, wmat)


def _band_sparse_bwd_impl(dy, g, wmat, sten_band, nbr, tb, n_rings, k_width,
                          precision):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = nbr.shape[1]
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB
    mxu = _mxu_dtype(precision)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, O2), lambda b, nbr_ref: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + _sparse_g_specs(TB, M, NJ) + [
            _sparse_sten_spec(R, K, TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b, nbr_ref: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NJ * TB, M), lambda b, nbr_ref: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda b, nbr_ref: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
    )
    parts, dw = pl.pallas_call(
        functools.partial(_bwd_sparse_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2, mxu_dtype=mxu),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * NJ * TB, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(nbr, dy, *([g] * NJ), sten_band, wmat)
    dg = _sparse_combine(parts, nbr, nb, NJ, TB, M)
    return dg, dw


def _fwd_sparse_mega_kernel(g_ref, sten_hbm, w_ref, nbr_ref, out_ref,
                            slots, sems, contrib,
                            *, R, K, C, TB, NJ, O2, nb, n_slots=2,
                            mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)

    def compute(sl, b):
        sref = slots.at[sl]

        def get_gj(j, k):
            row0 = nbr_ref[b, j] * TB
            return g_ref[pl.ds(row0, TB), k * 2 * C:(k + 1) * 2 * C]

        _mega_contrib(get_gj, sref, contrib,
                      R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        y = jnp.zeros((TB, O2), jnp.float32)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            y += jnp.dot(cr, w_ref[r].astype(mxu_dtype),
                         preferred_element_type=jnp.float32)
        out_ref[pl.ds(b * TB, TB), :] = y

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _bwd_sparse_mega_kernel(dy_ref, g_ref, sten_hbm, w_ref, nbr_ref,
                            dg_ref, dw_ref, slots, sems, contrib, dcontrib,
                            *, R, K, C, TB, NJ, O2, nb, n_slots=2,
                            mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)
    C2 = 2 * C
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    dg_ref[:] = jnp.zeros_like(dg_ref)
    dw_ref[:] = jnp.zeros_like(dw_ref)

    def compute(sl, b):
        sref = slots.at[sl]

        def get_gj(j, k):
            row0 = nbr_ref[b, j] * TB
            return g_ref[pl.ds(row0, TB), k * C2:(k + 1) * C2]

        _mega_contrib(get_gj, sref, contrib,
                      R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        dy = dy_ref[pl.ds(b * TB, TB), :].astype(mxu_dtype)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            dw_ref[r] += jax.lax.dot_general(
                cr, dy, contract_rows, preferred_element_type=jnp.float32)
            dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
                dy, w_ref[r].astype(mxu_dtype), contract_cols,
                preferred_element_type=jnp.float32)
        for j in range(NJ):
            rs, f = _mega_planes(sref, R, j, TB)
            row0 = nbr_ref[b, j] * TB
            for k in range(K):
                fre, fim = f(k)
                s_re = (rs * fre[None]).reshape(R * TB, TB).astype(mxu_dtype)
                s_im = (rs * fim[None]).reshape(R * TB, TB).astype(mxu_dtype)
                d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
                p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                         preferred_element_type=jnp.float32)
                p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                         preferred_element_type=jnp.float32)
                dg_ref[pl.ds(row0, TB), (2 * k) * C:(2 * k + 1) * C] += \
                    p1[:, :C] + p2[:, C:]
                dg_ref[pl.ds(row0, TB), (2 * k + 1) * C:(2 * k + 2) * C] += \
                    p1[:, C:] - p2[:, :C]

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _band_sparse_mega_fwd_impl(g, wmat, sten_band, nbr, tb, n_rings,
                               k_width, precision):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = nbr.shape[1]
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    return pl.pallas_call(
        functools.partial(_fwd_sparse_mega_kernel, R=R, K=K, C=C, TB=TB,
                          NJ=NJ, O2=O2, nb=nb, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((N, O2), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, R + 2 * K, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(g, sten_band, wmat, nbr)


def _band_sparse_mega_bwd_impl(dy, g, wmat, sten_band, nbr, tb, n_rings,
                               k_width, precision):
    N, M = g.shape
    R, K, TB = n_rings, k_width, tb
    NJ = nbr.shape[1]
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    dg, dw = pl.pallas_call(
        functools.partial(_bwd_sparse_mega_kernel, R=R, K=K, C=C, TB=TB,
                          NJ=NJ, O2=O2, nb=nb, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, O2), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, R + 2 * K, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy, g, sten_band, wmat, nbr)
    return dg, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _band_sparse(g, wmat, sten_band, nbr, tb, n_rings, k_width, precision,
                 mega):
    impl = _band_sparse_mega_fwd_impl if mega else _band_sparse_fwd_impl
    return impl(g, wmat, sten_band, nbr, tb, n_rings, k_width, precision)


def _band_sparse_fwd(g, wmat, sten_band, nbr, tb, n_rings, k_width,
                     precision, mega):
    impl = _band_sparse_mega_fwd_impl if mega else _band_sparse_fwd_impl
    y = impl(g, wmat, sten_band, nbr, tb, n_rings, k_width, precision)
    return y, (g, wmat, sten_band, nbr)


def _band_sparse_bwd(tb, n_rings, k_width, precision, mega, res, dy):
    g, wmat, sten_band, nbr = res
    impl = _band_sparse_mega_bwd_impl if mega else _band_sparse_bwd_impl
    dg, dw = impl(dy, g, wmat, sten_band, nbr, tb, n_rings, k_width,
                  precision)
    d_nbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    return dg, dw, jnp.zeros_like(sten_band), d_nbr


_band_sparse.defvjp(_band_sparse_fwd, _band_sparse_bwd)


# --- compressed mega kernel: 5-plane stencil + manual DMA ------------------
#
# The mega fwd floor is the stencil HBM stream; the compressed layout cuts
# it 3.2x (5 planes vs R+2K) at the price of in-VMEM hat/phasor
# reconstruction.  Under the per-block grid pipeline that trade measured
# -25% (docs/KERNEL_NOTES.md step 5); under the mega pipeline the DMA
# saving dominates.


def _cmega_planes(sref, j, TB):
    sl = slice(j * TB, (j + 1) * TB)
    return (sref[0, :, sl], sref[1, :, sl], sref[2, :, sl],
            sref[3, :, sl], sref[4, :, sl])


def _cmega_contrib(get_gj, sref, contrib, *, R, B, C, TB, NJ, mxu_dtype):
    C2 = 2 * C
    contrib[:] = jnp.zeros_like(contrib)
    for j in range(NJ):
        rv, pr, pi, fr, fi = _cmega_planes(sref, j, TB)
        hats = _hats_from_r(rv, R)
        for k, f_re, f_im in _phasor_pairs(fr, fi, pr, pi, B):
            s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
            gj = get_gj(j, k).astype(mxu_dtype)
            pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
            contrib[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
            contrib[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]


def _fwd_cmega_kernel(g_ref, sten_hbm, w_ref, out_ref, slots, sems, contrib,
                      *, R, B, C, TB, NJ, O2, nb, nh, n_slots=2,
                      mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)

    def compute(sl, b):
        sref = slots.at[sl]
        _cmega_contrib(_gj_mega(g_ref, b, nh, nb, TB, 2 * C), sref, contrib,
                       R=R, B=B, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        y = jnp.zeros((TB, O2), jnp.float32)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            y += jnp.dot(cr, w_ref[r].astype(mxu_dtype),
                         preferred_element_type=jnp.float32)
        out_ref[pl.ds(b * TB, TB), :] = y

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _bwd_cmega_kernel(dy_ref, g_ref, sten_hbm, w_ref, dg_ref, dw_ref,
                      slots, sems, contrib, dcontrib,
                      *, R, B, C, TB, NJ, O2, nb, nh, n_slots=2,
                      mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)
    C2 = 2 * C
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    dg_ref[:] = jnp.zeros_like(dg_ref)
    dw_ref[:] = jnp.zeros_like(dw_ref)

    def compute(sl, b):
        sref = slots.at[sl]
        get_gj = _gj_mega(g_ref, b, nh, nb, TB, C2)
        _cmega_contrib(get_gj, sref, contrib,
                       R=R, B=B, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        dy = dy_ref[pl.ds(b * TB, TB), :].astype(mxu_dtype)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            dw_ref[r] += jax.lax.dot_general(
                cr, dy, contract_rows, preferred_element_type=jnp.float32)
            dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
                dy, w_ref[r].astype(mxu_dtype), contract_cols,
                preferred_element_type=jnp.float32)
        for j in range(NJ):
            rv, pr, pi, fr, fi = _cmega_planes(sref, j, TB)
            hats = _hats_from_r(rv, R)
            row0 = jnp.clip(b - nh + j, 0, nb - 1) * TB
            for k, f_re, f_im in _phasor_pairs(fr, fi, pr, pi, B):
                s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
                s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
                d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
                p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                         preferred_element_type=jnp.float32)
                p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                         preferred_element_type=jnp.float32)
                dg_ref[pl.ds(row0, TB), (2 * k) * C:(2 * k + 1) * C] += \
                    p1[:, :C] + p2[:, C:]
                dg_ref[pl.ds(row0, TB), (2 * k + 1) * C:(2 * k + 2) * C] += \
                    p1[:, C:] - p2[:, :C]

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _band_cmega_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, band_limit,
                         precision):
    N, M = g.shape
    R, B, TB = n_rings, band_limit, tb
    K = 2 * B + 1
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    return pl.pallas_call(
        functools.partial(_fwd_cmega_kernel, R=R, B=B, C=C, TB=TB, NJ=NJ,
                          O2=O2, nb=nb, nh=nh, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, O2), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, 5, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(g, sten_band, wmat)


def _band_cmega_bwd_impl(dy, g, wmat, sten_band, tb, nh, n_rings, band_limit,
                         precision):
    N, M = g.shape
    R, B, TB = n_rings, band_limit, tb
    K = 2 * B + 1
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    dg, dw = pl.pallas_call(
        functools.partial(_bwd_cmega_kernel, R=R, B=B, C=C, TB=TB, NJ=NJ,
                          O2=O2, nb=nb, nh=nh, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, O2), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, 5, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy, g, sten_band, wmat)
    return dg, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _band_cmega(g, wmat, sten_band, tb, nh, n_rings, band_limit, precision):
    return _band_cmega_fwd_impl(g, wmat, sten_band, tb, nh, n_rings,
                                band_limit, precision)


def _band_cmega_fwd(g, wmat, sten_band, tb, nh, n_rings, band_limit,
                    precision):
    y = _band_cmega_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, band_limit,
                             precision)
    return y, (g, wmat, sten_band)


def _band_cmega_bwd(tb, nh, n_rings, band_limit, precision, res, dy):
    g, wmat, sten_band = res
    dg, dw = _band_cmega_bwd_impl(dy, g, wmat, sten_band, tb, nh, n_rings,
                                  band_limit, precision)
    return dg, dw, jnp.zeros_like(sten_band)


_band_cmega.defvjp(_band_cmega_fwd, _band_cmega_bwd)


# --- compressed-stencil fused kernel ---------------------------------------
#
# 5 planes (r, e^{iθ}, wxp) instead of R+2K; radial hats and phasor powers
# rebuilt in VMEM.  ~3x smaller stencil memory footprint for large meshes;
# measured slower than the dense fused kernel on one chip (the VPU
# reconstruction outweighs the saved DMA), so it is opt-in.


def _ring_knots(R):
    import math

    return [math.sqrt(r / (R - 1)) for r in range(R)]


def _hats_from_r(rv, R):
    """Radial interpolation weights from normalised radius.

    rv: (TB, TB) in [0,1] (R_SENTINEL at empty slots).  Returns (R, TB, TB)
    matching stencil.radial_interpolant exactly on [0,1]: ring r's weight is
    the hat on knots (s_{r-1}, s_r, s_{r+1}) with virtual knots -1 and 2 at
    the ends (so rv=0 → ring0=1, rv=1 → ring_{R-1}=1, sentinel → all 0).
    """
    s = _ring_knots(R)
    hats = []
    for r in range(R):
        sl = s[r - 1] if r > 0 else -1.0
        sc = s[r]
        sr = s[r + 1] if r < R - 1 else 2.0
        up = (rv - sl) * (1.0 / (sc - sl))
        dn = (sr - rv) * (1.0 / (sr - sc))
        hats.append(jnp.clip(jnp.minimum(up, dn), 0.0, 1.0))
    return jnp.stack(hats, axis=0)


def _phasor_pairs(fr, fi, pr, pi, B):
    """Yield (column k+B, f_re, f_im) for f_k = wxp·e^{ikθ}, k=-B..B,
    built by repeated multiplication with the unit phasor (pr, pi)."""
    out = [(B, fr, fi)]
    cp = (fr, fi)
    cm = (fr, fi)
    for kk in range(1, B + 1):
        cp = (cp[0] * pr - cp[1] * pi, cp[0] * pi + cp[1] * pr)
        cm = (cm[0] * pr + cm[1] * pi, cm[1] * pr - cm[0] * pi)
        out.append((B + kk, cp[0], cp[1]))
        out.append((B - kk, cm[0], cm[1]))
    return out


def _csten_planes(sten_ref, j, TB):
    """Compressed block planes: (r, ph_re, ph_im, wxp_re, wxp_im)."""
    sl = slice(j * TB, (j + 1) * TB)
    return (sten_ref[0, 0, :, sl], sten_ref[0, 1, :, sl],
            sten_ref[0, 2, :, sl], sten_ref[0, 3, :, sl],
            sten_ref[0, 4, :, sl])


def _cfused_accum_contrib(g_refs, sten_ref, contrib, *, R, B, C, TB, NJ,
                          mxu_dtype):
    """contrib[:] = the block's (R·TB, K·2C) contribution tensor, rebuilt
    from the compressed planes."""
    C2 = 2 * C
    contrib[:] = jnp.zeros_like(contrib)
    for j in range(NJ):
        rv, pr, pi, fr, fi = _csten_planes(sten_ref, j, TB)
        hats = _hats_from_r(rv, R)                             # (R, TB, TB)
        gj_full = g_refs[j]
        for k, f_re, f_im in _phasor_pairs(fr, fi, pr, pi, B):
            s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
            gj = gj_full[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
            pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
            contrib[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
            contrib[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]


def _fwd_cfused_kernel(*refs, R, B, C, TB, NJ, O2, mxu_dtype=jnp.float32):
    g_refs = refs[:NJ]
    sten_ref, w_ref, out_ref, contrib = refs[NJ:NJ + 4]
    _cfused_accum_contrib(g_refs, sten_ref, contrib,
                          R=R, B=B, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
    y = jnp.zeros((TB, O2), jnp.float32)
    for r in range(R):
        cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
        y += jnp.dot(cr, w_ref[r].astype(mxu_dtype),
                     preferred_element_type=jnp.float32)
    out_ref[:] = y


def _bwd_cfused_kernel(*refs, R, B, C, TB, NJ, O2, mxu_dtype=jnp.float32):
    dy_ref = refs[0]
    g_refs = refs[1:1 + NJ]
    sten_ref, w_ref = refs[1 + NJ:3 + NJ]
    part_ref, dw_ref = refs[3 + NJ:5 + NJ]
    contrib, dcontrib = refs[5 + NJ:7 + NJ]
    C2 = 2 * C

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dy = dy_ref[:].astype(mxu_dtype)
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))
    for r in range(R):
        dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
            dy, w_ref[r].astype(mxu_dtype), contract_cols,
            preferred_element_type=jnp.float32)

    contrib[:] = jnp.zeros_like(contrib)
    for j in range(NJ):
        rv, pr, pi, fr, fi = _csten_planes(sten_ref, j, TB)
        hats = _hats_from_r(rv, R)
        gj_full = g_refs[j]
        for k, f_re, f_im in _phasor_pairs(fr, fi, pr, pi, B):
            s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
            # contrib recompute (for dW)
            gj = gj_full[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
            pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
            contrib[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
            contrib[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]
            # transposed contraction -> dG partials for this (j, k)
            d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
            p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            part_ref[j * TB:(j + 1) * TB, (2 * k) * C:(2 * k + 1) * C] = \
                p1[:, :C] + p2[:, C:]
            part_ref[j * TB:(j + 1) * TB, (2 * k + 1) * C:(2 * k + 2) * C] = \
                p1[:, C:] - p2[:, :C]

    for r in range(R):
        cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
        dw_ref[r] += jax.lax.dot_general(
            cr, dy, contract_rows, preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _band_cfused(g, wmat, sten_band, tb, nh, n_rings, band_limit, precision):
    return _band_cfused_fwd_impl(g, wmat, sten_band, tb, nh, n_rings,
                                 band_limit, precision)


def _csten_spec(TB, NJ):
    return pl.BlockSpec((1, 5, TB, NJ * TB), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _band_cfused_fwd_impl(g, wmat, sten_band, tb, nh, n_rings, band_limit,
                          precision):
    N, M = g.shape
    R, B, TB = n_rings, band_limit, tb
    K = 2 * B + 1
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    return pl.pallas_call(
        functools.partial(_fwd_cfused_kernel, R=R, B=B, C=C, TB=TB, NJ=NJ,
                          O2=O2, mxu_dtype=_mxu_dtype(precision)),
        grid=(nb,),
        in_specs=_g_specs(nb, nh, TB, M) + [
            _csten_spec(TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, O2), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*([g] * NJ), sten_band, wmat)


def _band_cfused_fwd(g, wmat, sten_band, tb, nh, n_rings, band_limit,
                     precision):
    y = _band_cfused_fwd_impl(g, wmat, sten_band, tb, nh, n_rings,
                              band_limit, precision)
    return y, (g, wmat, sten_band)


def _band_cfused_bwd(tb, nh, n_rings, band_limit, precision, res, dy):
    g, wmat, sten_band = res
    N, M = g.shape
    R, B, TB = n_rings, band_limit, tb
    K = 2 * B + 1
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N // TB

    parts, dw = pl.pallas_call(
        functools.partial(_bwd_cfused_kernel, R=R, B=B, C=C, TB=TB, NJ=NJ,
                          O2=O2, mxu_dtype=_mxu_dtype(precision)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, O2), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + _g_specs(nb, nh, TB, M) + [
            _csten_spec(TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NJ * TB, M), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * NJ * TB, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy, *([g] * NJ), sten_band, wmat)

    dg = _shift_combine(parts, nb, NJ, nh, TB, M)
    return dg, dw, jnp.zeros_like(sten_band)


_band_cfused.defvjp(_band_cfused_fwd, _band_cfused_bwd)


# --- wide mega kernel: window-contiguous g, one matmul per (block, k) ------
#
# The classic kernels issue K x NJ x 2 small (R·TB, TB) x (TB, 2C) matmuls
# per block — 30 dispatches of MXU-underutilising shapes at bench config
# (C2=64 output columns = half the lanes).  Here g is PADDED with nh zero
# blocks on each side (XLA pad outside the kernel; its transpose is a
# slice), so block b's NJ source blocks are ONE contiguous row window
# g_pad[b·TB : b·TB + NJ·TB] and the whole-slot contraction becomes a
# single (2·R·TB, NJ·TB) x (NJ·TB, 2C) matmul per k — the s_re/s_im row
# stack shares the window fetch, and the full-width (R, TB, W') elementwise
# stencil products replace NJ per-panel ones.  Backward: the transposed
# matmul emits the window's dG rows contiguously; serial read-modify-write
# into the padded dG buffer (overlapping windows), pads sliced off outside.


def _mega_contrib_wide(g_ref, b, sref, contrib, *, R, K, C, TB, NJ,
                       mxu_dtype):
    C2 = 2 * C
    Wp = NJ * TB
    rs_full = sref[:R]                            # (R, TB, W')
    gw_all = g_ref[pl.ds(b * TB, Wp), :]          # (W', K·C2) window (padded)
    for k in range(K):
        fre = sref[R + 2 * k]                     # (TB, W')
        fim = sref[R + 2 * k + 1]
        s_re = (rs_full * fre[None]).reshape(R * TB, Wp)
        s_im = (rs_full * fim[None]).reshape(R * TB, Wp)
        s_both = jnp.concatenate([s_re, s_im], 0).astype(mxu_dtype)
        gw = gw_all[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        acc = jnp.dot(s_both, gw, preferred_element_type=jnp.float32)
        acc_a, acc_b = acc[:R * TB], acc[R * TB:]
        contrib[:, (2 * k) * C:(2 * k + 1) * C] = acc_a[:, :C] - acc_b[:, C:]
        contrib[:, (2 * k + 1) * C:(2 * k + 2) * C] = \
            acc_a[:, C:] + acc_b[:, :C]


def _fwd_megaw_kernel(g_ref, sten_hbm, w_ref, out_ref, slots, sems, contrib,
                      *, R, K, C, TB, NJ, O2, nb, n_slots=2,
                      mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)

    def compute(sl, b):
        sref = slots.at[sl]
        _mega_contrib_wide(g_ref, b, sref, contrib,
                           R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        y = jnp.zeros((TB, O2), jnp.float32)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            y += jnp.dot(cr, w_ref[r].astype(mxu_dtype),
                         preferred_element_type=jnp.float32)
        out_ref[pl.ds(b * TB, TB), :] = y

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _bwd_megaw_kernel(dy_ref, g_ref, sten_hbm, w_ref, dg_ref, dw_ref,
                      slots, sems, contrib, dcontrib,
                      *, R, K, C, TB, NJ, O2, nb, n_slots=2,
                      mxu_dtype=jnp.float32):
    start, wait = _mega_sten_io(sten_hbm, slots, sems)
    C2 = 2 * C
    Wp = NJ * TB
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    dg_ref[:] = jnp.zeros_like(dg_ref)
    dw_ref[:] = jnp.zeros_like(dw_ref)

    def compute(sl, b):
        sref = slots.at[sl]
        _mega_contrib_wide(g_ref, b, sref, contrib,
                           R=R, K=K, C=C, TB=TB, NJ=NJ, mxu_dtype=mxu_dtype)
        dy = dy_ref[pl.ds(b * TB, TB), :].astype(mxu_dtype)
        for r in range(R):
            cr = contrib[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            dw_ref[r] += jax.lax.dot_general(
                cr, dy, contract_rows, preferred_element_type=jnp.float32)
            dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
                dy, w_ref[r].astype(mxu_dtype), contract_cols,
                preferred_element_type=jnp.float32)
        rs_full = sref[:R]
        for k in range(K):
            fre = sref[R + 2 * k]
            fim = sref[R + 2 * k + 1]
            s_re = (rs_full * fre[None]).reshape(R * TB, Wp)
            s_im = (rs_full * fim[None]).reshape(R * TB, Wp)
            s_both = jnp.concatenate([s_re, s_im], 0).astype(mxu_dtype)
            d_re = dcontrib[:, (2 * k) * C:(2 * k + 1) * C]
            d_im = dcontrib[:, (2 * k + 1) * C:(2 * k + 2) * C]
            # dg_win = s_reᵀ[d_re|d_im] + s_imᵀ[d_im|−d_re]
            d_cat = jnp.concatenate([
                jnp.concatenate([d_re, d_im], 1),
                jnp.concatenate([d_im, -d_re], 1)], 0).astype(mxu_dtype)
            dg_win = jax.lax.dot_general(
                s_both, d_cat, contract_rows,
                preferred_element_type=jnp.float32)          # (W', C2·... )
            dg_ref[pl.ds(b * TB, Wp), k * C2:(k + 1) * C2] += dg_win

    _mega_loop(nb, start, wait, compute, n_slots=n_slots)


def _band_megaw_fwd_impl(gp, wmat, sten_band, tb, nh, n_rings, k_width,
                         precision):
    Np, M = gp.shape                 # padded rows: N + 2·nh·TB
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    N = Np - 2 * nh * TB
    nb = N // TB

    return pl.pallas_call(
        functools.partial(_fwd_megaw_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2, nb=nb, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((Np, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, O2), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, R + 2 * K, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(gp, sten_band, wmat)


def _band_megaw_bwd_impl(dy, gp, wmat, sten_band, tb, nh, n_rings, k_width,
                         precision):
    Np, M = gp.shape
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    N = Np - 2 * nh * TB
    nb = N // TB

    dgp, dw = pl.pallas_call(
        functools.partial(_bwd_megaw_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2, nb=nb, n_slots=_MEGA_SLOTS,
                          mxu_dtype=_mxu_dtype(precision)),
        in_specs=[
            pl.BlockSpec((N, O2), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Np, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Np, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_MEGA_SLOTS, R + 2 * K, TB, NJ * TB), jnp.float32),
            pltpu.SemaphoreType.DMA((_MEGA_SLOTS,)),
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy, gp, sten_band, wmat)
    return dgp, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _band_fused_megaw(g, wmat, sten_band, tb, nh, n_rings, k_width,
                      precision):
    y, _ = _band_fused_megaw_fwd(g, wmat, sten_band, tb, nh, n_rings,
                                 k_width, precision)
    return y


def _band_fused_megaw_fwd(g, wmat, sten_band, tb, nh, n_rings, k_width,
                          precision):
    pad = nh * tb
    gp = jnp.pad(g, ((pad, pad), (0, 0)))
    y = _band_megaw_fwd_impl(gp, wmat, sten_band, tb, nh, n_rings, k_width,
                             precision)
    return y, (gp, wmat, sten_band)


def _band_fused_megaw_bwd(tb, nh, n_rings, k_width, precision, res, dy):
    gp, wmat, sten_band = res
    dgp, dw = _band_megaw_bwd_impl(dy, gp, wmat, sten_band, tb, nh, n_rings,
                                   k_width, precision)
    pad = nh * tb
    dg = dgp[pad:dgp.shape[0] - pad]
    return dg, dw, jnp.zeros_like(sten_band)


_band_fused_megaw.defvjp(_band_fused_megaw_fwd, _band_fused_megaw_bwd)


# --- panel-CSR kernels ------------------------------------------------------
#
# The scalable layout for 100k+-vertex meshes (precomp.banded.PanelTable):
# the grid runs over (target-block, source-block) PANELS instead of target
# blocks, so stencil memory and MXU work scale with the actual panel count
# rather than nb x max-neighbor-blocks.  Forward: panels sorted by target;
# each block's contrib accumulates in VMEM scratch between its first/last
# panels, and the fused W contraction fires once at `last`.  Backward: a
# SECOND panel ordering sorted by source block lets the transposed
# contraction accumulate each source block's dG in scratch and write it
# directly — no (P, TB, M) parts tensor, no scatter-add combine (the
# "by-source backward grid" design from docs/KERNEL_NOTES.md).  dW
# decomposes per panel (contrib is a sum of panel partials), so it
# accumulates in a revisited output block like the other fused backwards.


def _panel_pairs(sten_ref, *, R, K, B, compressed, j=0):
    """(k, f_re, f_im) angular factors + radial hats of panel j of a
    (CH, planes, TB, TB) stencil block.

    Planes are cast to f32 on read: panel stencils may be stored bf16
    (cast_panel_sten — halves the dominant DMA stream and the multi-GB
    HBM footprint; ~1e-3 relative stencil quantisation, the same class
    as the tiled-VHM truncation measured training-free in
    docs/KERNEL_NOTES.md).  The cast is a no-op for f32 tables."""
    f32 = jnp.float32
    if compressed:
        rv = sten_ref[j, 0].astype(f32)
        hats = _hats_from_r(rv, R)
        pairs = _phasor_pairs(sten_ref[j, 3].astype(f32),
                              sten_ref[j, 4].astype(f32),
                              sten_ref[j, 1].astype(f32),
                              sten_ref[j, 2].astype(f32), B)
    else:
        hats = sten_ref[j, :R].astype(f32)
        pairs = [(k, sten_ref[j, R + 2 * k].astype(f32),
                  sten_ref[j, R + 2 * k + 1].astype(f32))
                 for k in range(K)]
    return hats, pairs


def _panel_accum(g_ref, sten_ref, contrib, *, R, K, B, C, TB, compressed,
                 mxu_dtype, j=0):
    """contrib += panel j's partial (R*TB, K*2C) contribution."""
    C2 = 2 * C
    hats, pairs = _panel_pairs(sten_ref, R=R, K=K, B=B, compressed=compressed,
                               j=j)
    for k, f_re, f_im in pairs:
        s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
        s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
        gj = g_ref[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
        pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        contrib[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
        contrib[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]


def _fwd_panel_kernel(meta_ref, g_ref, sten_ref, w_ref, out_ref, contrib,
                      *, R, K, B, C, TB, O2, compressed,
                      mxu_dtype=jnp.float32):
    p = pl.program_id(0)

    @pl.when(meta_ref[2, p] == 1)
    def _():
        contrib[:] = jnp.zeros_like(contrib)

    _panel_accum(g_ref, sten_ref, contrib, R=R, K=K, B=B, C=C, TB=TB,
                 compressed=compressed, mxu_dtype=mxu_dtype)

    @pl.when(meta_ref[3, p] == 1)
    def _():
        _apply_w(contrib, w_ref, out_ref, R=R, TB=TB, O2=O2,
                 mxu_dtype=mxu_dtype)


def _bwd_panel_kernel(meta_s_ref, dy_ref, g_ref, sten_ref, w_ref,
                      dg_ref, dw_ref, dcontrib, pc, dg_acc,
                      *, R, K, B, C, TB, O2, compressed,
                      mxu_dtype=jnp.float32):
    p = pl.program_id(0)
    C2 = 2 * C
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    @pl.when(p == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    flags = meta_s_ref[3, p]           # first_s + 2*last_s

    @pl.when(flags % 2 == 1)
    def _():
        dg_acc[:] = jnp.zeros_like(dg_acc)

    # dcontrib of this panel's TARGET block: per-ring dy @ W^T
    dy = dy_ref[:].astype(mxu_dtype)                        # (TB, O2)
    for r in range(R):
        dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
            dy, w_ref[r].astype(mxu_dtype), contract_cols,
            preferred_element_type=jnp.float32)

    pc[:] = jnp.zeros_like(pc)
    hats, pairs = _panel_pairs(sten_ref, R=R, K=K, B=B, compressed=compressed)
    for k, f_re, f_im in pairs:
        s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
        s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
        # panel partial contrib (for dW)
        gj = g_ref[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
        pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        pc[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
        pc[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]
        # transposed contraction -> dG partial of this panel's SOURCE block
        d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                 preferred_element_type=jnp.float32)
        p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                 preferred_element_type=jnp.float32)
        dg_acc[:, (2 * k) * C:(2 * k + 1) * C] += p1[:, :C] + p2[:, C:]
        dg_acc[:, (2 * k + 1) * C:(2 * k + 2) * C] += p1[:, C:] - p2[:, :C]

    for r in range(R):
        cr = pc[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
        dw_ref[r] += jax.lax.dot_general(
            cr, dy, contract_rows, preferred_element_type=jnp.float32)

    @pl.when(flags >= 2)
    def _():
        dg_ref[:] = dg_acc[:]


def _panel_sten_spec(planes, TB):
    return pl.BlockSpec((1, planes, TB, TB),
                        lambda p, m: (m[0, p], 0, 0, 0),
                        memory_space=pltpu.VMEM)


# --- chunked panel kernels: CH panels per grid step -------------------------
#
# At 163k vertices the panel grid runs ~17k steps and per-step pipeline
# overhead dominates the fwd+bwd step (docs/KERNEL_NOTES.md).  The builder
# pads every target group (fwd) and source group (bwd) to a multiple of
# `chunk` with zero panels, so each grid step processes CH panels of ONE
# group: the first/last flags of the chunk's first/last panels drive the
# scratch accumulation exactly as in the unchunked kernels.


def _fwd_panel_chunk_kernel(meta_ref, *refs, R, K, B, C, TB, O2, CH,
                            compressed, mxu_dtype=jnp.float32):
    g_refs = refs[:CH]
    sten_ref, w_ref, out_ref, contrib = refs[CH:CH + 4]
    p = pl.program_id(0)
    base = p * CH

    @pl.when(meta_ref[2, base] == 1)
    def _():
        contrib[:] = jnp.zeros_like(contrib)

    for j in range(CH):
        _panel_accum(g_refs[j], sten_ref, contrib, R=R, K=K, B=B, C=C,
                     TB=TB, compressed=compressed, mxu_dtype=mxu_dtype, j=j)

    @pl.when(meta_ref[3, base + CH - 1] == 1)
    def _():
        _apply_w(contrib, w_ref, out_ref, R=R, TB=TB, O2=O2,
                 mxu_dtype=mxu_dtype)


def _bwd_panel_chunk_kernel(meta_s_ref, *refs, R, K, B, C, TB, O2, CH,
                            compressed, mxu_dtype=jnp.float32):
    dy_refs = refs[:CH]
    g_refs = refs[CH:2 * CH]
    sten_refs = refs[2 * CH:3 * CH]
    w_ref, dg_ref, dw_ref = refs[3 * CH:3 * CH + 3]
    dcontrib, pc, dg_acc = refs[3 * CH + 3:3 * CH + 6]
    p = pl.program_id(0)
    base = p * CH
    C2 = 2 * C
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    @pl.when(p == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(meta_s_ref[3, base] % 2 == 1)
    def _():
        dg_acc[:] = jnp.zeros_like(dg_acc)

    for j in range(CH):
        dy = dy_refs[j][:].astype(mxu_dtype)
        for r in range(R):
            dcontrib[r * TB:(r + 1) * TB, :] = jax.lax.dot_general(
                dy, w_ref[r].astype(mxu_dtype), contract_cols,
                preferred_element_type=jnp.float32)
        pc[:] = jnp.zeros_like(pc)
        hats, pairs = _panel_pairs(sten_refs[j], R=R, K=K, B=B,
                                   compressed=compressed, j=0)
        for k, f_re, f_im in pairs:
            s_re = (hats * f_re[None]).reshape(R * TB, TB).astype(mxu_dtype)
            s_im = (hats * f_im[None]).reshape(R * TB, TB).astype(mxu_dtype)
            gj = g_refs[j][:, k * C2:(k + 1) * C2].astype(mxu_dtype)
            pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
            pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
            pc[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
            pc[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]
            d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
            p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                     preferred_element_type=jnp.float32)
            dg_acc[:, (2 * k) * C:(2 * k + 1) * C] += p1[:, :C] + p2[:, C:]
            dg_acc[:, (2 * k + 1) * C:(2 * k + 2) * C] += \
                p1[:, C:] - p2[:, :C]
        for r in range(R):
            cr = pc[r * TB:(r + 1) * TB, :].astype(mxu_dtype)
            dw_ref[r] += jax.lax.dot_general(
                cr, dy, contract_rows, preferred_element_type=jnp.float32)

    @pl.when(meta_s_ref[3, base + CH - 1] >= 2)
    def _():
        dg_ref[:] = dg_acc[:]


# --- compact-layout conv kernels (rectangular (TBT, TBS) panels) -----------
#
# The conv counterpart of the compact ECHO/lift layout: gathered source
# columns, per-panel disjoint dG writes + one segment_sum.  Measured to
# decide whether the conv should also leave the block panels (the a-priori
# analysis says the M-wide gather + segment_sum eats most of the win at
# C=32 — docs/KERNEL_NOTES.md r4); kept as an explicit routing so the
# question is answered by numbers, not analysis.


def _panel_accum_rect(g_ref, sten_ref, contrib, *, R, K, B, C, TBT, TBS,
                      compressed, mxu_dtype):
    """contrib += this (TBT, TBS) panel's partial (R*TBT, K*2C)."""
    C2 = 2 * C
    hats, pairs = _panel_pairs(sten_ref, R=R, K=K, B=B,
                               compressed=compressed)
    for k, f_re, f_im in pairs:
        s_re = (hats * f_re[None]).reshape(R * TBT, TBS).astype(mxu_dtype)
        s_im = (hats * f_im[None]).reshape(R * TBT, TBS).astype(mxu_dtype)
        gj = g_ref[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
        pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        contrib[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
        contrib[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]


def _fwd_compact_kernel(meta_ref, g_ref, sten_ref, w_ref, out_ref, contrib,
                        *, R, K, B, C, TBT, TBS, O2, compressed,
                        mxu_dtype=jnp.float32):
    p = pl.program_id(0)

    @pl.when(meta_ref[2, p] == 1)
    def _():
        contrib[:] = jnp.zeros_like(contrib)

    _panel_accum_rect(g_ref, sten_ref, contrib, R=R, K=K, B=B, C=C,
                      TBT=TBT, TBS=TBS, compressed=compressed,
                      mxu_dtype=mxu_dtype)

    @pl.when(meta_ref[3, p] == 1)
    def _():
        _apply_w(contrib, w_ref, out_ref, R=R, TB=TBT, O2=O2,
                 mxu_dtype=mxu_dtype)


def _bwd_compact_kernel(meta_ref, dy_ref, g_ref, sten_ref, w_ref,
                        dg_ref, dw_ref, dcontrib, pc,
                        *, R, K, B, C, TBT, TBS, O2, compressed,
                        mxu_dtype=jnp.float32):
    """Per-panel direct dG writes (gathered columns are disjoint — no
    by-source grid, no accumulator); dW accumulated over the grid."""
    p = pl.program_id(0)
    C2 = 2 * C
    contract_cols = (((1,), (1,)), ((), ()))
    contract_rows = (((0,), (0,)), ((), ()))

    @pl.when(p == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dy = dy_ref[:].astype(mxu_dtype)                        # (TBT, O2)
    for r in range(R):
        dcontrib[r * TBT:(r + 1) * TBT, :] = jax.lax.dot_general(
            dy, w_ref[r].astype(mxu_dtype), contract_cols,
            preferred_element_type=jnp.float32)

    pc[:] = jnp.zeros_like(pc)
    hats, pairs = _panel_pairs(sten_ref, R=R, K=K, B=B,
                               compressed=compressed)
    for k, f_re, f_im in pairs:
        s_re = (hats * f_re[None]).reshape(R * TBT, TBS).astype(mxu_dtype)
        s_im = (hats * f_im[None]).reshape(R * TBT, TBS).astype(mxu_dtype)
        gj = g_ref[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        pa = jnp.dot(s_re, gj, preferred_element_type=jnp.float32)
        pb = jnp.dot(s_im, gj, preferred_element_type=jnp.float32)
        pc[:, (2 * k) * C:(2 * k + 1) * C] += pa[:, :C] - pb[:, C:]
        pc[:, (2 * k + 1) * C:(2 * k + 2) * C] += pa[:, C:] + pb[:, :C]
        d_both = dcontrib[:, k * C2:(k + 1) * C2].astype(mxu_dtype)
        p1 = jax.lax.dot_general(s_re, d_both, contract_rows,
                                 preferred_element_type=jnp.float32)
        p2 = jax.lax.dot_general(s_im, d_both, contract_rows,
                                 preferred_element_type=jnp.float32)
        dg_ref[:, (2 * k) * C:(2 * k + 1) * C] = p1[:, :C] + p2[:, C:]
        dg_ref[:, (2 * k + 1) * C:(2 * k + 2) * C] = p1[:, C:] - p2[:, :C]

    for r in range(R):
        cr = pc[r * TBT:(r + 1) * TBT, :].astype(mxu_dtype)
        dw_ref[r] += jax.lax.dot_general(
            cr, dy, contract_rows, preferred_element_type=jnp.float32)


def _band_compact_fwd_impl(gg, wmat, sten, meta, tbt, tbs, n_rings,
                           band_limit, compressed, precision, n_out):
    M = gg.shape[1]
    R, B = n_rings, band_limit
    K = 2 * B + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    P, planes = sten.shape[0], sten.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((tbs, M), lambda p, m: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, tbt, tbs), lambda p, m: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tbt, O2), lambda p, m: (m[0, p], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R * tbt, M), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_compact_kernel, R=R, K=K, B=B, C=C, TBT=tbt,
                          TBS=tbs, O2=O2, compressed=compressed,
                          mxu_dtype=_mxu_dtype(precision)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, O2), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta, gg, sten, wmat)


def _band_compact_bwd_impl(dy, gg, wmat, sten, meta, tbt, tbs, n_rings,
                           band_limit, compressed, precision):
    M = gg.shape[1]
    R, B = n_rings, band_limit
    K = 2 * B + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    P, planes = sten.shape[0], sten.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((tbt, O2), lambda p, m: (m[0, p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbs, M), lambda p, m: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, tbt, tbs), lambda p, m: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tbs, M), lambda p, m: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((R * tbt, M), jnp.float32),
                        pltpu.VMEM((R * tbt, M), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_bwd_compact_kernel, R=R, K=K, B=B, C=C, TBT=tbt,
                          TBS=tbs, O2=O2, compressed=compressed,
                          mxu_dtype=_mxu_dtype(precision)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P * tbs, M), jnp.float32),
                   jax.ShapeDtypeStruct(wmat.shape, jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta, dy, gg, sten, wmat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _band_compact(g, wmat, sten, meta, src_flat, tbt, tbs, n_rings,
                  band_limit, compressed, precision, n_out):
    gg = jnp.take(g, src_flat, axis=0)
    return _band_compact_fwd_impl(gg, wmat, sten, meta, tbt, tbs, n_rings,
                                  band_limit, compressed, precision, n_out)


def _band_compact_fwd(g, wmat, sten, meta, src_flat, tbt, tbs, n_rings,
                      band_limit, compressed, precision, n_out):
    y = _band_compact(g, wmat, sten, meta, src_flat, tbt, tbs, n_rings,
                      band_limit, compressed, precision, n_out)
    return y, (g, wmat, sten, meta, src_flat)


def _band_compact_bwd(tbt, tbs, n_rings, band_limit, compressed, precision,
                      n_out, res, dy):
    g, wmat, sten, meta, src_flat = res
    gg = jnp.take(g, src_flat, axis=0)
    dgg, dw = _band_compact_bwd_impl(dy, gg, wmat, sten, meta, tbt, tbs,
                                     n_rings, band_limit, compressed,
                                     precision)
    dg = jax.ops.segment_sum(dgg, src_flat, num_segments=g.shape[0])
    zero_meta = np.zeros(meta.shape, dtype=jax.dtypes.float0)
    zero_idx = np.zeros(src_flat.shape, dtype=jax.dtypes.float0)
    return dg, dw, jnp.zeros_like(sten), zero_meta, zero_idx


_band_compact.defvjp(_band_compact_fwd, _band_compact_bwd)


def _band_panel_fwd_impl(g, wmat, sten, meta, tb, n_rings, band_limit,
                         compressed, precision, n_out=None, chunk=1):
    N, M = g.shape
    R, B, TB = n_rings, band_limit, tb
    K = 2 * B + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    P, planes = sten.shape[0], sten.shape[1]
    n_out = N if n_out is None else n_out

    if chunk > 1:
        CH = chunk
        g_specs = [
            pl.BlockSpec(
                (TB, M),
                functools.partial(
                    lambda p, m, jj: (m[1, p * CH + jj], 0), jj=j),
                memory_space=pltpu.VMEM)
            for j in range(CH)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P // CH,),
            in_specs=g_specs + [
                pl.BlockSpec((CH, planes, TB, TB),
                             lambda p, m: (p, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, O2),
                                   lambda p, m: (m[0, p * CH], 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_fwd_panel_chunk_kernel, R=R, K=K, B=B, C=C,
                              TB=TB, O2=O2, CH=CH, compressed=compressed,
                              mxu_dtype=_mxu_dtype(precision)),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, O2), jnp.float32),
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(meta, *([g] * CH), sten, wmat)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((TB, M), lambda p, m: (m[1, p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, planes, TB, TB), lambda p, m: (p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, O2), lambda p, m: (m[0, p], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_panel_kernel, R=R, K=K, B=B, C=C, TB=TB,
                          O2=O2, compressed=compressed,
                          mxu_dtype=_mxu_dtype(precision)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, O2), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta, g, sten, wmat)


def _band_panel_bwd_impl(dy, g, wmat, sten, meta_s, coverage, tb, n_rings,
                         band_limit, compressed, precision, chunk=1):
    N, M = g.shape
    R, B, TB = n_rings, band_limit, tb
    K = 2 * B + 1
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    P, planes = sten.shape[0], sten.shape[1]
    Ps = meta_s.shape[1]

    if chunk > 1:
        CH = chunk

        def spec_dy(j):
            return pl.BlockSpec(
                (TB, O2),
                functools.partial(
                    lambda p, m, jj: (m[1, p * CH + jj], 0), jj=j),
                memory_space=pltpu.VMEM)

        def spec_g(j):
            return pl.BlockSpec(
                (TB, M),
                functools.partial(
                    lambda p, m, jj: (m[2, p * CH + jj], 0), jj=j),
                memory_space=pltpu.VMEM)

        def spec_sten(j):
            return pl.BlockSpec(
                (1, planes, TB, TB),
                functools.partial(
                    lambda p, m, jj: (m[0, p * CH + jj], 0, 0, 0), jj=j),
                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Ps // CH,),
            in_specs=[spec_dy(j) for j in range(CH)]
            + [spec_g(j) for j in range(CH)]
            + [spec_sten(j) for j in range(CH)]
            + [pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((TB, M), lambda p, m: (m[2, p * CH], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((R * TB, M), jnp.float32),
                pltpu.VMEM((R * TB, M), jnp.float32),
                pltpu.VMEM((TB, M), jnp.float32),
            ],
        )
        dg, dw = pl.pallas_call(
            functools.partial(_bwd_panel_chunk_kernel, R=R, K=K, B=B, C=C,
                              TB=TB, O2=O2, CH=CH, compressed=compressed,
                              mxu_dtype=_mxu_dtype(precision)),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((N, M), jnp.float32),
                jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
            ],
            interpret=_interpret(),
            compiler_params=_compiler_params(),
        )(meta_s, *([dy] * CH), *([g] * CH), *([sten] * CH), wmat)
        if coverage is not None:
            rows = jnp.repeat(coverage, TB)[:, None]
            dg = jnp.where(rows > 0, dg, 0.0)
        return dg, dw

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((TB, O2), lambda p, m: (m[1, p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, M), lambda p, m: (m[2, p], 0),
                         memory_space=pltpu.VMEM),
            _panel_sten_spec(planes, TB),
            pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, M), lambda p, m: (m[2, p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda p, m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((TB, M), jnp.float32),
        ],
    )
    dg, dw = pl.pallas_call(
        functools.partial(_bwd_panel_kernel, R=R, K=K, B=B, C=C, TB=TB,
                          O2=O2, compressed=compressed,
                          mxu_dtype=_mxu_dtype(precision)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(meta_s, dy, g, sten, wmat)
    if coverage is not None:
        # blocks with no panel on this shard are never written by the
        # by-source grid — their buffer rows are undefined; zero them
        # (jnp.where, so even NaN garbage is killed)
        rows = jnp.repeat(coverage, TB)[:, None]
        dg = jnp.where(rows > 0, dg, 0.0)
    return dg, dw


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _band_panel(g, wmat, sten, meta, meta_s, coverage, tb, n_rings,
                band_limit, compressed, precision, n_out=None, chunk=1):
    return _band_panel_fwd_impl(g, wmat, sten, meta, tb, n_rings, band_limit,
                                compressed, precision, n_out, chunk)


def _band_panel_fwd(g, wmat, sten, meta, meta_s, coverage, tb, n_rings,
                    band_limit, compressed, precision, n_out=None, chunk=1):
    y = _band_panel_fwd_impl(g, wmat, sten, meta, tb, n_rings, band_limit,
                             compressed, precision, n_out, chunk)
    return y, (g, wmat, sten, meta, meta_s, coverage)


def _band_panel_bwd(tb, n_rings, band_limit, compressed, precision, n_out,
                    chunk, res, dy):
    g, wmat, sten, meta, meta_s, coverage = res
    dg, dw = _band_panel_bwd_impl(dy, g, wmat, sten, meta_s, coverage, tb,
                                  n_rings, band_limit, compressed, precision,
                                  chunk)
    # meta and meta_s have different panel counts when chunk > 1 (the fwd
    # grid pads target groups, the bwd grid source groups) — each float0
    # cotangent must carry its own primal's shape
    zero_meta = np.zeros(meta.shape, dtype=jax.dtypes.float0)
    d_meta_s = np.zeros(meta_s.shape, dtype=jax.dtypes.float0)
    d_cov = None if coverage is None else jnp.zeros_like(coverage)
    return dg, dw, jnp.zeros_like(sten), zero_meta, d_meta_s, d_cov


_band_panel.defvjp(_band_panel_fwd, _band_panel_bwd)


# --- public API ------------------------------------------------------------

def rotated_source_tensor_kmajor(x, band_limit):
    """G[n, (k, p, c)] = x[n,c]·e^{-i k φ_{n,c}} flattened k-major for the
    kernel's contiguous per-k column panels. x: (N, C, 2)."""
    from ..field_conv import rotated_source_tensor

    G = rotated_source_tensor(x, band_limit)       # (N, C, K, 2)
    N, C, K, _ = G.shape
    return jnp.transpose(G, (0, 2, 3, 1)).reshape(N, K * 2 * C)


def band_contrib(g, banded: BandedTable, precision: str = "f32"):
    """g: (N, K·2·C) planar rotated-source tensor (k-major, see
    rotated_source_tensor_kmajor).  Returns contrib (N, R, C, K, 2).

    precision: "f32" (exact) or "bf16" (MXU operands cast to bfloat16 with
    f32 accumulation — faster on MXU-bound shapes, ~1e-2 relative error).
    """
    N, M = g.shape
    R, K, TB = banded.n_rings, banded.k_width, banded.tb
    C = M // (2 * K)
    nb = N // TB
    out = _band_contrib(
        g, banded.sten_band, banded.tb, banded.nh, banded.n_rings,
        banded.k_width, precision,
    )
    # (nb·R·TB, K·2·C) -> (N, R, C, K, 2)
    out = out.reshape(nb, R, TB, K, 2, C)
    return jnp.transpose(out, (0, 2, 1, 5, 3, 4)).reshape(N, R, C, K, 2)


def field_conv_banded(x, banded, zonal, spherical, phase, ftype,
                      precision: str = "f32", fuse_filters: bool = True,
                      g_resident: bool | None = None,
                      pipeline: str = "auto"):
    """Full field convolution over the banded layout: (N, C, 2) -> (N, O, 2).

    banded: BandedTable (dense packed stencil) or CompressedBandedTable.
    fuse_filters=True (default) applies the filter contraction inside the
    kernel — the contrib tensor never touches HBM.  The unfused path is
    kept for A/B benchmarking (BENCH_FUSE=0).

    pipeline: "mega" runs the whole contraction as ONE grid step with a
    manual double-buffered stencil DMA and VMEM-resident g/dG (measured
    ~2.4x fwd+bwd over the implicit grid pipeline); "grid" is the classic
    per-block pipeline; "auto" (default) picks mega whenever its working
    set fits the VMEM budget (_mega_fits).

    g_resident: (grid pipeline only) keep the whole rotated-source tensor g
    VMEM-resident across the grid.  None = off — measured a wash, the
    stencil stream dominates (see _use_g_resident)."""
    from ..field_conv import apply_filters, filter_coefficients

    from ...precomp.banded import CompactPanelTable

    if isinstance(banded, CompactPanelTable):
        # route to the compact-layout kernel: at 163k it is both faster
        # (64.4 vs 74.0 ms fwd+bwd) and 5.7x smaller (0.97 vs 5.54 GB) —
        # docs/SCALE_100K.json; block panels win at dense/production
        # shapes, so the presets keep them below the compact threshold
        return field_conv_compact(x, banded, zonal, spherical, phase,
                                  ftype, precision)
    g = rotated_source_tensor_kmajor(x, banded.band_limit)
    coeff = filter_coefficients(zonal, spherical, phase, ftype,
                                banded.band_limit)
    if isinstance(banded, PanelTable):
        wmat = filters_to_wmat(coeff)
        y2 = _band_panel(
            g, wmat, banded.sten, banded.meta, banded.meta_s, None,
            banded.tb, banded.n_rings, banded.band_limit,
            banded.compressed, precision, None, banded.chunk)
        O = wmat.shape[-1] // 2
        return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)
    if isinstance(banded, BlockSparseTable):
        wmat = filters_to_wmat(coeff)
        N, M = g.shape
        use_mega = pipeline == "mega" or (
            pipeline == "auto"
            and _mega_fits(N, M, wmat.shape[-1], banded.n_rings,
                           banded.k_width, banded.tb, banded.nj))
        y2 = _band_sparse(
            g, wmat, banded.sten_band, banded.nbr,
            banded.tb, banded.n_rings, banded.k_width, precision, use_mega)
        O = wmat.shape[-1] // 2
        return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)
    if isinstance(banded, CompressedBandedTable):
        wmat = filters_to_wmat(coeff)
        N, M = g.shape
        use_mega = pipeline == "mega" or (
            pipeline == "auto"
            and _mega_fits(N, M, wmat.shape[-1], banded.n_rings,
                           banded.k_width, banded.tb, 2 * banded.nh + 1))
        if use_mega:
            y2 = _band_cmega(
                g, wmat, banded.sten_band,
                banded.tb, banded.nh, banded.n_rings, banded.band_limit,
                precision,
            )
        else:
            y2 = _band_cfused(
                g, wmat, banded.sten_band,
                banded.tb, banded.nh, banded.n_rings, banded.band_limit,
                precision,
            )
        O = wmat.shape[-1] // 2
        return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)
    if fuse_filters:
        wmat = filters_to_wmat(coeff)
        N, M = g.shape
        R, K, TB = banded.n_rings, banded.k_width, banded.tb
        NJ = 2 * banded.nh + 1
        fits = _mega_fits(N, M, wmat.shape[-1], R, K, TB, NJ)
        if pipeline == "megaw" or (pipeline == "auto" and fits):
            # wide window-contiguous variant: one (2RTB, W')x(W', 2C)
            # matmul per (block, k) instead of K·NJ·2 small ones (measured
            # faster than the classic mega — docs/KERNEL_NOTES.md r3)
            y2 = _band_fused_megaw(
                g, wmat, banded.sten_band,
                banded.tb, banded.nh, banded.n_rings, banded.k_width,
                precision)
        elif pipeline == "mega" or (pipeline == "auto" and fits):
            y2 = _band_fused_mega(
                g, wmat, banded.sten_band,
                banded.tb, banded.nh, banded.n_rings, banded.k_width,
                precision)
        else:
            y2 = _band_fused(
                g, wmat, banded.sten_band,
                banded.tb, banded.nh, banded.n_rings, banded.k_width,
                precision, _use_g_resident(g, g_resident),
            )
        O = wmat.shape[-1] // 2
        return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)
    contrib = band_contrib(g, banded, precision)
    return apply_filters(contrib, coeff)


def field_conv_compact(x, comp, zonal, spherical, phase, ftype,
                       precision: str = "f32"):
    """Full field convolution over the COMPACT panel layout:
    (N, C, 2) -> (N, O, 2).

    comp: CompactPanelTable — the same gathered-source-column table the
    ECHO/lift kernels consume at 100k+ scale, so a model can run EVERY op
    off one table.  The runtime price vs the block-panel path is one
    row-gather of the rotated-source tensor (``g[src_idx]``, (P·TS, M))
    per fwd/bwd and one ``segment_sum`` folding the per-panel disjoint dG
    blocks; the win is the compacted occupancy (dead-slot stencil work
    and the panel count both shrink ~3x at 163k).  Whether the trade is
    net-positive is decided by measurement (docs/KERNEL_NOTES.md), not
    analysis — this wrapper exists so the A/B is one flag.

    Reference semantics: transforms/fc_precomp.py + nn/field_conv.py of
    twmitchel/FieldConv (same contraction as field_conv_banded)."""
    from ..field_conv import filter_coefficients

    from ...precomp.banded import CompactPanelTable

    if not isinstance(comp, CompactPanelTable):
        raise TypeError(f"field_conv_compact needs a CompactPanelTable, "
                        f"got {type(comp).__name__}")
    g = rotated_source_tensor_kmajor(x, comp.band_limit)
    coeff = filter_coefficients(zonal, spherical, phase, ftype,
                                comp.band_limit)
    wmat = filters_to_wmat(coeff)
    src_flat = comp.src_idx.reshape(-1)
    y2 = _band_compact(
        g, wmat, comp.sten, comp.meta, src_flat,
        comp.tb, comp.ts, comp.n_rings, comp.band_limit,
        comp.compressed, precision, comp.n_pad)
    O = wmat.shape[-1] // 2
    return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)
