"""Graph-parallel field convolution with explicit halo exchange.

The banded layout (precomp/banded.py) shards naturally: each device of the
'graph' axis owns a contiguous range of vertex blocks (the leading axis of
the packed stencil), so every edge reaches at most nh blocks away and the
only remote data a device needs is the nh·TB boundary rows of its ring
neighbors — the *halo*.  Forward: ppermute the boundary rows of the
rotated-source tensor G, run the local band kernel on the extended array.
Backward: the transposed kernel produces cotangents for halo rows, which
ppermute back to their owners (the deterministic band transpose of a
scatter — partition count does not change the sums' structure).

This is the mesh analog of context parallelism (SURVEY.md §5.7): collect
boundary features over ICI, overlap with local SpMM.  Use under
jax.shard_map with the block axis sharded on `axis_name`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..precomp.banded import BandedTable
from ..ops.pallas.band_conv import (
    _bwd_fused_kernel,
    _bwd_kernel,
    _compiler_params,
    _fwd_fused_kernel,
    _fwd_kernel,
    _interpret,
    _sten_spec,
    filters_to_wmat,
)


def _halo_g_specs(NJ, TB, M):
    """Target block b reads g_ext blocks b+j (no clipping — halos supply the
    ends, zero stencil slots cover the global boundary)."""
    return [
        pl.BlockSpec(
            (TB, M),
            functools.partial(lambda b, jj: (b + jj, 0), jj=j),
            memory_space=pltpu.VMEM,
        )
        for j in range(NJ)
    ]


def _halo_fwd_impl(g_ext, sten_band, tb, nh, n_rings, k_width):
    """Band contraction of local targets against a halo-extended G."""
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    nb = sten_band.shape[0]
    M = g_ext.shape[1]
    C = M // (2 * K)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ),
        grid=(nb,),
        in_specs=_halo_g_specs(NJ, TB, M) + [_sten_spec(R, K, TB, NJ)],
        out_specs=pl.BlockSpec((R * TB, M), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * R * TB, M), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*([g_ext] * NJ), sten_band)


def _halo_bwd_impl(dout, sten_band, tb, nh, n_rings, k_width, M):
    """Transposed band matmul: per-(block, shift) partials of dG_ext."""
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    nb = sten_band.shape[0]
    C = M // (2 * K)

    parts = pl.pallas_call(
        functools.partial(_bwd_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ),
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

    # combine: contribution of (local block b, sub-window j) belongs to
    # extended block b + j
    parts = parts.reshape(nb, NJ, TB, M)
    dg_ext = jnp.zeros((nb + 2 * nh, TB, M), jnp.float32)
    for j in range(NJ):
        dg_ext = dg_ext.at[j:j + nb].add(parts[:, j])
    return dg_ext.reshape((nb + 2 * nh) * TB, M)


def _exchange_halos(g_local, hw, axis_name):
    """Collect the last/first hw rows of the ring neighbors.

    Returns (left_halo, right_halo), each (hw, M): left = previous device's
    tail, right = next device's head.  Edge devices receive zeros (no
    wraparound — the vertex range is linear, not cyclic).
    """
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    left = jax.lax.ppermute(g_local[-hw:], axis_name, fwd)
    right = jax.lax.ppermute(g_local[:hw], axis_name, bwd)
    left = jnp.where(idx == 0, 0.0, left)
    right = jnp.where(idx == n_dev - 1, 0.0, right)
    return left, right


def _return_halos(dg_ext, hw, axis_name):
    """Send halo-row cotangents back to their owners and add."""
    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    d_left, local, d_right = dg_ext[:hw], dg_ext[hw:-hw], dg_ext[-hw:]
    # d_left belongs to the previous device's tail: send backward
    from_next = jax.lax.ppermute(d_left, axis_name, bwd)
    from_prev = jax.lax.ppermute(d_right, axis_name, fwd)
    from_next = jnp.where(idx == n_dev - 1, 0.0, from_next)
    from_prev = jnp.where(idx == 0, 0.0, from_prev)
    local = local.at[-hw:].add(from_next)
    local = local.at[:hw].add(from_prev)
    return local


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def halo_band_contrib(g_local, sten_band, tb, nh, n_rings, k_width,
                      axis_name):
    out, _ = _halo_fwd(g_local, sten_band, tb, nh, n_rings, k_width,
                       axis_name)
    return out


def _halo_fwd(g_local, sten_band, tb, nh, n_rings, k_width, axis_name):
    hw = nh * tb
    left, right = _exchange_halos(g_local, hw, axis_name)
    g_ext = jnp.concatenate([left, g_local, right], axis=0)
    out = _halo_fwd_impl(g_ext, sten_band, tb, nh, n_rings, k_width)
    return out, (g_local, sten_band)


def _halo_bwd(tb, nh, n_rings, k_width, axis_name, res, dout):
    g_local, sten_band = res
    hw = nh * tb
    dg_ext = _halo_bwd_impl(dout, sten_band, tb, nh, n_rings, k_width,
                            g_local.shape[1])
    dg = _return_halos(dg_ext, hw, axis_name)
    return dg, jnp.zeros_like(sten_band)


halo_band_contrib.defvjp(_halo_fwd, _halo_bwd)


# --- fused variant: filter contraction inside the kernel -------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def halo_band_fused(g_local, wmat, sten_band, tb, nh, n_rings, k_width,
                    axis_name):
    """Sharded fused field conv: returns local y (N_local, 2O).  wmat must be
    replicated across the graph axis; its cotangent is the per-device partial
    (shard_map's transpose of the broadcast psums it)."""
    y, _ = _halo_fused_fwd(g_local, wmat, sten_band, tb, nh, n_rings,
                           k_width, axis_name)
    return y


def _halo_fused_fwd(g_local, wmat, sten_band, tb, nh, n_rings, k_width,
                    axis_name):
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    N_local, M = g_local.shape
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N_local // TB
    hw = nh * tb

    left, right = _exchange_halos(g_local, hw, axis_name)
    g_ext = jnp.concatenate([left, g_local, right], axis=0)
    y = pl.pallas_call(
        functools.partial(_fwd_fused_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2),
        grid=(nb,),
        in_specs=_halo_g_specs(NJ, TB, M) + [
            _sten_spec(R, K, TB, NJ),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, O2), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_local, O2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*([g_ext] * NJ), sten_band, wmat)
    return y, (g_local, wmat, sten_band)


def _halo_fused_bwd(tb, nh, n_rings, k_width, axis_name, res, dy):
    g_local, wmat, sten_band = res
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    N_local, M = g_local.shape
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N_local // TB
    hw = nh * tb

    # re-exchange halos (cheaper than saving g_ext as a residual)
    left, right = _exchange_halos(g_local, hw, axis_name)
    g_ext = jnp.concatenate([left, g_local, right], axis=0)

    parts, dw = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((TB, O2), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + _halo_g_specs(NJ, TB, M) + [
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
    )(dy, *([g_ext] * NJ), sten_band, wmat)

    parts = parts.reshape(nb, NJ, TB, M)
    dg_ext = jnp.zeros((nb + 2 * nh, TB, M), jnp.float32)
    for j in range(NJ):
        dg_ext = dg_ext.at[j:j + nb].add(parts[:, j])
    dg = _return_halos(dg_ext.reshape((nb + 2 * nh) * TB, M), hw, axis_name)
    return dg, dw, jnp.zeros_like(sten_band)


halo_band_fused.defvjp(_halo_fused_fwd, _halo_fused_bwd)


# --- overlapped variant: interior compute hides the halo ppermute ----------
#
# The serial path above is ppermute -> concat -> kernel: the collective and
# the SpMM cannot overlap because of the data dependence.  Here the local
# band contraction splits into INTERIOR target blocks (b in [nh, nb-nh),
# which read only local g rows) and BOUNDARY blocks (first/last nh, which
# need the halos).  The interior kernel has no dependence on the ppermute,
# so XLA's latency-hiding scheduler runs the ICI transfer concurrently with
# it — the mesh analog of overlapping context-parallel ring steps with
# local attention (SURVEY.md §5.7).


def _fused_fwd_shard(g_arr, sten_band, wmat, grid, sten_off, *, R, K, C, TB,
                     NJ, O2, M):
    """Fused fwd over `grid` target blocks; target block b uses stencil
    block b+sten_off and g_arr blocks b..b+NJ-1."""
    return pl.pallas_call(
        functools.partial(_fwd_fused_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TB, M),
                         functools.partial(lambda b, jj: (b + jj, 0), jj=j),
                         memory_space=pltpu.VMEM)
            for j in range(NJ)
        ] + [
            pl.BlockSpec((1, sten_band.shape[1], TB, NJ * TB),
                         lambda b: (b + sten_off, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, M, O2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, O2), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * TB, O2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R * TB, M), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*([g_arr] * NJ), sten_band, wmat)


def _bwd_fused_shard(dy_rows, g_arr, sten_band, wmat, grid, sten_off, *, R,
                     K, C, TB, NJ, O2, M):
    """Fused bwd over `grid` target blocks (same indexing as the fwd shard).
    Returns per-(block, shift) dG partials in g_arr coordinates + partial dW."""
    return pl.pallas_call(
        functools.partial(_bwd_fused_kernel, R=R, K=K, C=C, TB=TB, NJ=NJ,
                          O2=O2),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TB, O2), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((TB, M),
                         functools.partial(lambda b, jj: (b + jj, 0), jj=j),
                         memory_space=pltpu.VMEM)
            for j in range(NJ)
        ] + [
            pl.BlockSpec((1, sten_band.shape[1], TB, NJ * TB),
                         lambda b: (b + sten_off, 0, 0, 0),
                         memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((grid * NJ * TB, M), jnp.float32),
            jax.ShapeDtypeStruct((R, M, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R * TB, M), jnp.float32),
            pltpu.VMEM((R * TB, M), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(dy_rows, *([g_arr] * NJ), sten_band, wmat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def halo_band_fused_overlap(g_local, wmat, sten_band, tb, nh, n_rings,
                            k_width, axis_name):
    """Sharded fused field conv with compute/communication overlap.  Same
    contract as halo_band_fused; requires nb > 2·nh local blocks."""
    y, _ = _halo_overlap_fwd(g_local, wmat, sten_band, tb, nh, n_rings,
                             k_width, axis_name)
    return y


def _halo_overlap_fwd(g_local, wmat, sten_band, tb, nh, n_rings, k_width,
                      axis_name):
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    N_local, M = g_local.shape
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N_local // TB
    hw = nh * tb
    if nb <= 2 * nh:
        raise ValueError(
            f"overlap needs nb={nb} > 2*nh={2 * nh} local blocks; use "
            "halo_band_fused")
    kw = dict(R=R, K=K, C=C, TB=TB, NJ=NJ, O2=O2, M=M)

    # issue the halo ppermutes FIRST; the interior kernel below has no data
    # dependence on them, so the scheduler overlaps the ICI transfer with it
    left, right = _exchange_halos(g_local, hw, axis_name)

    y_int = _fused_fwd_shard(g_local, sten_band, wmat, nb - 2 * nh,
                             sten_off=nh, **kw)

    g_head = jnp.concatenate([left, g_local[:2 * hw]], axis=0)
    g_tail = jnp.concatenate([g_local[-2 * hw:], right], axis=0)
    y_head = _fused_fwd_shard(g_head, sten_band, wmat, nh, sten_off=0, **kw)
    y_tail = _fused_fwd_shard(g_tail, sten_band, wmat, nh,
                              sten_off=nb - nh, **kw)

    y = jnp.concatenate([y_head, y_int, y_tail], axis=0)
    return y, (g_local, wmat, sten_band)


def _halo_overlap_bwd(tb, nh, n_rings, k_width, axis_name, res, dy):
    g_local, wmat, sten_band = res
    R, K, TB = n_rings, k_width, tb
    NJ = 2 * nh + 1
    N_local, M = g_local.shape
    C = M // (2 * K)
    O2 = wmat.shape[-1]
    nb = N_local // TB
    hw = nh * tb
    kw = dict(R=R, K=K, C=C, TB=TB, NJ=NJ, O2=O2, M=M)

    # halos for contrib remat (same exchange as fwd)
    left, right = _exchange_halos(g_local, hw, axis_name)
    g_head = jnp.concatenate([left, g_local[:2 * hw]], axis=0)
    g_tail = jnp.concatenate([g_local[-2 * hw:], right], axis=0)

    # boundary bwd FIRST: only its partials feed the return ppermute, so the
    # collective starts before (and overlaps with) the interior bwd kernel
    ph, dw_h = _bwd_fused_shard(dy[:hw], g_head, sten_band, wmat, nh,
                                sten_off=0, **kw)
    pt, dw_t = _bwd_fused_shard(dy[-hw:], g_tail, sten_band, wmat, nh,
                                sten_off=nb - nh, **kw)
    ph = ph.reshape(nh, NJ, TB, M)
    pt = pt.reshape(nh, NJ, TB, M)

    # head target b, shift j -> extended block b+j (ext = nh | nb | nh);
    # ext block < nh = left-halo cotangent.  Tail target nb-nh+b -> ext
    # block nh+nb-2*nh+b+j; ext >= nh+nb = right-halo cotangent.
    d_left = jnp.zeros((nh, TB, M), jnp.float32)
    d_right = jnp.zeros((nh, TB, M), jnp.float32)
    for b in range(nh):
        for j in range(NJ):
            e = b + j
            if e < nh:
                d_left = d_left.at[e].add(ph[b, j])
            et = b + j - 2 * nh
            if et >= 0:
                d_right = d_right.at[et].add(pt[b, j])

    n_dev = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_next = jax.lax.ppermute(d_left.reshape(hw, M), axis_name, bwd_perm)
    from_prev = jax.lax.ppermute(d_right.reshape(hw, M), axis_name, fwd_perm)

    # interior bwd overlaps with the two return ppermutes above
    pi, dw_i = _bwd_fused_shard(dy[hw:-hw], g_local, sten_band, wmat,
                                nb - 2 * nh, sten_off=nh, **kw)
    pi = pi.reshape(nb - 2 * nh, NJ, TB, M)

    # assemble local dG in ext coordinates minus the halo rows
    dg = jnp.zeros((nb, TB, M), jnp.float32)
    for j in range(NJ):
        # interior target nh+b, shift j -> ext nh+b+j -> local b+j
        lo = j
        dg = dg.at[lo:lo + nb - 2 * nh].add(pi[:, j])
    for b in range(nh):
        for j in range(NJ):
            e = b + j - nh                    # head -> local block
            if 0 <= e < nb:
                dg = dg.at[e].add(ph[b, j])
            e = b + j                         # tail target nb-nh+b -> local
            if e < 2 * nh:                    # ext nh+nb-2nh+b+j < nh+nb
                dg = dg.at[nb - 2 * nh + e].add(pt[b, j])

    from_next = jnp.where(idx == n_dev - 1, 0.0, from_next)
    from_prev = jnp.where(idx == 0, 0.0, from_prev)
    dg = dg.reshape(N_local, M)
    dg = dg.at[-hw:].add(from_next)
    dg = dg.at[:hw].add(from_prev)
    return dg, dw_h + dw_t + dw_i, jnp.zeros_like(sten_band)


halo_band_fused_overlap.defvjp(_halo_overlap_fwd, _halo_overlap_bwd)


def halo_field_conv(g_local, banded_local: BandedTable, zonal, spherical,
                    phase, ftype, axis_name: str, overlap: bool = True):
    """Sharded fused field convolution: g_local (N_local, K·2C) -> local
    y (N_local, O, 2).  Filter params are replicated; their gradients are
    reduced by shard_map's broadcast transpose.

    overlap=True splits the kernel into interior/boundary blocks so the
    halo ppermute rides the ICI concurrently with interior compute (falls
    back to the serial path when the local shard is too small)."""
    from ..ops.field_conv import filter_coefficients

    coeff = filter_coefficients(zonal, spherical, phase, ftype,
                                banded_local.band_limit)
    wmat = filters_to_wmat(coeff)
    nb_local = g_local.shape[0] // banded_local.tb
    if overlap and nb_local > 2 * banded_local.nh:
        y2 = halo_band_fused_overlap(
            g_local, wmat, banded_local.sten_band,
            banded_local.tb, banded_local.nh, banded_local.n_rings,
            banded_local.k_width, axis_name,
        )
    else:
        y2 = halo_band_fused(
            g_local, wmat, banded_local.sten_band,
            banded_local.tb, banded_local.nh, banded_local.n_rings,
            banded_local.k_width, axis_name,
        )
    O = y2.shape[-1] // 2
    return jnp.stack([y2[:, :O], y2[:, O:]], axis=-1)


def halo_contrib(g_local, banded_local: BandedTable, axis_name: str):
    """Sharded equivalent of ops.pallas.band_conv.band_contrib: g_local and
    the banded tables hold this device's vertex rows; returns local contrib
    (N_local, R, C, K, 2)."""
    N_local, M = g_local.shape
    R, K, TB = banded_local.n_rings, banded_local.k_width, banded_local.tb
    C = M // (2 * K)
    nb = N_local // TB
    out = halo_band_contrib(
        g_local, banded_local.sten_band,
        TB, banded_local.nh, R, K, axis_name,
    )
    out = out.reshape(nb, R, TB, K, 2, C)
    return jnp.transpose(out, (0, 2, 1, 5, 3, 4)).reshape(N_local, R, C, K, 2)
