"""TransField — learned "gradient" lifting scalar features to tangent fields.

Reference: nn/trans_field.py:27-113 (supplement Eqs. (2)-(3)).

Two aggregations over the support edges, using two columns of the stencil
(frequency 0 and +1 in the correct usage; see the parity note on
``lift_cols`` in models/*):

  contribAng[i,c,r] = -Σ_e (x[j]-x[i]) · sten1[e,r]        (:104-106)
  contribMag[i,c,r] =  Σ_e  x[j]       · |sten0[e,r]|      (:110)

then per-(out,in) zonal banks turn these into an angle and a magnitude that
are recombined as ρ·e^{iφ} and summed over input channels (:9-24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..precomp.edge_table import EdgeTable
from ..utils.complexops import (
    cpolar,
    soft_abs,
    soft_absolute,
    soft_angle,
)


def _sten_col(table: EdgeTable, k_index: int):
    """Per-edge stencil column sten_k[n,d,r] = rsten[n,d,r]·fwxp[n,d,k] (planar)."""
    return table.rsten[..., None] * table.fwxp[:, :, None, k_index, :]


def trans_field_contrib(x, table: EdgeTable, lift_cols=(0, 1), d_chunk: int = 128):
    """Aggregate the angular (complex) and magnitude (real) contributions.

    x: (N, C) real scalar features.
    lift_cols: indices into the K axis of fwxp selecting the two stencil
      columns; (B, B+1) = frequencies (0, +1) is the correct choice, while
      (0, 1) replicates the classification notebook's use of the unsliced
      stencil (SURVEY.md §6c.1).

    Returns contribAng (N, C, R, 2), contribMag (N, C, R).
    """
    N, C = x.shape
    R, D = table.n_rings, table.d_slots
    k0, k1 = lift_cols

    def chunk(src_c, rsten_c, fw0_c, fw1_c):
        xs = x[src_c]                                       # (N, DB, C)
        xdiff = xs - x[:, None, :]                          # x_j - x_i
        sten1 = rsten_c[..., None] * fw1_c[:, :, None, :]   # (N, DB, R, 2)
        sten0 = rsten_c[..., None] * fw0_c[:, :, None, :]
        # The reference takes softAbs of the (complex) freq-0 stencil column
        # (trans_field.py:110); padded slots are exactly 0 -> stay 0.
        sten0_abs = soft_abs(sten0)                          # (N, DB, R)
        ang = -jnp.einsum(
            "ndc,ndrp->ncrp", xdiff, sten1, preferred_element_type=jnp.float32
        )
        mag = jnp.einsum(
            "ndc,ndr->ncr", xs, sten0_abs, preferred_element_type=jnp.float32
        )
        return ang, mag

    if d_chunk >= D:
        return chunk(
            table.src, table.rsten, table.fwxp[..., k0, :], table.fwxp[..., k1, :]
        )

    from .field_conv import resolve_d_chunk

    d_chunk = resolve_d_chunk(D, d_chunk)
    n_chunks = D // d_chunk
    split = lambda a: jnp.moveaxis(a.reshape(N, n_chunks, d_chunk, *a.shape[2:]), 1, 0)

    def body(carry, inputs):
        acc_a, acc_m = carry
        ang, mag = chunk(*inputs)
        return (acc_a + ang, acc_m + mag), None

    init = (
        jnp.zeros((N, C, R, 2), dtype=x.dtype),
        jnp.zeros((N, C, R), dtype=x.dtype),
    )
    (ang, mag), _ = jax.lax.scan(
        body,
        init,
        (
            split(table.src),
            split(table.rsten),
            split(table.fwxp[..., k0, :]),
            split(table.fwxp[..., k1, :]),
        ),
    )
    return ang, mag


def trans_field_weight(contrib_ang, contrib_mag, zonal_ang, zonal_mag, phase, ftype):
    """Contract with zonal banks and recombine (trans_field.py:9-24).

    contrib_ang: (N, C, R, 2); contrib_mag: (N, C, R)
    zonal_ang, zonal_mag: (O, C, R); phase: (O, C)
    Returns (N, O, 2).
    """
    A = jnp.einsum(
        "ncrp,ocr->nocp", contrib_ang, zonal_ang, preferred_element_type=jnp.float32
    )
    phi = soft_angle(A)                                    # (N, O, C)
    if ftype == 1:
        phi = phi + phase[None, :, :]
    M = jnp.einsum(
        "ncr,ocr->noc", contrib_mag, zonal_mag, preferred_element_type=jnp.float32
    )
    rho = soft_absolute(M)
    return jnp.sum(cpolar(rho, phi), axis=2)               # sum over in-channels


def _phasor_power(pr, pi, f: int):
    """(pr + i·pi)^f for integer f (|f| small: repeated multiplication)."""
    cr, ci = jnp.ones_like(pr), jnp.zeros_like(pi)
    qr, qi = (pr, pi) if f >= 0 else (pr, -pi)
    for _ in range(abs(f)):
        cr, ci = cr * qr - ci * qi, cr * qi + ci * qr
    return cr, ci


def trans_field_banded_contrib(x, comp, lift_cols=(0, 1), halo=None):
    """Gather-free TransField aggregation over the banded slot layout.

    Same math as :func:`trans_field_contrib` (reference nn/trans_field.py:
    104-110) but the ``x[src]`` gather is replaced by block-shift windowing
    of x over the CompressedBandedTable planes — pure slices, so the backward
    contains no scatter (the XLA path's backward scatter-add dominated the
    lift; docs/KERNEL_NOTES.md).  Stencil columns are rebuilt in-flight from
    the compressed planes: radial hats from the r plane, fwxp_k = wxp·e^{ikθ}
    from phasor powers (k = lift column − band_limit).

    The magnitude stencil uses rsten·|wxp| directly instead of the XLA
    path's softAbs(rsten⊗fwxp); they differ only on slots whose stencil
    magnitude is below EPS=1e-7 (where softAbs clamps to exactly 0), an
    O(1e-7) perturbation.

    x: (N, C) real scalars, N == comp.n_pad.
    halo: optional (left, right) boundary rows of x for a shard_map graph
    axis (precomp.banded.window_blocks); None = zero padding.
    Returns contribAng (N, C, R, 2), contribMag (N, C, R).
    """
    from ..ops.pallas.band_conv import _hats_from_r
    from ..precomp.banded import window_blocks

    sten = comp.sten_band                        # (nb, 5, TB, W')
    nb, _, TB, Wp = sten.shape
    nh, B, R = comp.nh, comp.band_limit, comp.n_rings
    N, C = x.shape

    xs = window_blocks(x, nb, TB, nh, halo=halo)   # (nb, W', C)

    rv = sten[:, 0]                                # (nb, TB, W')
    hats = _hats_from_r(rv, R)                     # (R, nb, TB, W')
    pr, pi = sten[:, 1], sten[:, 2]
    wr, wi = sten[:, 3], sten[:, 4]

    k0, k1 = lift_cols
    e1r, e1i = _phasor_power(pr, pi, k1 - B)
    f1 = jnp.stack([wr * e1r - wi * e1i, wr * e1i + wi * e1r], -1)  # (nb,TB,W',2)

    # angular: -Σ_w hats[r]·f1[p]·(xs[w,c] − x[t,c])
    #        = -(Σ_w hats·f1·xs[w]  −  x[t]·Σ_w hats·f1)
    s1 = hats[..., None] * f1[None]                # (R, nb, TB, W', 2)
    part = jnp.einsum("rbtwp,bwc->btcrp", s1, xs,
                      preferred_element_type=jnp.float32)
    ssum = jnp.sum(s1, axis=3)                     # (R, nb, TB, 2)
    xt = x.reshape(nb, TB, C)
    ang = -(part - xt[..., None, None] * jnp.transpose(
        ssum, (1, 2, 0, 3))[:, :, None])           # (nb, TB, C, R, 2)

    # magnitude: Σ_w hats[r]·|wxp|·xs[w,c]  (|fwxp_k| = |wxp|, unit phasor)
    wmag = jnp.sqrt(wr * wr + wi * wi)             # (nb, TB, W')
    sm = hats * wmag[None]                         # (R, nb, TB, W')
    mag = jnp.einsum("rbtw,bwc->btcr", sm, xs,
                     preferred_element_type=jnp.float32)

    return ang.reshape(N, C, R, 2), mag.reshape(N, C, R)


def trans_field_panel_contrib(x, panel, lift_cols=(0, 1),
                              panel_chunk: int = 256, x_src=None,
                              tgt_blocks=None):
    """TransField aggregation over the panel-CSR layout (PanelTable) — the
    100k-capable lift.

    Same math as :func:`trans_field_banded_contrib` (reference
    nn/trans_field.py:104-110) but organised per (target-block,
    source-block) PANEL: each panel contributes a (TB, C, R, 2) partial from
    one gathered source block, partials are summed per target block with a
    sorted segment-sum.  The backward therefore contains one scatter-add
    over ~P panel block-indices (P ≈ 17k at 163k vertices) instead of one
    over E ≈ 10M edges — the dense band layout this replaces is O(N^1.5)
    memory and cannot exist at the north-star scale
    (docs/KERNEL_NOTES.md).

    The magnitude stencil uses rsten·|wxp| directly (identical to the
    banded path; differs from softAbs(rsten⊗fwxp) only below EPS=1e-7).

    x: (N_out, C) target-row scalars (N_out == panel.n_pad single-device).
    x_src: optional (N_src, C) global source rows for graph-parallel use
      (parallel/panel_gp.py) — panels' src blocks index into x_src; default
      x itself.
    tgt_blocks / panel override hooks likewise serve the gp path: pass a
      meta whose tgt row is LOCAL to this shard.
    Returns contribAng (N_out, C, R, 2), contribMag (N_out, C, R).
    """
    from ..ops.pallas.band_conv import _hats_from_r
    from ..precomp.banded import PanelTable

    if isinstance(panel, PanelTable):
        sten, meta = panel.sten, panel.meta
        R, B, TB = panel.n_rings, panel.band_limit, panel.tb
        compressed = panel.compressed
    else:  # (sten, meta, tb, n_rings, band_limit, compressed) tuple (gp path)
        sten, meta, TB, R, B, compressed = panel
    x = jnp.asarray(x)
    N, C = x.shape
    nb_out = N // TB
    x_src = x if x_src is None else jnp.asarray(x_src)
    nb_src = x_src.shape[0] // TB
    P = sten.shape[0]
    k0, k1 = lift_cols
    K = 2 * B + 1

    xb_src = x_src.reshape(nb_src, TB, C)

    pc = min(panel_chunk, P)

    def chunk_partials_arrays(sten_c, src_c):
        cb = sten_c.shape[0]
        if compressed:
            rv = sten_c[:, 0]                            # (cb, TB, TB)
            hats = _hats_from_r(rv, R)                   # (R, cb, TB, TB)
            pr, pi = sten_c[:, 1], sten_c[:, 2]
            wr, wi = sten_c[:, 3], sten_c[:, 4]
            e1r, e1i = _phasor_power(pr, pi, k1 - B)
            f1 = jnp.stack([wr * e1r - wi * e1i,
                            wr * e1i + wi * e1r], -1)    # (cb, TB, TB, 2)
            wmag = jnp.sqrt(wr * wr + wi * wi)
        else:
            hats = jnp.moveaxis(sten_c[:, :R], 1, 0)     # (R, cb, TB, TB)
            fw = sten_c[:, R:].reshape(cb, K, 2, TB, TB)
            f1 = jnp.moveaxis(fw[:, k1], 1, -1)          # (cb, TB, TB, 2)
            f0 = fw[:, k0]
            wmag = jnp.sqrt(f0[:, 0] ** 2 + f0[:, 1] ** 2)
        xs = xb_src[src_c]                               # (cb, TB_s, C)
        s1 = hats[..., None] * f1[None]                  # (R, cb, TB, TB, 2)
        part = jnp.einsum("rptsj,psc->ptcrj", s1, xs,
                          preferred_element_type=jnp.float32)
        ssum = jnp.transpose(jnp.sum(s1, axis=3),
                             (1, 2, 0, 3))               # (cb, TB, R, 2)
        sm = hats * wmag[None]                           # (R, cb, TB, TB)
        magp = jnp.einsum("rpts,psc->ptcr", sm, xs,
                          preferred_element_type=jnp.float32)
        return part, ssum, magp

    def chunk_partials(carry, i):
        # dynamic_slice instead of pre-reshaped map inputs — mapping over
        # split(sten) materialises a full layout copy of the multi-GB
        # panel stencil (see echo_panel)
        sten_c = jax.lax.dynamic_slice_in_dim(sten, i * pc, pc, axis=0)
        src_c = jax.lax.dynamic_slice_in_dim(meta[1], i * pc, pc, axis=0)
        return (), chunk_partials_arrays(sten_c, src_c)

    # whole chunks under scan; the remainder as ONE static-slice tail call
    # (padding the panel axis would CONCATENATE — copy — the multi-GB
    # stencil)
    n_main = P // pc
    # remat the chunk body: without it, reverse-mode stacks each step's
    # einsum residuals ((R, pc, TB, TB, 2) and friends) over all chunks —
    # multi-GB at 163k vertices.  Recomputing from the stencil chunk (an
    # already-resident slice) costs one extra VPU pass.
    _, (part, ssum, magp) = jax.lax.scan(
        jax.checkpoint(chunk_partials), (),
        jnp.arange(n_main, dtype=jnp.int32))
    part = part.reshape(n_main * pc, TB, C, R, 2)
    ssum = ssum.reshape(n_main * pc, TB, R, 2)
    magp = magp.reshape(n_main * pc, TB, C, R)
    if P % pc:
        n0 = n_main * pc
        pt, st, mt = jax.checkpoint(chunk_partials_arrays)(
            sten[n0:], meta[1, n0:])
        part = jnp.concatenate([part, pt])
        ssum = jnp.concatenate([ssum, st])
        magp = jnp.concatenate([magp, mt])

    seg = jax.ops.segment_sum(part, meta[0], num_segments=nb_out)
    ssum_seg = jax.ops.segment_sum(ssum, meta[0], num_segments=nb_out)
    mag = jax.ops.segment_sum(magp, meta[0], num_segments=nb_out)

    xt = x.reshape(nb_out, TB, C)
    ang = -(seg - xt[..., None, None] * ssum_seg[:, :, None])
    return ang.reshape(N, C, R, 2), mag.reshape(N, C, R)


def _compact_lift_stencils(sten_c, R, B, k1):
    """Per-chunk stencil-only factors: s1 (R, cb, TB, TS, 2), sm
    (R, cb, TB, TS) — shared by the forward contraction and its hand-rolled
    transpose (the layout is linear in x)."""
    from .pallas.band_conv import _hats_from_r

    rv = sten_c[:, 0].astype(jnp.float32)
    hats = _hats_from_r(rv, R)                       # (R, cb, TB, TS)
    pr, pi = (sten_c[:, 1].astype(jnp.float32),
              sten_c[:, 2].astype(jnp.float32))
    wr, wi = (sten_c[:, 3].astype(jnp.float32),
              sten_c[:, 4].astype(jnp.float32))
    e1r, e1i = _phasor_power(pr, pi, k1 - B)
    f1 = jnp.stack([wr * e1r - wi * e1i,
                    wr * e1i + wi * e1r], -1)        # (cb, TB, TS, 2)
    wmag = jnp.sqrt(wr * wr + wi * wi)
    s1 = hats[..., None] * f1[None]                  # (R, cb, TB, TS, 2)
    sm = hats * wmag[None]                           # (R, cb, TB, TS)
    return s1, sm


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _compact_lift_agg(x, sten, meta, src_idx, statics):
    part, ssum, magp = _compact_lift_fwd_parts(x, sten, meta, src_idx,
                                               statics)
    return part, ssum, magp


def _compact_lift_fwd_parts(x, sten, meta, src_idx, statics):
    R, B, k1, pc, TB = statics
    P = sten.shape[0]
    C = x.shape[1]

    def chunk_arrays(sten_c, idx_c):
        s1, sm = _compact_lift_stencils(sten_c, R, B, k1)
        xs = jnp.take(x, idx_c.reshape(-1), axis=0).reshape(
            idx_c.shape[0], idx_c.shape[1], C)       # (cb, TS, C)
        part = jnp.einsum("rptsj,psc->ptcrj", s1, xs,
                          preferred_element_type=jnp.float32)
        ssum = jnp.transpose(jnp.sum(s1, axis=3), (1, 2, 0, 3))
        magp = jnp.einsum("rpts,psc->ptcr", sm, xs,
                          preferred_element_type=jnp.float32)
        return part, ssum, magp

    def body(carry, i):
        sten_c = jax.lax.dynamic_slice_in_dim(sten, i * pc, pc, axis=0)
        idx_c = jax.lax.dynamic_slice_in_dim(src_idx, i * pc, pc, axis=0)
        return (), chunk_arrays(sten_c, idx_c)

    n_main, tail = P // pc, P % pc
    _, (part, ssum, magp) = jax.lax.scan(
        body, (), jnp.arange(n_main, dtype=jnp.int32))
    part = part.reshape(n_main * pc, *part.shape[2:])
    ssum = ssum.reshape(n_main * pc, *ssum.shape[2:])
    magp = magp.reshape(n_main * pc, *magp.shape[2:])
    if tail:
        n0 = n_main * pc
        pt, st, mt = chunk_arrays(sten[n0:], src_idx[n0:])
        part = jnp.concatenate([part, pt])
        ssum = jnp.concatenate([ssum, st])
        magp = jnp.concatenate([magp, mt])
    return part, ssum, magp


def _compact_lift_agg_fwd(x, sten, meta, src_idx, statics):
    out = _compact_lift_fwd_parts(x, sten, meta, src_idx, statics)
    return out, (x, sten, meta, src_idx)


def _compact_lift_agg_bwd(statics, res, cts):
    """Transpose of the per-panel contraction: d_xs = s1ᵀ·d_part + smᵀ·
    d_magp per chunk, folded onto vertices by one segment_sum — no
    scatter (the take's autodiff transpose would be an XLA scatter-add
    over P·TS rows)."""
    x, sten, meta, src_idx = res
    R, B, k1, pc, TB = statics
    d_part, d_ssum, d_magp = cts   # d_ssum is stencil-only: ignored for dx
    P = sten.shape[0]
    C = x.shape[1]
    TS = src_idx.shape[1]

    def chunk_dxs(sten_c, dp_c, dm_c):
        s1, sm = _compact_lift_stencils(sten_c, R, B, k1)
        d_xs = jnp.einsum("rptsj,ptcrj->psc", s1, dp_c,
                          preferred_element_type=jnp.float32)
        d_xs = d_xs + jnp.einsum("rpts,ptcr->psc", sm, dm_c,
                                 preferred_element_type=jnp.float32)
        return d_xs

    def body(carry, i):
        sten_c = jax.lax.dynamic_slice_in_dim(sten, i * pc, pc, axis=0)
        dp_c = jax.lax.dynamic_slice_in_dim(d_part, i * pc, pc, axis=0)
        dm_c = jax.lax.dynamic_slice_in_dim(d_magp, i * pc, pc, axis=0)
        return (), chunk_dxs(sten_c, dp_c, dm_c)

    n_main, tail = P // pc, P % pc
    _, d_xs = jax.lax.scan(body, (), jnp.arange(n_main, dtype=jnp.int32))
    d_xs = d_xs.reshape(n_main * pc, TS, C)
    if tail:
        n0 = n_main * pc
        d_xs = jnp.concatenate(
            [d_xs, chunk_dxs(sten[n0:], d_part[n0:], d_magp[n0:])])
    dx = jax.ops.segment_sum(d_xs.reshape(P * TS, C),
                             src_idx.reshape(-1), num_segments=x.shape[0])
    zero_meta = np.zeros(meta.shape, dtype=jax.dtypes.float0)
    zero_idx = np.zeros(src_idx.shape, dtype=jax.dtypes.float0)
    return dx, jnp.zeros_like(sten), zero_meta, zero_idx


_compact_lift_agg.defvjp(_compact_lift_agg_fwd, _compact_lift_agg_bwd)


def trans_field_compact_contrib(x, compact, lift_cols=(0, 1),
                                panel_chunk: int = 256, x_src=None):
    """TransField aggregation over the CompactPanelTable layout — same math
    as :func:`trans_field_panel_contrib` (reference nn/trans_field.py:
    104-110) but with each panel's source columns gathered per
    ``src_idx`` instead of read as whole blocks: ~3x fewer dead slots at
    163k vertices.  Forward gathers rows; backward folds per-panel column
    grads with one segment_sum (hand-rolled VJP — XLA's gather transpose
    is a scatter-add).

    x_src: optional GLOBAL source rows for the graph-parallel path
    (``src_idx`` holds global indices; x stays shard-local for the
    target term).  Default x itself."""
    x = jnp.asarray(x)
    N, C = x.shape
    TB = compact.tb
    nb_out = N // TB
    R, B = compact.n_rings, compact.band_limit
    k0, k1 = lift_cols
    pc = min(panel_chunk, compact.n_panels)
    x_src = x if x_src is None else jnp.asarray(x_src)

    statics = (R, B, k1, pc, TB)
    part, ssum, magp = _compact_lift_agg(x_src, compact.sten, compact.meta,
                                         compact.src_idx, statics)
    meta0 = compact.meta[0]
    seg = jax.ops.segment_sum(part, meta0, num_segments=nb_out)
    ssum_seg = jax.ops.segment_sum(ssum, meta0, num_segments=nb_out)
    mag = jax.ops.segment_sum(magp, meta0, num_segments=nb_out)

    xt = x.reshape(nb_out, TB, C)
    ang = -(seg - xt[..., None, None] * ssum_seg[:, :, None])
    return ang.reshape(N, C, R, 2), mag.reshape(N, C, R)


def trans_field(x, table, zonal_ang, zonal_mag, phase, ftype, lift_cols=(0, 1),
                d_chunk: int = 128, comp=None, halo=None):
    """TransField lift.  When ``comp`` is given the aggregation runs
    gather-free: a CompressedBandedTable routes to the banded block-window
    path, a PanelTable to the panel-CSR path (100k-capable), a
    CompactPanelTable to the compacted-column variant; otherwise the
    padded-CSR gather path is used."""
    from ..precomp.banded import CompactPanelTable, PanelTable

    if isinstance(comp, CompactPanelTable):
        ang, mag = trans_field_compact_contrib(x, comp, lift_cols=lift_cols)
    elif isinstance(comp, PanelTable):
        ang, mag = trans_field_panel_contrib(x, comp, lift_cols=lift_cols)
    elif comp is not None:
        ang, mag = trans_field_banded_contrib(x, comp, lift_cols=lift_cols,
                                              halo=halo)
    else:
        ang, mag = trans_field_contrib(x, table, lift_cols=lift_cols,
                                       d_chunk=d_chunk)
    return trans_field_weight(ang, mag, zonal_ang, zonal_mag, phase, ftype)
