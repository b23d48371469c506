"""ECHO descriptors — fixed-shape masked rasterisation + scatter.

Reference: nn/echo.py:65-148 ("ECHO: Extended Convolution Histogram of
Orientations").  Per (edge, channel): rotate the edge's log coordinate into
the frame of the *feature* at the source vertex, bilinearly splat the
transported feature value into 4 bins of a rasterised disk, accumulate per
target vertex, and return the magnitude of each bin.

The reference prunes edges carrying (near-)zero features with data-dependent
indexing (echo.py:119-127), which is shape-dynamic.  Here the same semantics
are obtained at fixed shape by zeroing those votes (SURVEY.md §6c.2); the
D (neighbor-slot) axis is processed in chunks under lax.scan so the
(N, D, C)-sized vote tensors stay within a fixed memory budget.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..precomp.edge_table import EdgeTable
from ..utils.complexops import cmul, cconj, is_origin, soft_abs, soft_unit


def disk_map(n_bins: int):
    """Compact disk rasterisation map (echo.py:11-27).

    Returns (dmap, dim): dmap is a (w*w,) int array mapping grid cell
    w*i + j to a compact bin index; cells outside the disk map to 0 (the
    reference initialises the map with zeros — votes clamped outside the
    disk land in bin 0, a quirk we reproduce).  w = 2*n_bins+1.
    """
    w = 2 * n_bins + 1
    ind = []
    for i in range(w):
        for j in range(w):
            if (i - n_bins) ** 2 + (j - n_bins) ** 2 <= (n_bins + 0.25) ** 2:
                ind.append(w * i + j)
    dmap = np.zeros(w * w, dtype=np.int32)
    dmap[np.array(ind)] = np.arange(len(ind), dtype=np.int32)
    return dmap, len(ind)


def hist_dim(n_bins: int) -> int:
    """Descriptor dimensionality ≈ π(n_bins+0.5)² (echo_block.py:10-18)."""
    return disk_map(n_bins)[1]


def echo(x, table: EdgeTable, n_bins: int, d_chunk: int = 128,
         method: str = "onehot"):
    """Compute ECHO descriptors.

    x: (N, C, 2) planar tangent features.
    Returns (N, C, dS) real descriptor magnitudes.

    method:
      "onehot" (default) — separable one-hot factorisation of the bilinear
        splat: bin index u = w·α + β factors over the two log-map axes, so
        the 4-corner accumulation collapses to TWO 3-operand einsums per
        chunk contracting over the slot axis, each reading the vote tensor
        once.  ~10x less HBM traffic than "masked" (which re-reads the
        votes once per bin), then a tiny static (w², dS) fold applies the
        disk map.
      "masked" — per-bin masked reductions (4·dS passes); kept for A/B.
    """
    N, C = x.shape[0], x.shape[1]
    D = table.d_slots
    nb = n_bins
    w = 2 * nb + 1
    dmap_np, dS = disk_map(nb)
    dmap = jnp.asarray(dmap_np)
    # grid-cell -> compact-bin fold matrix (outside-disk cells land in bin 0,
    # reproducing the reference's zero-initialised map quirk)
    fold_np = np.zeros((w * w, dS), dtype=np.float32)
    fold_np[np.arange(w * w), dmap_np] = 1.0
    fold = jnp.asarray(fold_np)

    # Per-source unit feature direction e^{iφ} and origin mask (echo.py:123,130).
    # soft_unit is the transcendental-free e^{iφ} (= x/|x|); it returns 0 at
    # origin entries where cexpi(softAngle)=1, but those votes are zeroed by
    # the `valid` mask below, so the difference is unobservable.
    unit_conj = cconj(soft_unit(x))         # (N, C, 2)
    nonzero = jnp.logical_not(is_origin(x)) # (N, C)

    def chunk_common(src_c, ln_c, wxp_c, mask_c):
        xs = x[src_c]                                        # (N, DB, C, 2)
        units = unit_conj[src_c]                             # (N, DB, C, 2)
        valid = nonzero[src_c] & (mask_c[..., None] > 0)     # (N, DB, C)

        # Align the log coordinate with the feature frame (echo.py:130)
        aligned = cmul(ln_c[:, :, None, :], units)           # (N, DB, C, 2)
        p = aligned * nb                                     # scale (echo.py:41)

        pC = jnp.clip(jnp.ceil(p), -nb, nb).astype(jnp.int32)
        pF = jnp.clip(jnp.floor(p), -nb, nb).astype(jnp.int32)
        pCf, pFf = pC.astype(p.dtype), pF.astype(p.dtype)

        # 4 bilinear (weight, bin) pairs (echo.py:44-59)
        w0 = (pCf[..., 0] - p[..., 0]) * (pCf[..., 1] - p[..., 1])
        w1 = (p[..., 0] - pFf[..., 0]) * (p[..., 1] - pFf[..., 1])
        w2 = (p[..., 0] - pFf[..., 0]) * (pCf[..., 1] - p[..., 1])
        w3 = (pCf[..., 0] - p[..., 0]) * (p[..., 1] - pFf[..., 1])

        # Votes: feature · (w_norm · transport), masked (echo.py:136)
        xw = cmul(xs, wxp_c[:, :, None, :])
        xw = jnp.where(valid[..., None], xw, 0.0)
        return xw, (w0, w1, w2, w3), pF, pC

    def chunk_hist_masked(src_c, ln_c, wxp_c, mask_c):
        xw, (w0, w1, w2, w3), pF, pC = chunk_common(src_c, ln_c, wxp_c,
                                                    mask_c)
        i0 = dmap[w * (pF[..., 0] + nb) + (pF[..., 1] + nb)]
        i1 = dmap[w * (pC[..., 0] + nb) + (pC[..., 1] + nb)]
        i2 = dmap[w * (pC[..., 0] + nb) + (pF[..., 1] + nb)]
        i3 = dmap[w * (pF[..., 0] + nb) + (pC[..., 1] + nb)]

        # Bin accumulation (echo.py:139-148).  XLA scatter on TPU serialises
        # badly (25M updates ≈ seconds); instead reduce per static bin with
        # masked sums over the slot axis — dS is small (21/38), so this is
        # 4·dS fused mask+reduce passes, entirely on the VPU.
        corners = ((w0, i0), (w1, i1), (w2, i2), (w3, i3))
        vws = [xw * wgt[..., None] for wgt, _ in corners]
        per_s = []
        for s in range(dS):
            acc = jnp.zeros((N, C, 2), dtype=x.dtype)
            for vw, (_, idx) in zip(vws, corners):
                m = (idx == s).astype(x.dtype)
                acc = acc + jnp.einsum(
                    "ndcp,ndc->ncp", vw, m, preferred_element_type=jnp.float32
                )
            per_s.append(acc)
        return jnp.stack(per_s, axis=2).reshape(N * C * dS, 2)

    def chunk_hist_onehot(src_c, ln_c, wxp_c, mask_c):
        xw, (w0, w1, w2, w3), pF, pC = chunk_common(src_c, ln_c, wxp_c,
                                                    mask_c)
        # The grid cell u = w·α + β is separable: α from the first log-map
        # axis, β from the second; corners use (F,F), (C,C), (C,F), (F,C).
        # Grouping by the α factor, the 4-corner splat is two rank-1 splats:
        #   A_F ⊗ (w0·B_F + w3·B_C)  +  A_C ⊗ (w2·B_F + w1·B_C)
        # so the whole accumulation is two einsums contracting the slot
        # axis, each reading the votes exactly once.
        iw = jnp.arange(w, dtype=jnp.int32)
        A_F = (pF[..., 0:1] + nb == iw).astype(x.dtype)      # (N, DB, C, w)
        A_C = (pC[..., 0:1] + nb == iw).astype(x.dtype)
        B_F = (pF[..., 1:2] + nb == iw).astype(x.dtype)
        B_C = (pC[..., 1:2] + nb == iw).astype(x.dtype)
        BF0 = w0[..., None] * B_F + w3[..., None] * B_C
        BC1 = w2[..., None] * B_F + w1[..., None] * B_C
        grid = jnp.einsum("ndcp,ndca,ndcb->ncpab", xw, A_F, BF0,
                          preferred_element_type=jnp.float32)
        grid = grid + jnp.einsum("ndcp,ndca,ndcb->ncpab", xw, A_C, BC1,
                                 preferred_element_type=jnp.float32)
        # fold the w×w grid through the disk map (static (w², dS) matmul)
        hist = jnp.einsum("ncpu,us->ncps", grid.reshape(N, C, 2, w * w),
                          fold, preferred_element_type=jnp.float32)
        return jnp.moveaxis(hist, 2, 3).reshape(N * C * dS, 2)

    chunk_hist = (chunk_hist_onehot if method == "onehot"
                  else chunk_hist_masked)

    if method == "banded":
        raise ValueError("pass a CompressedBandedTable to echo_banded instead")
    if d_chunk >= D:
        hist = chunk_hist(table.src, table.ln, table.wxp, table.mask)
    else:
        from .field_conv import resolve_d_chunk

        d_chunk = resolve_d_chunk(D, d_chunk)
        n_chunks = D // d_chunk
        split = lambda a: jnp.moveaxis(
            a.reshape(N, n_chunks, d_chunk, *a.shape[2:]), 1, 0
        )

        def body(acc, inputs):
            return acc + chunk_hist(*inputs), None

        init = jnp.zeros((N * C * dS, 2), dtype=x.dtype)
        hist, _ = jax.lax.scan(
            body,
            init,
            (split(table.src), split(table.ln), split(table.wxp), split(table.mask)),
        )

    return soft_abs(hist.reshape(N, C, dS, 2))


def echo_panel(x, panel, n_bins: int, panel_chunk: int = 8, x_src=None,
               n_out=None):
    """ECHO descriptors over the panel-CSR layout (PanelTable) — the
    100k-capable path.

    Semantically identical to `echo` (reference nn/echo.py:65-148) but the
    work is organised per (target-block, source-block) PANEL: a lax.scan
    walks panel chunks, gathers each chunk's source blocks, computes the
    separable one-hot splat for the (TB_t, TB_s, C) votes of those panels,
    folds w×w → dS, and accumulates into a per-target-block histogram
    carry via index-add over the chunk's target-block ids.  Cost scales
    with the ACTUAL panel count; the backward's scatter is over ~P panel
    block-indices, not E edges, and the carry/intermediates stay bounded
    by panel_chunk — the dense band window this replaces is O(N^1.5)
    memory (docs/KERNEL_NOTES.md).

    Requires a COMPRESSED PanelTable (planes r·sentinel, e^{iθ}, wxp —
    ECHO needs the log map, which the dense R+2K factorisation has already
    folded away).  Empty slots carry wxp = 0, so their votes vanish even
    though the R_SENTINEL radius lands in a clipped corner bin (same
    mechanism as echo_banded).

    x: (N_out, C, 2) target rows; x_src optional global source rows for
    the graph-parallel path (default x).  Returns (N_out, C, dS).
    """
    from ..precomp.banded import PanelTable

    if isinstance(panel, PanelTable):
        if not panel.compressed:
            raise ValueError("echo_panel needs a compressed PanelTable "
                             "(build_panel_table(compressed=True))")
        sten, meta, TB = panel.sten, panel.meta, panel.tb
    else:  # (sten, meta, tb) triple — graph-parallel path
        sten, meta, TB = panel
    x = jnp.asarray(x)
    N, C = x.shape[0], x.shape[1]
    n_out = N if n_out is None else n_out
    nb_out = n_out // TB
    x_src = x if x_src is None else jnp.asarray(x_src)
    nb_src = x_src.shape[0] // TB
    P = sten.shape[0]
    nbins = n_bins
    w = 2 * nbins + 1
    dmap_np, dS = disk_map(nbins)
    fold_np = np.zeros((w * w, dS), dtype=np.float32)
    fold_np[np.arange(w * w), dmap_np] = 1.0
    fold = jnp.asarray(fold_np)

    xb = x_src.reshape(nb_src, TB, C, 2)
    ub = cconj(soft_unit(xb))                   # (nb, TB, C, 2)
    nzb = jnp.logical_not(is_origin(xb))        # (nb, TB, C)

    pc = min(panel_chunk, P)

    def hist_part(carry, sten_c, tgt_c, src_c):
        cb = sten_c.shape[0]
        r = sten_c[:, 0]                                     # (cb, TB, TB)
        ln_c = jnp.stack([r * sten_c[:, 1], r * sten_c[:, 2]], -1)
        wxp_c = jnp.stack([sten_c[:, 3], sten_c[:, 4]], -1)  # (pc,TB,TB,2)
        xs = xb[src_c]                                       # (pc,TB_s,C,2)
        us = ub[src_c]
        nz = nzb[src_c]

        aligned = cmul(ln_c[:, :, :, None, :], us[:, None])  # (pc,TB,TB,C,2)
        p = aligned * nbins
        pC = jnp.clip(jnp.ceil(p), -nbins, nbins).astype(jnp.int32)
        pF = jnp.clip(jnp.floor(p), -nbins, nbins).astype(jnp.int32)
        pCf, pFf = pC.astype(p.dtype), pF.astype(p.dtype)
        w0 = (pCf[..., 0] - p[..., 0]) * (pCf[..., 1] - p[..., 1])
        w1 = (p[..., 0] - pFf[..., 0]) * (p[..., 1] - pFf[..., 1])
        w2 = (p[..., 0] - pFf[..., 0]) * (pCf[..., 1] - p[..., 1])
        w3 = (pCf[..., 0] - p[..., 0]) * (p[..., 1] - pFf[..., 1])

        votes = cmul(xs[:, None], wxp_c[..., None, :])       # (pc,TB,TB,C,2)
        votes = jnp.where(nz[:, None, ..., None], votes, 0.0)

        iw = jnp.arange(w, dtype=jnp.int32)
        A_F = (pF[..., 0:1] + nbins == iw).astype(x.dtype)   # (pc,TB,TB,C,w)
        A_C = (pC[..., 0:1] + nbins == iw).astype(x.dtype)
        B_F = (pF[..., 1:2] + nbins == iw).astype(x.dtype)
        B_C = (pC[..., 1:2] + nbins == iw).astype(x.dtype)
        BF0 = w0[..., None] * B_F + w3[..., None] * B_C
        BC1 = w2[..., None] * B_F + w1[..., None] * B_C
        grid = jnp.einsum("ztscp,ztsca,ztscb->ztcpab", votes, A_F, BF0,
                          preferred_element_type=jnp.float32)
        grid = grid + jnp.einsum("ztscp,ztsca,ztscb->ztcpab", votes, A_C,
                                 BC1, preferred_element_type=jnp.float32)
        hist = jnp.einsum("ztcpu,us->ztcps",
                          grid.reshape(cb, TB, C, 2, w * w), fold,
                          preferred_element_type=jnp.float32)
        return carry.at[tgt_c].add(hist)

    def chunk_hist(carry, i):
        # dynamic_slice instead of a pre-reshaped scan input: scanning over
        # split(sten) makes XLA materialise a full LAYOUT COPY of the
        # multi-GB panel stencil (measured 5.16GB at 163k vertices)
        sten_c = jax.lax.dynamic_slice_in_dim(sten, i * pc, pc, axis=0)
        tgt_c = jax.lax.dynamic_slice_in_dim(meta[0], i * pc, pc, axis=0)
        src_c = jax.lax.dynamic_slice_in_dim(meta[1], i * pc, pc, axis=0)
        return hist_part(carry, sten_c, tgt_c, src_c), None

    # whole chunks under scan; the remainder as ONE static-slice tail call
    # (padding the panel axis would CONCATENATE — i.e. copy — the multi-GB
    # stencil; a static tail slice copies only the tail panels)
    n_main = P // pc
    init = jnp.zeros((nb_out, TB, C, 2, dS), dtype=x.dtype)
    # remat the chunk body: reverse-mode scan would otherwise stack each
    # step's (pc, TB, TB, C, w) one-hot/vote residuals over all ~P/pc
    # steps — terabytes at 163k vertices.  With remat the residuals are
    # the already-resident stencil plus the step index.
    hist, _ = jax.lax.scan(
        jax.checkpoint(chunk_hist), init,
        jnp.arange(n_main, dtype=jnp.int32))
    if P % pc:
        n0 = n_main * pc
        hist = jax.checkpoint(hist_part)(
            hist, sten[n0:], meta[0, n0:], meta[1, n0:])
    return soft_abs(jnp.moveaxis(hist.reshape(n_out, C, 2, dS), 2, 3))


def echo_banded(x, comp, n_bins: int, block_chunk: int = 1, halo=None):
    """Gather-free ECHO over the banded slot layout (CompressedBandedTable).

    Semantically identical to `echo` (reference nn/echo.py:65-148) but the
    per-slot source features are obtained by windowing x with padded block
    shifts — pure slices, whose transpose is again slicing, so the backward
    contains NO scatter (the XLA path's backward is dominated by the
    scatter-add transpose of its x[src] gather; see docs/KERNEL_NOTES.md).
    The W' slot axis replaces the CSR slot axis in the separable one-hot
    splat; empty band slots carry wxp=0 so their votes vanish.

    comp: precomp.banded.CompressedBandedTable (planes r, e^{iθ}, wxp).
    x: (N, C, 2) with N == comp.n_pad.  Returns (N, C, dS).
    block_chunk: target blocks per lax.map step.  1 (default) keeps the
    (cb, TB, W', C, 2) intermediates smallest and measured 1.8x faster
    fwd+bwd than 4 on chip at the correspondence shapes (the op is
    HBM-intermediate-bound under XLA).
    halo: optional (left, right) boundary rows for a shard_map graph axis
    (see precomp.banded.window_blocks); None = single-device zero padding.
    """
    from ..precomp.banded import window_blocks

    sten = comp.sten_band                       # (nb, 5, TB, W')
    nb_, _, TB, Wp = sten.shape
    nh = comp.nh
    NJ = 2 * nh + 1
    N, C = x.shape[0], x.shape[1]
    nbins = n_bins
    w = 2 * nbins + 1
    dmap_np, dS = disk_map(nbins)
    fold_np = np.zeros((w * w, dS), dtype=np.float32)
    fold_np[np.arange(w * w), dmap_np] = 1.0
    fold = jnp.asarray(fold_np)

    xs_w = window_blocks(x, nb_, TB, nh, halo=halo)   # (nb, W', C, 2)
    # unit direction / origin mask derived from the windowed features (local
    # elementwise math — avoids separate halo exchanges for each derived
    # array; padded halo rows are exact zeros -> origin -> votes vanish)
    un_w = cconj(soft_unit(xs_w))               # (nb, W', C, 2)
    nz_w = jnp.logical_not(is_origin(xs_w))     # (nb, W', C)

    r = sten[:, 0]                                           # (nb, TB, W')
    ln = jnp.stack([r * sten[:, 1], r * sten[:, 2]], -1)     # (nb, TB, W', 2)
    wxp = jnp.stack([sten[:, 3], sten[:, 4]], -1)            # (nb, TB, W', 2)

    def blocks_hist(ln_b, wxp_b, xs, us, nz):
        # ln_b/wxp_b (cb, TB, W', 2); xs/us (cb, W', C, 2); nz (cb, W', C)
        aligned = cmul(ln_b[:, :, :, None, :], us[:, None])  # (cb,TB,W',C,2)
        p = aligned * nbins
        pC = jnp.clip(jnp.ceil(p), -nbins, nbins).astype(jnp.int32)
        pF = jnp.clip(jnp.floor(p), -nbins, nbins).astype(jnp.int32)
        pCf, pFf = pC.astype(p.dtype), pF.astype(p.dtype)
        w0 = (pCf[..., 0] - p[..., 0]) * (pCf[..., 1] - p[..., 1])
        w1 = (p[..., 0] - pFf[..., 0]) * (p[..., 1] - pFf[..., 1])
        w2 = (p[..., 0] - pFf[..., 0]) * (pCf[..., 1] - p[..., 1])
        w3 = (pCf[..., 0] - p[..., 0]) * (p[..., 1] - pFf[..., 1])

        votes = cmul(xs[:, None], wxp_b[:, :, :, None, :])   # (cb,TB,W',C,2)
        votes = jnp.where(nz[:, None, ..., None], votes, 0.0)

        iw = jnp.arange(w, dtype=jnp.int32)
        A_F = (pF[..., 0:1] + nbins == iw).astype(x.dtype)   # (cb,TB,W',C,w)
        A_C = (pC[..., 0:1] + nbins == iw).astype(x.dtype)
        B_F = (pF[..., 1:2] + nbins == iw).astype(x.dtype)
        B_C = (pC[..., 1:2] + nbins == iw).astype(x.dtype)
        BF0 = w0[..., None] * B_F + w3[..., None] * B_C
        BC1 = w2[..., None] * B_F + w1[..., None] * B_C
        grid = jnp.einsum("ztwcp,ztwca,ztwcb->ztcpab", votes, A_F, BF0,
                          preferred_element_type=jnp.float32)
        grid = grid + jnp.einsum("ztwcp,ztwca,ztwcb->ztcpab", votes, A_C,
                                 BC1, preferred_element_type=jnp.float32)
        cb = grid.shape[0]
        hist = jnp.einsum(
            "ztcpu,us->ztcps", grid.reshape(cb, TB, C, 2, w * w), fold,
            preferred_element_type=jnp.float32)
        return hist                                          # (cb,TB,C,2,dS)

    if nb_ % block_chunk:
        block_chunk = 1
    nchunks = nb_ // block_chunk
    csplit = lambda a: a.reshape(nchunks, block_chunk, *a.shape[1:])
    hist = jax.lax.map(
        lambda args: blocks_hist(*args),
        (csplit(ln), csplit(wxp), csplit(xs_w), csplit(un_w), csplit(nz_w)),
    )                                            # (nchunks, cb, TB, C, 2, dS)
    hist = hist.reshape(N, C, 2, dS)
    return soft_abs(jnp.moveaxis(hist, 2, 3))
