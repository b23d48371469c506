"""Banded stencil tables — the gather-free layout for the Pallas hot loop.

TPU has no fast arbitrary gather; the idiomatic way to run the field-conv
SpMM at MXU speed is to make the support-graph adjacency *band-limited*:
re-index vertices with reverse Cuthill-McKee so every edge satisfies
|src − tgt| ≤ bandwidth, then store the per-edge stencil factors in dense
per-target band slots.  The runtime contraction becomes a sequence of dense
(R·TB, TB) × (TB, 2C) matmuls over neighboring vertex blocks — no gather,
no scatter, perfectly shaped for the MXU (see ops/pallas/band_conv.py).

Layout (TB = target block size, nh = half-window in blocks, W' = (2nh+1)·TB):
  rsten_band: (R, N, W') — radial weights of the edge (tgt n ← src s) at
              slot w' = (s_block − n_block + nh)·TB + s%TB; 0 where no edge.
  fwxp_band:  (K, 2, N, W') — e^{ikθ}·w·xp planar parts, same slots.
The leading (R) / (K, 2) axes are pre-transposed so the kernel slices
(TB, W') panels without relayout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .edge_table import EdgeTable


@dataclasses.dataclass
class BandedTable:
    """Block-major packed stencil: one contiguous (R+2K, TB, W') chunk per
    target block, so each kernel grid step issues a single large DMA —
    per-transfer overhead, not bandwidth, dominates this pipeline (measured:
    ~19 strided ~200KB transfers/step ran at ~200GB/s effective vs ~2TB/s
    for contiguous streams).

    sten_band: (nb, R+2K, TB, W') float32.  Planes 0..R-1 hold the radial
    interpolation weights; plane R+2k+p holds fwxp_k's re (p=0) / im (p=1).
    """

    sten_band: jnp.ndarray
    tb: int
    nh: int
    n_pad: int
    band_limit: int
    n_rings: int

    @property
    def w_slots(self) -> int:
        return (2 * self.nh + 1) * self.tb

    @property
    def k_width(self) -> int:
        return 2 * self.band_limit + 1

    # --- unpacked views (tests / halo sharding helpers) -------------------

    @property
    def rsten_band(self):
        """(R, N, W') view for tests."""
        nb, P, TB, Wp = self.sten_band.shape
        R = self.n_rings
        a = self.sten_band[:, :R]                     # (nb, R, TB, W')
        return jnp.moveaxis(a, 1, 0).reshape(R, nb * TB, Wp)

    @property
    def fwxp_band(self):
        """(K, 2, N, W') view for tests."""
        nb, P, TB, Wp = self.sten_band.shape
        R, K = self.n_rings, self.k_width
        a = self.sten_band[:, R:].reshape(nb, K, 2, TB, Wp)
        return jnp.moveaxis(a, 0, 2).reshape(K, 2, nb * TB, Wp)


jax.tree_util.register_dataclass(
    BandedTable,
    data_fields=["sten_band"],
    meta_fields=["tb", "nh", "n_pad", "band_limit", "n_rings"],
)


def pack_sten_band(rb: np.ndarray, fb: np.ndarray, tb: int) -> np.ndarray:
    """(R, N, W') + (K, 2, N, W') -> block-major (nb, R+2K, TB, W')."""
    R, N, Wp = rb.shape
    K = fb.shape[0]
    nb = N // tb
    out = np.empty((nb, R + 2 * K, tb, Wp), dtype=np.float32)
    out[:, :R] = np.moveaxis(rb.reshape(R, nb, tb, Wp), 0, 1)
    out[:, R:] = np.moveaxis(
        fb.reshape(K * 2, nb, tb, Wp), 0, 1)
    return out


def rcm_order(supp_edges: np.ndarray, n_vertices: int) -> np.ndarray:
    """Reverse Cuthill-McKee permutation minimising the graph bandwidth.

    Returns perm such that new_index = perm_inv[old_index]; apply with
    `reorder_precompute`.
    """
    e = np.asarray(supp_edges)
    a = sp.csr_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n_vertices, n_vertices)
    )
    perm = sp.csgraph.reverse_cuthill_mckee(a + a.T, symmetric_mode=True)
    return np.asarray(perm, dtype=np.int64)


def bandwidth(supp_edges: np.ndarray) -> int:
    e = np.asarray(supp_edges)
    if len(e) == 0:
        return 0
    return int(np.abs(e[:, 0] - e[:, 1]).max())


def build_banded_table(
    table: EdgeTable,
    tb: int = 128,
    max_nh: int = 4,
) -> BandedTable:
    """Convert a padded-CSR EdgeTable (whose vertex order should already be
    bandwidth-minimised) into banded layout.

    Requires n_pad % tb == 0 and graph bandwidth ≤ max_nh·tb.
    """
    src = np.asarray(table.src)
    mask = np.asarray(table.mask) > 0
    rsten = np.asarray(table.rsten)
    fwxp = np.asarray(table.fwxp)
    N, D = src.shape
    R, K = table.n_rings, table.k_width
    if N % tb:
        raise ValueError(f"n_pad={N} not a multiple of tb={tb}")

    tgt_idx, slot_idx = np.nonzero(mask)
    s = src[tgt_idx, slot_idx]
    bw = int(np.abs(s - tgt_idx).max()) if len(s) else 0
    nh = max(1, -(-bw // tb))
    if nh > max_nh:
        raise ValueError(
            f"graph bandwidth {bw} needs nh={nh} > max_nh={max_nh}; "
            "re-order vertices (rcm_order) or raise max_nh"
        )
    Wp = (2 * nh + 1) * tb

    j = (s // tb) - (tgt_idx // tb) + nh
    wp = j * tb + (s % tb)
    assert (wp >= 0).all() and (wp < Wp).all()

    # The band layout stores the factored stencil (rsten ⊗ fwxp) per
    # (target, source) slot; parallel edges with different factors cannot be
    # merged into one slot exactly, so reject them.  Support graphs built by
    # radius_graph never contain parallel edges.
    flat = tgt_idx * np.int64(Wp) + wp
    if len(np.unique(flat)) != len(flat):
        raise ValueError(
            "parallel edges (duplicate (target, source) pairs) cannot be "
            "represented in the factored band layout; deduplicate the "
            "support graph first"
        )
    rb = np.zeros((R, N, Wp), dtype=np.float32)
    fb = np.zeros((K, 2, N, Wp), dtype=np.float32)
    rb[:, tgt_idx, wp] = rsten[tgt_idx, slot_idx].T
    fb[:, :, tgt_idx, wp] = np.moveaxis(fwxp[tgt_idx, slot_idx], 0, -1)

    return BandedTable(
        sten_band=jnp.asarray(pack_sten_band(rb, fb, tb)),
        tb=tb, nh=nh, n_pad=N,
        band_limit=table.band_limit, n_rings=table.n_rings,
    )


@dataclasses.dataclass
class CompressedBandedTable:
    """Bandwidth-limited stencil in *compressed* form: 5 planes instead of
    R + 2K, block-major packed like BandedTable.  The kernel reconstructs
    the radial hats (piecewise-linear on the sqrt-spaced ring knots,
    stencil.radial_interpolant) and the angular factors e^{ikθ}·wxp (phasor
    powers) in VMEM — ~3x smaller stencil memory footprint for large meshes.

      sten_band: (nb, 5, TB, W') — planes (r, ph_re, ph_im, wxp_re, wxp_im);
      empty slots hold R_SENTINEL in the r plane and 0 in wxp.
    """

    sten_band: jnp.ndarray
    tb: int
    nh: int
    n_pad: int
    band_limit: int
    n_rings: int

    @property
    def w_slots(self) -> int:
        return (2 * self.nh + 1) * self.tb

    @property
    def k_width(self) -> int:
        return 2 * self.band_limit + 1


R_SENTINEL = 9.0  # kills every radial hat (support ends at the virtual knot 2)


jax.tree_util.register_dataclass(
    CompressedBandedTable,
    data_fields=["sten_band"],
    meta_fields=["tb", "nh", "n_pad", "band_limit", "n_rings"],
)


def build_compressed_banded(
    table: EdgeTable,
    tb: int = 128,
    max_nh: int = 4,
) -> CompressedBandedTable:
    """Compressed-stencil variant of build_banded_table (same slot layout)."""
    src = np.asarray(table.src)
    mask = np.asarray(table.mask) > 0
    ln = np.asarray(table.ln, dtype=np.float64)
    wxp = np.asarray(table.wxp)
    N, D = src.shape
    if N % tb:
        raise ValueError(f"n_pad={N} not a multiple of tb={tb}")

    tgt_idx, slot_idx = np.nonzero(mask)
    s = src[tgt_idx, slot_idx]
    bw = int(np.abs(s - tgt_idx).max()) if len(s) else 0
    nh = max(1, -(-bw // tb))
    if nh > max_nh:
        raise ValueError(
            f"graph bandwidth {bw} needs nh={nh} > max_nh={max_nh}; "
            "re-order vertices (rcm_order) or raise max_nh"
        )
    Wp = (2 * nh + 1) * tb

    j = (s // tb) - (tgt_idx // tb) + nh
    wp = j * tb + (s % tb)
    flat = tgt_idx * np.int64(Wp) + wp
    if len(np.unique(flat)) != len(flat):
        raise ValueError(
            "parallel edges cannot be represented in the band layout")

    lv = ln[tgt_idx, slot_idx]                       # (E, 2)
    rv = np.hypot(lv[:, 0], lv[:, 1])
    with np.errstate(invalid="ignore"):
        ph = lv / np.maximum(rv, 1e-30)[:, None]
    ph[rv < 1e-30] = [1.0, 0.0]                      # θ=0 at r=0 edges

    planes = np.zeros((5, N, Wp), dtype=np.float32)
    planes[0] = R_SENTINEL
    planes[0, tgt_idx, wp] = rv
    planes[1:3, tgt_idx, wp] = ph.T
    planes[3:5, tgt_idx, wp] = wxp[tgt_idx, slot_idx].T
    nb = N // tb
    packed = np.moveaxis(planes.reshape(5, nb, tb, Wp), 0, 1)

    return CompressedBandedTable(
        sten_band=jnp.asarray(np.ascontiguousarray(packed)),
        tb=tb, nh=nh, n_pad=N,
        band_limit=table.band_limit, n_rings=table.n_rings,
    )


@dataclasses.dataclass
class BlockSparseTable:
    """Block-SPARSE band: per target block an explicit list of source
    blocks instead of a contiguous ±nh window.

    The dense band's memory is N·(R+2K)·(2·bandwidth) — O(N^1.5) on real
    surface meshes, where RCM bandwidth grows ~√N (measured: bw 3163 at
    163k vertices → nh 25, a 37GB stencil).  A surface mesh's 128-target
    block only ever touches a handful of source blocks, so storing the
    neighbor-block LIST keeps the stencil at N·(R+2K)·NJ·TB with NJ
    constant in N.  The kernel reads panel j of block b against source
    block `nbr[b, j]` via scalar-prefetch index maps
    (ops/pallas/band_conv.py: _band_sparse_*).

      sten_band: (nb, R+2K, TB, NJ·TB) — same plane layout as BandedTable;
      nbr: (nb, NJ) int32 — source block per panel; padding entries point
      at block b itself and carry all-zero stencil planes.
    """

    sten_band: jnp.ndarray
    nbr: jnp.ndarray
    tb: int
    n_pad: int
    band_limit: int
    n_rings: int

    @property
    def nj(self) -> int:
        return self.nbr.shape[1]

    @property
    def k_width(self) -> int:
        return 2 * self.band_limit + 1


jax.tree_util.register_dataclass(
    BlockSparseTable,
    data_fields=["sten_band", "nbr"],
    meta_fields=["tb", "n_pad", "band_limit", "n_rings"],
)


def build_block_sparse_banded(
    table: EdgeTable,
    tb: int = 128,
    nj_max: int | None = None,
) -> BlockSparseTable:
    """Build the block-sparse band from a padded-CSR EdgeTable.

    Vertex order should still be locality-friendly (rcm_order) — NJ is the
    max number of distinct source blocks any target block touches.
    """
    src = np.asarray(table.src)
    mask = np.asarray(table.mask) > 0
    rsten = np.asarray(table.rsten)
    fwxp = np.asarray(table.fwxp)
    N, D = src.shape
    R, K = table.n_rings, table.k_width
    if N % tb:
        raise ValueError(f"n_pad={N} not a multiple of tb={tb}")
    nb = N // tb

    tgt_idx, slot_idx = np.nonzero(mask)
    s = src[tgt_idx, slot_idx]
    tblk = tgt_idx // tb
    sblk = s // tb

    # per target block: sorted unique source blocks
    pair = np.unique(tblk * np.int64(nb) + sblk)
    pb, ps = pair // nb, pair % nb
    counts = np.bincount(pb, minlength=nb)
    NJ = int(counts.max(initial=1))
    if nj_max is not None and NJ > nj_max:
        raise ValueError(f"block-sparse NJ={NJ} exceeds nj_max={nj_max}")
    nbr = np.tile(np.arange(nb, dtype=np.int32)[:, None], (1, NJ))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    jj_of_pair = np.arange(len(pair)) - starts[pb]
    nbr[pb, jj_of_pair] = ps

    # panel index of each edge: position of its source block in nbr[tblk]
    # (ps lists are sorted per pb, so searchsorted within the row works)
    j = np.searchsorted(pair, tblk * np.int64(nb) + sblk) - starts[tblk]
    wp = j * tb + (s % tb)
    Wp = NJ * tb
    flat = tgt_idx * np.int64(Wp) + wp
    if len(np.unique(flat)) != len(flat):
        raise ValueError(
            "parallel edges cannot be represented in the band layout")

    rb = np.zeros((R, N, Wp), dtype=np.float32)
    fb = np.zeros((K, 2, N, Wp), dtype=np.float32)
    rb[:, tgt_idx, wp] = rsten[tgt_idx, slot_idx].T
    fb[:, :, tgt_idx, wp] = np.moveaxis(fwxp[tgt_idx, slot_idx], 0, -1)

    return BlockSparseTable(
        sten_band=jnp.asarray(pack_sten_band(rb, fb, tb)),
        nbr=jnp.asarray(nbr),
        tb=tb, n_pad=N,
        band_limit=table.band_limit, n_rings=table.n_rings,
    )


def kd_order(points: np.ndarray, tb: int = 128) -> np.ndarray:
    """Vertex ordering by k-d tree leaves of <= tb points (median splits,
    depth-first).  For BLOCK layouts this beats RCM: a TB-row block is a
    compact surface patch, so its ε-ball sources span few other patches
    (measured at 163k vertices: panels/block mean 13 vs RCM 25.5)."""
    from .tiled import spatial_tiles

    return np.concatenate(spatial_tiles(np.asarray(points, float), tb))


@dataclasses.dataclass
class PanelTable:
    """Panel-CSR band: a flat list of (target-block, source-block) PANELS.

    The fixed-NJ block-sparse layout pads every target block to the MAX
    neighbor-block count; on large meshes the mean/max gap and the ~4% slot
    occupancy make the stencil explode (32.5GB at 163k vertices).  Here each
    nonempty (tgt-block, src-block) pair is one (planes, TB, TB) panel;
    panels are sorted by target block and the kernel iterates the grid over
    PANELS, accumulating each block's contrib in scratch between its
    `first` and `last` panels (ops/pallas/band_conv.py: _band_panel).
    Memory and FLOPs scale with the ACTUAL panel count — no NJ padding.

      sten: (P, planes, TB, TB) with planes = R+2K (dense: radial weights
        then fwxp_k re/im, the BandedTable plane layout) or 5 (compressed:
        (r, ph_re, ph_im, wxp_re, wxp_im) with R_SENTINEL at empty slots —
        the kernel rebuilds hats/phasors in VMEM; at 163k vertices the dense
        panels are ~10GB while compressed is ~3GB and fits HBM).
      meta:   (4, P) int32 rows (tgt, src, first_t, last_t), panels sorted
        by (tgt, src); drives the forward's scratch accumulation.
      meta_s: (4, P) int32 rows (pid, tgt, src, first_s + 2*last_s), the
        same panels sorted by (src, tgt); drives the by-source backward
        grid that writes dG blocks directly (no parts tensor, no scatter).
      Field-major layout: Mosaic pads every SMEM scalar-prefetch ROW to
        512 bytes, so a (P, n_fields) layout would cost P*512 bytes of SMEM
        (8.6MB at 163k vertices vs the 1MB budget); (n_fields, P) costs
        n_fields rows.
    Every block owns >= 1 panel as target AND >= 1 as source (missing blocks
    get a zero self-panel so their output/dG rows are written).
    """

    sten: jnp.ndarray
    meta: jnp.ndarray
    meta_s: jnp.ndarray
    tb: int
    n_pad: int
    band_limit: int
    n_rings: int
    compressed: bool = False
    chunk: int = 1

    @property
    def n_panels(self) -> int:
        return self.meta.shape[1]

    @property
    def k_width(self) -> int:
        return 2 * self.band_limit + 1


jax.tree_util.register_dataclass(
    PanelTable,
    data_fields=["sten", "meta", "meta_s"],
    meta_fields=["tb", "n_pad", "band_limit", "n_rings", "compressed",
                 "chunk"],
)


def _pad_groups(keys: np.ndarray, chunk: int):
    """Positions for padding sorted group runs to multiples of `chunk`.

    keys: (P,) sorted group labels.  Returns (new_P, new_pos (P,), pad_pos,
    pad_key) — old item p moves to new_pos[p]; pad slots (with their group
    label) fill the remainder of each group."""
    uniq, counts = np.unique(keys, return_counts=True)
    padded = -(-counts // chunk) * chunk
    starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    start_of = dict(zip(uniq.tolist(), starts.tolist()))
    # offsets within group = position - group first position (keys sorted)
    first_pos = np.concatenate([[0], np.cumsum(counts)[:-1]])
    off = np.arange(len(keys)) - np.repeat(first_pos, counts)
    new_pos = np.repeat(starts, counts) + off
    new_P = int(padded.sum())
    mask = np.zeros(new_P, bool)
    mask[new_pos] = True
    pad_pos = np.nonzero(~mask)[0]
    # group label of each pad slot
    bounds = np.concatenate([starts, [new_P]])
    pad_key = uniq[np.searchsorted(bounds[1:], pad_pos, side="right")]
    return new_P, new_pos, pad_pos, pad_key


def build_panel_table(table: EdgeTable, tb: int = 128,
                      compressed: bool = False,
                      chunk: int = 1) -> PanelTable:
    """Build the panel-CSR band from a padded-CSR EdgeTable (vertex order
    should be block-local, e.g. kd_order).

    chunk > 1: pad every target group (and the backward's source groups)
    to a multiple of `chunk` with zero panels, so the kernels process
    `chunk` panels per grid step — the 163k-vertex step is dominated by
    per-grid-step pipeline overhead (docs/KERNEL_NOTES.md)."""
    src = np.asarray(table.src)
    mask = np.asarray(table.mask) > 0
    N, D = src.shape
    R, K = table.n_rings, table.k_width
    if N % tb:
        raise ValueError(f"n_pad={N} not a multiple of tb={tb}")
    nb = N // tb

    tgt_idx, slot_idx = np.nonzero(mask)
    s = src[tgt_idx, slot_idx]
    key = (tgt_idx // tb) * np.int64(nb) + s // tb
    ukeys = np.unique(key)
    # guarantee a panel per block as TARGET and as SOURCE (zero self-panel):
    # a block absent as target never writes its output rows; absent as
    # source never writes its dG rows in the by-source backward grid.
    miss_t = np.setdiff1d(np.arange(nb), np.unique(ukeys // nb))
    miss_s = np.setdiff1d(np.arange(nb), np.unique(ukeys % nb))
    missing = np.union1d(miss_t, miss_s)
    if len(missing):
        ukeys = np.unique(np.concatenate(
            [ukeys, missing * np.int64(nb) + missing]))
    P0 = len(ukeys)
    tgt0 = (ukeys // nb).astype(np.int32)
    src0 = (ukeys % nb).astype(np.int32)

    if chunk > 1:
        P, new_pos, pad_pos, pad_tgt = _pad_groups(tgt0, chunk)
        pan_tgt = np.empty(P, np.int32)
        pan_src = np.empty(P, np.int32)
        pan_tgt[new_pos], pan_src[new_pos] = tgt0, src0
        pan_tgt[pad_pos] = pad_tgt
        pan_src[pad_pos] = pad_tgt          # self-block: valid g fetch
        real = np.zeros(P, bool)
        real[new_pos] = True
        # the by-source view below needs >= 1 zero panel to point its own
        # pads at; when every TARGET group count is already a multiple of
        # chunk but some SOURCE group count is not, append a dedicated
        # all-zero chunk group (tgt = last block: its real `last` panel
        # moves to the group's end, which re-writes the same output rows
        # with an unchanged accumulator — a wasted grid step, not an error)
        src_counts = np.unique(src0, return_counts=True)[1]
        if not len(pad_pos) and (src_counts % chunk).any():
            extra = pan_tgt[-1]
            pan_tgt = np.concatenate(
                [pan_tgt, np.full(chunk, extra, np.int32)])
            pan_src = np.concatenate(
                [pan_src, np.full(chunk, extra, np.int32)])
            real = np.concatenate([real, np.zeros(chunk, bool)])
            pad_pos = np.arange(P, P + chunk)
            P += chunk
    else:
        P, pan_tgt, pan_src = P0, tgt0, src0
        new_pos = np.arange(P0)
        pad_pos = np.zeros(0, np.int64)
        real = np.ones(P, bool)

    first = np.ones(P, np.int32)
    first[1:] = (pan_tgt[1:] != pan_tgt[:-1]).astype(np.int32)
    last = np.ones(P, np.int32)
    last[:-1] = (pan_tgt[:-1] != pan_tgt[1:]).astype(np.int32)
    meta = np.stack([pan_tgt, pan_src, first, last], axis=0)

    # src-sorted view for the backward (over REAL panels; pads for chunked
    # grids reference zero panels from the target-side padding)
    real_idx = np.nonzero(real)[0].astype(np.int32)
    r_tgt, r_src = pan_tgt[real_idx], pan_src[real_idx]
    order = np.lexsort((r_tgt, r_src))
    s_pid = real_idx[order]
    s_tgt = r_tgt[order]
    s_src = r_src[order]
    if chunk > 1:
        Ps, s_new_pos, s_pad_pos, s_pad_src = _pad_groups(s_src, chunk)
        if len(s_pad_pos) and not len(pad_pos):
            raise AssertionError("src pads need a zero panel to reference")
        pid_a = np.empty(Ps, np.int32)
        tgt_a = np.empty(Ps, np.int32)
        src_a = np.empty(Ps, np.int32)
        pid_a[s_new_pos], tgt_a[s_new_pos], src_a[s_new_pos] = \
            s_pid, s_tgt, s_src
        if len(s_pad_pos):
            pid_a[s_pad_pos] = pad_pos[0]   # any zero panel
            tgt_a[s_pad_pos] = 0
            src_a[s_pad_pos] = s_pad_src
    else:
        Ps, pid_a, tgt_a, src_a = P0, s_pid, s_tgt, s_src
    first_s = np.ones(Ps, np.int32)
    first_s[1:] = (src_a[1:] != src_a[:-1]).astype(np.int32)
    last_s = np.ones(Ps, np.int32)
    last_s[:-1] = (src_a[:-1] != src_a[1:]).astype(np.int32)
    # flags packed into one row (first + 2*last): Mosaic pads SMEM scalar
    # operands to 8 rows, so a 5th row costs 60% more SMEM than a 4th
    meta_s = np.stack([pid_a, tgt_a, src_a, first_s + 2 * last_s], axis=0)

    pid = new_pos[np.searchsorted(ukeys, key)]
    t_loc = tgt_idx % tb
    s_loc = s % tb
    flat = pid * np.int64(tb * tb) + t_loc * tb + s_loc
    if len(np.unique(flat)) != len(flat):
        raise ValueError(
            "parallel edges cannot be represented in the band layout")

    if compressed:
        ln = np.asarray(table.ln, dtype=np.float64)
        wxp = np.asarray(table.wxp)
        lv = ln[tgt_idx, slot_idx]                       # (E, 2)
        rv = np.hypot(lv[:, 0], lv[:, 1])
        with np.errstate(invalid="ignore"):
            ph = lv / np.maximum(rv, 1e-30)[:, None]
        ph[rv < 1e-30] = [1.0, 0.0]                      # θ=0 at r=0 edges
        sten = np.zeros((P, 5, tb, tb), dtype=np.float32)
        sten[:, 0] = R_SENTINEL
        sten[pid, 0, t_loc, s_loc] = rv
        sten[pid, 1, t_loc, s_loc] = ph[:, 0]
        sten[pid, 2, t_loc, s_loc] = ph[:, 1]
        sten[pid, 3, t_loc, s_loc] = wxp[tgt_idx, slot_idx, 0]
        sten[pid, 4, t_loc, s_loc] = wxp[tgt_idx, slot_idx, 1]
    else:
        rsten = np.asarray(table.rsten)
        fwxp = np.asarray(table.fwxp)
        vals = np.concatenate(
            [rsten[tgt_idx, slot_idx],
             fwxp[tgt_idx, slot_idx].reshape(len(tgt_idx), 2 * K)], axis=1)
        sten = np.zeros((P, R + 2 * K, tb, tb), dtype=np.float32)
        sten[pid, :, t_loc, s_loc] = vals

    return PanelTable(
        sten=jnp.asarray(sten), meta=jnp.asarray(meta),
        meta_s=jnp.asarray(meta_s),
        tb=tb, n_pad=N, band_limit=table.band_limit, n_rings=table.n_rings,
        compressed=compressed, chunk=chunk,
    )


def cast_panel_sten(panel, dtype=None):
    """Store the panel stencil at a narrower dtype (default bfloat16).

    Halves the kernel's dominant DMA stream and the multi-GB HBM
    footprint; the kernel casts planes back to f32 on read
    (ops/pallas/band_conv.py::_panel_pairs).  Quantisation is ~1e-3
    relative on radii/phasors/weights — the same error class as the
    tiled-VHM truncation measured training-free (docs/KERNEL_NOTES.md).
    Accepts PanelTable or CompactPanelTable.
    """
    dtype = jnp.bfloat16 if dtype is None else dtype
    return dataclasses.replace(panel, sten=panel.sten.astype(dtype))


@dataclasses.dataclass
class CompactPanelTable:
    """Compacted panel-CSR: dense 128-wide panels of gathered sources.

    The regular PanelTable pays one (TB, TB) panel for every (target-block,
    source-block) pair with ≥1 edge; at 163k vertices that is 3.7% slot
    occupancy — 96% of every panel is masked zeros, and the VPU-bound ECHO
    kernel burns its time on them.  Here each target block's DISTINCT
    source vertices are compacted into consecutive columns (padded to a
    multiple of ``ts`` with inert columns), so occupancy triples, the
    grid shrinks 3× (5.6k vs 16.9k panels at 163k) and the stencil drops
    5.54 → 1.84 GB.  The price is one cheap row-gather: the runtime
    feature array for panel p, column j is ``x[src_idx[p, j]]`` —
    measured ~2-3 ms for the ECHO shapes at 163k under the device-loop
    protocol, noise against the 1.8 s op.  The backward needs NO by-source
    panel ordering: every panel writes its own gathered-column gradient
    block (disjoint by construction) and one ``segment_sum`` over
    ``src_idx`` folds them onto the vertices — scatter-free.

      sten:    (P, 5, TB, TS) compressed planes (r, ph_re, ph_im, wxp_re,
               wxp_im), R_SENTINEL in the r plane at empty slots — the
               exact PanelTable compressed format, so the in-VMEM
               reconstruction helpers are shared.
      meta:    (4, P) int32 rows (tgt_block, panel_id, first_t, last_t),
               panels sorted by target block (field-major: Mosaic pads
               SMEM scalar rows to 512 B — see PanelTable).
      src_idx: (P, TS) int32 — reordered-domain vertex index per column;
               dead columns point at vertex 0 (their stencil planes are
               zero, so votes and gradients vanish there).
    """

    sten: jnp.ndarray
    meta: jnp.ndarray
    src_idx: jnp.ndarray
    tb: int
    n_pad: int
    band_limit: int
    n_rings: int
    compressed: bool = True
    ts: int = 128

    @property
    def n_panels(self) -> int:
        return self.meta.shape[1]

    @property
    def k_width(self) -> int:
        return 2 * self.band_limit + 1


jax.tree_util.register_dataclass(
    CompactPanelTable,
    data_fields=["sten", "meta", "src_idx"],
    meta_fields=["tb", "n_pad", "band_limit", "n_rings", "compressed",
                 "ts"],
)


def build_compact_panel_table(table: EdgeTable, tb: int = 128,
                              ts: int = 128) -> CompactPanelTable:
    """Build the compacted panel-CSR table from a padded-CSR EdgeTable
    (vertex order should be block-local, e.g. kd_order).

    Compressed planes only: the compact layout exists for the 100k+ regime
    where dense (R+2K)-plane panels do not fit HBM anyway."""
    src = np.asarray(table.src)
    mask = np.asarray(table.mask) > 0
    N, D = src.shape
    if N % tb:
        raise ValueError(f"n_pad={N} not a multiple of tb={tb}")
    nb = N // tb

    tgt_idx, slot_idx = np.nonzero(mask)
    s = src[tgt_idx, slot_idx]
    blk = tgt_idx // tb
    order = np.lexsort((s, blk))
    tgt_o, slot_o, s_o, blk_o = (tgt_idx[order], slot_idx[order], s[order],
                                 blk[order])

    # distinct (block, source) pairs -> one compact column each
    key = blk_o.astype(np.int64) * N + s_o
    uk, inv_k = np.unique(key, return_inverse=True)
    ub = (uk // N).astype(np.int64)
    us = (uk % N).astype(np.int32)
    counts = np.bincount(ub, minlength=nb)           # distinct srcs / block
    padded = np.maximum(-(-counts // ts) * ts, ts)   # >= 1 panel per block
    col_start = np.concatenate([[0], np.cumsum(padded)[:-1]])
    first_of = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(uk)) - first_of[ub]         # rank within block
    gcol = col_start[ub] + rank                      # global column slot
    total_cols = int(padded.sum())
    P = total_cols // ts

    n_panels_blk = padded // ts
    pan_tgt = np.repeat(np.arange(nb, dtype=np.int32), n_panels_blk)
    first = np.ones(P, np.int32)
    first[1:] = (pan_tgt[1:] != pan_tgt[:-1]).astype(np.int32)
    last = np.ones(P, np.int32)
    last[:-1] = (pan_tgt[:-1] != pan_tgt[1:]).astype(np.int32)
    meta = np.stack([pan_tgt, np.arange(P, dtype=np.int32), first, last],
                    axis=0)

    src_cols = np.zeros(total_cols, np.int32)        # dead columns -> 0
    src_cols[gcol] = us
    src_idx = src_cols.reshape(P, ts)

    # edges -> (panel, target row, compact column)
    edge_gcol = gcol[inv_k]
    pid = edge_gcol // ts
    c_loc = (edge_gcol % ts).astype(np.int64)
    t_loc = (tgt_o % tb).astype(np.int64)
    flat = pid * np.int64(tb * ts) + t_loc * ts + c_loc
    if len(np.unique(flat)) != len(flat):
        raise ValueError(
            "parallel edges cannot be represented in the compact layout")

    ln = np.asarray(table.ln, dtype=np.float64)
    wxp = np.asarray(table.wxp)
    lv = ln[tgt_o, slot_o]                           # (E, 2)
    rv = np.hypot(lv[:, 0], lv[:, 1])
    with np.errstate(invalid="ignore"):
        ph = lv / np.maximum(rv, 1e-30)[:, None]
    ph[rv < 1e-30] = [1.0, 0.0]
    sten = np.zeros((P, 5, tb, ts), dtype=np.float32)
    sten[:, 0] = R_SENTINEL
    sten[pid, 0, t_loc, c_loc] = rv
    sten[pid, 1, t_loc, c_loc] = ph[:, 0]
    sten[pid, 2, t_loc, c_loc] = ph[:, 1]
    sten[pid, 3, t_loc, c_loc] = wxp[tgt_o, slot_o, 0]
    sten[pid, 4, t_loc, c_loc] = wxp[tgt_o, slot_o, 1]

    return CompactPanelTable(
        sten=jnp.asarray(sten), meta=jnp.asarray(meta),
        src_idx=jnp.asarray(src_idx),
        tb=tb, n_pad=N, band_limit=table.band_limit,
        n_rings=table.n_rings, compressed=True, ts=ts,
    )


def window_blocks(a, nb: int, tb: int, nh: int, halo=None):
    """Window a per-vertex array by padded block shifts: the banded-layout
    replacement for the ``x[src]`` gather.

    a: (N, ...) with N == nb·tb.  Returns (nb, W', ...) where
    win[b, j·tb + s] = a[(b - nh + j)·tb + s] for j in 0..2nh — pure slices,
    whose transpose is again slicing, so backward passes contain no scatter.

    halo: optional (left, right) rows of shape (nh·tb, ...) supplying the
    out-of-range blocks (the ppermuted ring-neighbor boundary rows under a
    shard_map graph axis; parallel/halo.py).  None pads with zeros (single
    device: out-of-range slots carry zero stencil anyway).
    """
    NJ = 2 * nh + 1
    if halo is None:
        ab = a.reshape(nb, tb, *a.shape[1:])
        pad = [(nh, nh)] + [(0, 0)] * a.ndim
        ap = jnp.pad(ab, pad)
    else:
        left, right = halo
        ext = jnp.concatenate([left, a, right], axis=0)
        ap = ext.reshape(nb + 2 * nh, tb, *a.shape[1:])
    return jnp.concatenate([ap[j:j + nb] for j in range(NJ)], axis=1)


def reorder_precompute(perm: np.ndarray, supp_edges: np.ndarray, *vertex_arrays):
    """Apply a vertex permutation: vertex v becomes position perm_pos[v].

    perm: array of old indices in new order (as returned by rcm_order).
    Returns (new_supp_edges, *reordered_vertex_arrays) — edge endpoints are
    re-labelled; per-vertex arrays are re-ordered.
    """
    perm = np.asarray(perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    e = np.asarray(supp_edges)
    new_edges = inv[e]
    outs = tuple(np.asarray(a)[perm] for a in vertex_arrays)
    return (new_edges,) + outs


@dataclasses.dataclass
class PanelShards:
    """Per-shard panel tables for graph-parallel execution, stacked on a
    leading shard axis for shard_map (parallel/panel_gp.py).

    Layout per shard s (owning target blocks [s·nbl, (s+1)·nbl)):
      sten  (S, P, planes, TB, TB) — the shard's panels (tgt sorted), zero
        padding panels appended to the max per-shard count;
      meta  (S, 4, P) — (tgt LOCAL block, src GLOBAL block, first_t,
        last_t); padding panels repeat the last real (tgt, src) with flags
        0 so they neither reset nor flush the accumulator;
      meta_s (S, 4, P) — (pid, tgt LOCAL, src GLOBAL, first_s + 2*last_s)
        sorted by (src, tgt) within the shard;
      coverage (S, nb_global) — 1 where the shard owns >= 1 panel of that
        source block (the backward zeroes unwritten dG blocks by this).
    The forward reads the all_gather'ed GLOBAL g by src block; the
    backward emits dG over global rows, masked by coverage, and the
    all_gather transpose (psum_scatter) sums shards' contributions.
    """

    sten: jnp.ndarray
    meta: jnp.ndarray
    meta_s: jnp.ndarray
    coverage: jnp.ndarray
    tb: int
    n_pad: int
    n_local: int
    band_limit: int
    n_rings: int
    compressed: bool = False

    @property
    def n_shards(self) -> int:
        return self.sten.shape[0]


jax.tree_util.register_dataclass(
    PanelShards,
    data_fields=["sten", "meta", "meta_s", "coverage"],
    meta_fields=["tb", "n_pad", "n_local", "band_limit", "n_rings",
                 "compressed"],
)


@dataclasses.dataclass
class CompactShards:
    """Per-shard CompactPanelTables for graph-parallel execution, stacked
    on a leading shard axis for shard_map (parallel/panel_gp.py).

    Simpler than PanelShards: no by-source view and no coverage mask —
    each shard's backward writes its own panels' gathered columns and one
    segment_sum over the GLOBAL ``src_idx`` produces a full-length dX
    (exact zeros at unreferenced rows), whose all_gather transpose
    psum_scatters onto the owners.

      sten    (S, P, 5, TB, TS) — zero padding panels to the max count;
      meta    (S, 4, P) — (tgt LOCAL block, panel_id, first_t, last_t),
        padding panels repeat the last real tgt with flags 0;
      src_idx (S, P, TS) int32 — GLOBAL vertex index per column (padding
        panels gather row 0; their stencil planes are zero, so votes and
        gradients vanish).
    """

    sten: jnp.ndarray
    meta: jnp.ndarray
    src_idx: jnp.ndarray
    tb: int
    n_pad: int
    n_local: int
    band_limit: int
    n_rings: int
    compressed: bool = True
    ts: int = 128

    @property
    def n_shards(self) -> int:
        return self.sten.shape[0]


jax.tree_util.register_dataclass(
    CompactShards,
    data_fields=["sten", "meta", "src_idx"],
    meta_fields=["tb", "n_pad", "n_local", "band_limit", "n_rings",
                 "compressed", "ts"],
)


def shard_compact_table(compact: CompactPanelTable,
                        n_shards: int) -> CompactShards:
    """Split a global CompactPanelTable by contiguous target-block ranges
    (panels are target-sorted, so each shard is one slice; first/last
    flags stay valid because slices cut at whole target groups)."""
    sten = np.asarray(compact.sten)
    meta = np.asarray(compact.meta)
    src_idx = np.asarray(compact.src_idx)
    nb = compact.n_pad // compact.tb
    if nb % n_shards:
        raise ValueError(f"nb={nb} not divisible by n_shards={n_shards}")
    nbl = nb // n_shards

    pieces = []
    for s in range(n_shards):
        lo_b, hi_b = s * nbl, (s + 1) * nbl
        sel = (meta[0] >= lo_b) & (meta[0] < hi_b)
        idx = np.nonzero(sel)[0]
        m = meta[:, idx].copy()
        m[0] -= lo_b
        pieces.append((sten[idx], m, src_idx[idx]))

    P_max = max(p[0].shape[0] for p in pieces)
    stens, metas, idxs = [], [], []
    for sten_s, m, si in pieces:
        pad = P_max - sten_s.shape[0]
        if pad:
            sten_s = np.concatenate(
                [sten_s, np.zeros((pad,) + sten_s.shape[1:], sten_s.dtype)])
            last_col = m[:, -1:].copy()
            last_col[2:] = 0                     # first_t = last_t = 0
            m = np.concatenate([m, np.repeat(last_col, pad, axis=1)], axis=1)
            si = np.concatenate(
                [si, np.zeros((pad, si.shape[1]), si.dtype)])
        stens.append(sten_s)
        metas.append(m)
        idxs.append(si)

    return CompactShards(
        sten=jnp.asarray(np.stack(stens)),
        meta=jnp.asarray(np.stack(metas)),
        src_idx=jnp.asarray(np.stack(idxs)),
        tb=compact.tb, n_pad=compact.n_pad, n_local=nbl * compact.tb,
        band_limit=compact.band_limit, n_rings=compact.n_rings,
        compressed=compact.compressed, ts=compact.ts,
    )


@dataclasses.dataclass
class CompactHaloShards(CompactShards):
    """CompactShards with BOUNDARY-COMPRESSED collectives.

    The plain compact gp all_gathers the full O(N) feature rows every
    layer — its own zero-overlap projection lands 8 all-DCN shards at
    78.5%, below the >=80% BASELINE bar (docs/KERNEL_NOTES.md r4).  But
    ``src_idx`` already names exactly which global rows each shard
    references, and with kd-ordered contiguous shards that set is mostly
    shard-local: only the boundary rows need the wire.  Here the
    referenced-row sets are resolved at BUILD time into

      send_idx (S, S, H) int32 — [owner, requester, k]: the LOCAL row
        (in the owner's [0, n_local)) the owner contributes as the
        requester's k-th halo row from it; pad slots repeat row 0 and
        are never referenced by the requester;
      src_idx — REMAPPED into each shard's extended domain
        [0, n_local) local rows ++ [n_local + o*H + k) halo rows,

    so the runtime exchange is one all_to_all of (S, H) row-buffers
    (parallel/panel_gp.py::halo_exchange) instead of an all_gather of all
    N rows — H/n_local is the boundary fraction, ~2-6% at the 163k
    north-star config.  The AD transpose (all_to_all reversed + a halo-
    sized scatter-add) moves the same compressed volume back; N-shard
    values and grads stay exactly equal to 1 device
    (tests/test_panel_gp.py).  The reference has no distributed code at
    all (SURVEY.md §2.14b); this is the framework's own design axis.
    """

    send_idx: jnp.ndarray = None

    @property
    def h(self) -> int:
        return self.send_idx.shape[-1]


jax.tree_util.register_dataclass(
    CompactHaloShards,
    data_fields=["sten", "meta", "src_idx", "send_idx"],
    meta_fields=["tb", "n_pad", "n_local", "band_limit", "n_rings",
                 "compressed", "ts"],
)


def halo_compact_shards(shards: CompactShards,
                        h_multiple: int = 8) -> CompactHaloShards:
    """Resolve a CompactShards' referenced-row sets into the boundary-
    compressed exchange tables (see CompactHaloShards).

    h_multiple pads H (the per-peer halo row count) for clean tiling."""
    S = shards.n_shards
    nl = shards.n_local
    src = np.asarray(shards.src_idx)                 # (S, P, TS) global rows
    need = {}
    hmax = 1
    for s in range(S):
        refs = np.unique(src[s])
        owners = refs // nl
        for o in range(S):
            if o == s:
                continue
            rows = refs[owners == o]
            need[s, o] = rows
            hmax = max(hmax, len(rows))
    H = -(-hmax // h_multiple) * h_multiple
    send_idx = np.zeros((S, S, H), np.int32)
    new_src = np.empty_like(src)
    for s in range(S):
        lut = np.zeros(shards.n_pad, np.int64)
        lut[s * nl:(s + 1) * nl] = np.arange(nl)
        for o in range(S):
            if o == s:
                continue
            rows = need[s, o]
            lut[rows] = nl + o * H + np.arange(len(rows))
            send_idx[o, s, :len(rows)] = rows - o * nl
        new_src[s] = lut[src[s]]
    return CompactHaloShards(
        sten=shards.sten, meta=shards.meta,
        src_idx=jnp.asarray(new_src), send_idx=jnp.asarray(send_idx),
        tb=shards.tb, n_pad=shards.n_pad, n_local=shards.n_local,
        band_limit=shards.band_limit, n_rings=shards.n_rings,
        compressed=shards.compressed, ts=shards.ts,
    )


def compact_halo_stats(shards, n_shards: int = None) -> dict:
    """Boundary statistics of a sharded compact table: how many of each
    shard's referenced rows are remote (what halo_compact_shards will
    move) vs the n_pad rows the plain all_gather moves.

    Accepts a CompactShards, or (CompactPanelTable, n_shards) to compute
    directly from the global table without materializing per-shard
    stencil copies (the stats need only src_idx and the block→shard
    map)."""
    if n_shards is None:
        S, nl = shards.n_shards, shards.n_local
        srcs = [np.asarray(shards.src_idx[s]) for s in range(S)]
    else:
        S = n_shards
        nb = shards.n_pad // shards.tb
        if nb % S:
            raise ValueError(f"nb={nb} not divisible by n_shards={S}")
        nbl = nb // S
        nl = nbl * shards.tb
        tgt = np.asarray(shards.meta[0])
        src_all = np.asarray(shards.src_idx)
        srcs = [src_all[(tgt >= s * nbl) & (tgt < (s + 1) * nbl)]
                for s in range(S)]
    per_pair = []
    per_shard = []
    for s in range(S):
        refs = np.unique(srcs[s])
        owners = refs // nl
        remote = refs[owners != s]
        per_shard.append(len(remote))
        for o in range(S):
            if o != s:
                per_pair.append(int(np.sum(owners == o)))
    h = max(per_pair, default=0)
    # compute-side balance: panels per shard (the kernel grid length each
    # shard runs) — with the wire bytes boundary-compressed this spread,
    # not communication, bounds multi-host efficiency
    if n_shards is None:
        panels = None     # stacked shards pad P equal; see the table form
    else:
        nbl = nb // S
        tgt = np.asarray(shards.meta[0])
        panels = [int(np.sum((tgt >= s * nbl) & (tgt < (s + 1) * nbl)))
                  for s in range(S)]
    out = {
        "n_shards": S, "n_local": nl, "h_max": h,
        "pair_rows_mean": float(np.mean(per_pair)) if per_pair else 0.0,
        "remote_rows_per_shard": per_shard,
        "boundary_fraction": float(np.mean(per_shard)) / max(nl, 1),
        "halo_vs_gather": (S - 1) * h / max(shards.n_pad - nl, 1),
    }
    if panels:
        out["panels_per_shard"] = panels
        out["panel_imbalance"] = max(panels) / max(np.mean(panels), 1e-9)
    return out


def shard_panel_table(panel: PanelTable, n_shards: int) -> PanelShards:
    """Split a global PanelTable by contiguous target-block ranges.

    Panels are already sorted by target, so each shard's panels are a
    contiguous slice; first/last flags stay valid because slices cut at
    whole target groups.  Requires nb % n_shards == 0.
    """
    if panel.chunk != 1:
        raise NotImplementedError(
            "shard_panel_table expects an unchunked PanelTable (the "
            "per-shard by-source views are rebuilt without chunk padding)")
    sten = np.asarray(panel.sten)
    meta = np.asarray(panel.meta)
    nb = panel.n_pad // panel.tb
    if nb % n_shards:
        raise ValueError(f"nb={nb} not divisible by n_shards={n_shards}")
    nbl = nb // n_shards

    pieces = []
    for s in range(n_shards):
        lo_b, hi_b = s * nbl, (s + 1) * nbl
        sel = (meta[0] >= lo_b) & (meta[0] < hi_b)
        idx = np.nonzero(sel)[0]
        m = meta[:, idx].copy()
        m[0] -= lo_b
        pieces.append((sten[idx], m))

    P_max = max(p[0].shape[0] for p in pieces)
    stens, metas, metas_s, covs = [], [], [], []
    for sten_s, m in pieces:
        P_s = sten_s.shape[0]
        pad = P_max - P_s
        if pad:
            sten_s = np.concatenate(
                [sten_s, np.zeros((pad,) + sten_s.shape[1:], sten_s.dtype)])
            last_col = m[:, -1:].copy()
            last_col[2:] = 0                     # first_t = last_t = 0
            m = np.concatenate([m, np.repeat(last_col, pad, axis=1)], axis=1)
        # by-source view within the shard (padding panels: flags 0, pid
        # pointing at their own zero-stencil rows, src = last real src so
        # the out-block revisit never flushes an unwritten buffer)
        tgt_l, src_g = m[0, :P_s], m[1, :P_s]
        order = np.lexsort((tgt_l, src_g)).astype(np.int32)
        ssrc = src_g[order]
        first = np.ones(P_s, np.int32)
        first[1:] = (ssrc[1:] != ssrc[:-1]).astype(np.int32)
        last = np.ones(P_s, np.int32)
        last[:-1] = (ssrc[:-1] != ssrc[1:]).astype(np.int32)
        ms = np.stack([order, tgt_l[order], ssrc, first + 2 * last])
        if pad:
            pad_col = np.array(
                [[P_s], [ms[1, -1]], [ms[2, -1]], [0]], np.int32)
            pad_cols = np.repeat(pad_col, pad, axis=1)
            pad_cols[0] = np.arange(P_s, P_max, dtype=np.int32)
            ms = np.concatenate([ms, pad_cols], axis=1)
        cov = np.zeros(nb, np.float32)
        cov[np.unique(src_g)] = 1.0
        stens.append(sten_s)
        metas.append(m)
        metas_s.append(ms)
        covs.append(cov)

    return PanelShards(
        sten=jnp.asarray(np.stack(stens)),
        meta=jnp.asarray(np.stack(metas)),
        meta_s=jnp.asarray(np.stack(metas_s)),
        coverage=jnp.asarray(np.stack(covs)),
        tb=panel.tb, n_pad=panel.n_pad, n_local=nbl * panel.tb,
        band_limit=panel.band_limit, n_rings=panel.n_rings,
        compressed=panel.compressed,
    )
