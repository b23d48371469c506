"""Offline stencil builder — the FCPrecomp math, folded into the artifact.

The reference recomputes this inside *every* forward pass
(transforms/fc_precomp.py:30-97) even though its output only depends on the
precomputed log map / transport, not on the augmented positions.  Here it
runs once per mesh on the host (numpy) and emits a padded-CSR
:class:`~fieldconv_tpu.precomp.edge_table.EdgeTable`.

Math reproduced exactly (reference cites in-line):
  * radius normalised by ε, edges with r > 1 dropped   (fc_precomp.py:67-74)
  * sqrt-spaced (equi-area) radial ring samples         (fc_precomp.py:10-27)
  * angular frequencies e^{ikθ}, k = -B..B              (fc_precomp.py:83-84)
  * per-target normalisation of integration weights     (fc_precomp.py:87)
  * wxp = w_norm * xp, supp_sten = rsten ⊗ fsten ⊗ wxp  (fc_precomp.py:92-95)
"""

from __future__ import annotations

import numpy as np

from .edge_table import EdgeTable, round_up


def radial_interpolant(r: np.ndarray, n_rings: int) -> np.ndarray:
    """Linear interpolation weights onto sqrt-spaced ring samples.

    Matches transforms/fc_precomp.py:10-27: for each radius (already
    normalised to [0, 1]) find the first ring sample >= r ("ceil" ring) and
    distribute weight linearly between it and the previous ring.

    r: (E,) float in [0, 1].  Returns (E, R) float32.
    """
    E = r.shape[0]
    samples = np.sqrt(np.arange(n_rings, dtype=np.float64) / (n_rings - 1))

    diff = samples[None, :] - r[:, None]
    diff[diff < 0] = 1e8
    c_index = np.argmin(diff, axis=1)
    c_index[c_index == 0] = 1
    f_index = c_index - 1

    weights = np.zeros((E, n_rings), dtype=np.float64)
    rng = np.arange(E)
    wc = (r - samples[f_index]) / (samples[c_index] - samples[f_index])
    weights[rng, c_index] = wc
    weights[rng, f_index] = 1.0 - wc
    return weights.astype(np.float32)


def build_edge_table(
    supp_edges: np.ndarray,
    log_mag: np.ndarray,
    log_ang: np.ndarray,
    weights: np.ndarray,
    xp: np.ndarray,
    n_vertices: int,
    band_limit: int,
    n_rings: int,
    epsilon: float,
    d_multiple: int = 8,
    n_multiple: int = 8,
    d_slots: int | None = None,
    n_pad: int | None = None,
) -> EdgeTable:
    """Build the padded-CSR device table from ragged COO precompute outputs.

    Args:
      supp_edges: (E, 2) int — (source j, target i) per edge, the orientation
        of transforms/support_graph.py:59.
      log_mag, log_ang: (E,) float — polar log map coordinates log_j(i).
      weights: (N,) or (N, 1) float — per-sample integration weights.
      xp: (E,) complex or (E, 2) float — parallel transport e^{iφ_{j→i}}.
      n_vertices: number of sampled vertices N.
      band_limit, n_rings, epsilon: filter hyperparameters.
      d_multiple / n_multiple: pad the slot and vertex axes to these
        multiples (static-shape bucketing).
      d_slots / n_pad: force exact padded sizes (must cover the data); used
        to share one compiled executable across meshes of a bucket.
    """
    supp_edges = np.asarray(supp_edges, dtype=np.int64)
    log_mag = np.asarray(log_mag, dtype=np.float64)
    log_ang = np.asarray(log_ang, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64).reshape(-1)
    xp = np.asarray(xp)
    if xp.ndim == 2:
        xp = xp[:, 0] + 1j * xp[:, 1]
    xp = xp.astype(np.complex128)

    B, R, K = band_limit, n_rings, 2 * band_limit + 1

    # --- normalise radius, drop out-of-support edges (fc_precomp.py:67-74)
    r = log_mag / epsilon
    valid = r <= 1.0
    r, theta = r[valid], log_ang[valid]
    edges = supp_edges[valid]
    xp = xp[valid]
    src, tgt = edges[:, 0], edges[:, 1]
    E = edges.shape[0]

    # --- per-target normalisation of integration weights (fc_precomp.py:87)
    w_src = weights[src]
    denom = np.zeros(n_vertices, dtype=np.float64)
    np.add.at(denom, tgt, w_src)
    w_norm = w_src / (1e-12 + denom[tgt])

    wxp = w_norm * xp                                      # (E,) complex
    rsten = radial_interpolant(r, R)                       # (E, R)
    freqs = np.arange(-B, B + 1, dtype=np.float64)
    fsten = np.exp(1j * freqs[None, :] * theta[:, None])   # (E, K)
    fwxp = fsten * wxp[:, None]                            # (E, K) complex
    ln = r * np.exp(1j * theta)                            # (E,) complex

    # --- pack into padded CSR by target
    deg = np.zeros(n_vertices, dtype=np.int64)
    np.add.at(deg, tgt, 1)
    max_deg = int(deg.max()) if E else 1
    D = d_slots if d_slots is not None else round_up(max(max_deg, 1), d_multiple)
    N = n_pad if n_pad is not None else round_up(n_vertices, n_multiple)
    if D < max_deg:
        raise ValueError(f"d_slots={D} < max degree {max_deg}")
    if N < n_vertices:
        raise ValueError(f"n_pad={N} < n_vertices {n_vertices}")

    order = np.argsort(tgt, kind="stable")
    slot = np.zeros(E, dtype=np.int64)
    fill = np.zeros(n_vertices, dtype=np.int64)
    for e in order:
        slot[e] = fill[tgt[e]]
        fill[tgt[e]] += 1

    def pack(vals, shape, dtype=np.float32):
        out = np.zeros((N, D) + shape, dtype=dtype)
        out[tgt, slot] = vals
        return out

    def pack_c(vals_c, shape=()):
        planar = np.stack([vals_c.real, vals_c.imag], axis=-1)
        return pack(planar, shape + (2,))

    table = EdgeTable(
        src=pack(src, (), np.int32),
        mask=pack(np.ones(E), ()),
        rsten=pack(rsten, (R,)),
        fwxp=pack_c(fwxp, (K,)),
        ln=pack_c(ln),
        wxp=pack_c(wxp),
        vmask=np.concatenate(
            [np.ones(n_vertices, np.float32), np.zeros(N - n_vertices, np.float32)]
        ),
        n_valid=int(n_vertices),
        band_limit=B,
        n_rings=R,
    )
    return table


def dense_stencil(table: EdgeTable) -> np.ndarray:
    """Materialise the reference-layout supp_sten for tests.

    Returns (N, D, R, K) complex128 == rsten[e,r] * fwxp[e,k]; compare
    against transforms/fc_precomp.py:95's (E, R, 2B+1) tensor after
    packing edges the same way.
    """
    rs = np.asarray(table.rsten, dtype=np.float64)
    fw = np.asarray(table.fwxp, dtype=np.float64)
    fwc = fw[..., 0] + 1j * fw[..., 1]
    return rs[..., :, None] * fwc[..., None, :]
