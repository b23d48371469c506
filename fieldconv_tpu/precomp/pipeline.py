"""End-to-end offline precompute: raw mesh → device-ready EdgeTable.

Mirrors the reference pre_transform chain (classification.ipynb cell 5):
NormalizeArea → SupportGraph(ε, sample_n) → computeLogXPort, followed by the
FCPrecomp stencil math — but runs everything once offline, with all VHM
solves batched, and emits the padded-CSR EdgeTable artifact.
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Optional

import numpy as np

from ..geometry.mesh import TriMesh
from ..geometry.sampling import farthest_point_sampling, radius_graph
from ..geometry.vhm import VectorHeatSolver
from .edge_table import EdgeTable
from .stencil import build_edge_table


def normalize_area(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Center bbox and scale to unit surface area
    (transforms/normalize_area.py:17-27)."""
    v = np.asarray(vertices, dtype=np.float64)
    v = v - (v.max(axis=0) + v.min(axis=0)) / 2.0
    area = TriMesh(v, faces).surface_area()
    return v / np.sqrt(area)


def normalize_axes(vertices: np.ndarray, normalize_scale: bool = True) -> np.ndarray:
    """Permute axes by ascending std; optionally scale longest axis to [0, 1]
    (transforms/normalize_axes.py:21-30).  torch.std defaults to the sample
    standard deviation (ddof=1) — matched here so tie-breaking of the axis
    sort is identical."""
    v = np.asarray(vertices, dtype=np.float64)
    order = np.argsort(np.std(v, axis=0, ddof=1), kind="stable")
    v = v[:, order]
    if normalize_scale:
        v = v / (2.0 * v[:, 2].max())
    return v


@dataclasses.dataclass
class PrecomputeResult:
    """Raw per-mesh precompute artifact (ragged, host-side)."""

    sample_idx: np.ndarray      # (S,) indices into the full mesh
    supp_edges: np.ndarray      # (E, 2) (source j, target i) in sample indices
    log_mag: np.ndarray         # (E,)
    log_ang: np.ndarray         # (E,)
    xp: np.ndarray              # (E,) complex transport e^{iφ_{j→i}}
    weights: np.ndarray         # (S,) integration weights


TILED_THRESHOLD = 20_000   # mesh size above which mode="auto" goes tiled


def compute_log_xport(
    mesh: TriMesh,
    sample_idx: np.ndarray,
    supp_edges: np.ndarray,
    batch: int = 512,
    mode: str = "auto",
    epsilon: Optional[float] = None,
) -> PrecomputeResult:
    """The computeLogXPort equivalent (transforms/compute_log_xport.py:21-53).

    For each support edge (j, i): parallel transport xp = e^{iφ_{j→i}} and
    log_j(i) in polar form, via batched VHM solves; per-sample integration
    weights via lumped mass snapped to geodesically-nearest samples
    (fcutils main.cpp:134-176, including the label-rounding approximation).

    mode: "global" — whole-mesh multi-RHS solves (exact, O(n·S));
    "tiled" — patch-local solves (precomp/tiled.py; O(n·patch), ~1e-2
    log-map truncation error, required: epsilon); "auto" — tiled above
    TILED_THRESHOLD vertices when epsilon is known.
    """
    sample_idx = np.asarray(sample_idx, dtype=np.int64)
    supp_edges = np.asarray(supp_edges, dtype=np.int64)
    S = len(sample_idx)
    E = len(supp_edges)

    use_tiled = mode == "tiled" or (
        mode == "auto" and epsilon is not None and mesh.n > TILED_THRESHOLD)
    if use_tiled:
        if epsilon is None:
            raise ValueError("mode='tiled' needs epsilon for the patch margin")
        from .tiled import compute_log_xport_tiled

        log_mag, log_ang, xp = compute_log_xport_tiled(
            mesh, sample_idx, supp_edges, epsilon)
    else:
        solver = VectorHeatSolver(mesh, t_coef=1.0)

        log_mag = np.zeros(E)
        log_ang = np.zeros(E)
        xp = np.zeros(E, dtype=np.complex128)

        # group edges by source sample
        order = np.argsort(supp_edges[:, 0], kind="stable")
        src_sorted = supp_edges[order, 0]
        tgt_sorted = supp_edges[order, 1]

        for lo in range(0, S, batch):
            hi = min(lo + batch, S)
            cols = np.arange(lo, hi)
            sources = sample_idx[cols]
            r, theta = solver.log_map(sources)
            H = solver.transport(sources)
            sel = (src_sorted >= lo) & (src_sorted < hi)
            e_ids = order[sel]
            local = src_sorted[sel] - lo
            tgt_v = sample_idx[tgt_sorted[sel]]
            log_mag[e_ids] = r[tgt_v, local]
            log_ang[e_ids] = theta[tgt_v, local]
            xp[e_ids] = H[tgt_v, local]

    # integration weights (fcutils `weights`): short-time diffusion of the
    # sample labels, rounded, lumped mass accumulated on the winning sample
    wsolver = VectorHeatSolver(mesh, t_coef=1e-4)
    ext = wsolver.extend_scalar(sample_idx, np.arange(S, dtype=np.float64))
    snapped = np.rint(ext).astype(np.int64)
    snapped = np.clip(snapped, 0, S - 1)
    mass = mesh.lumped_mass()
    weights = np.zeros(S)
    np.add.at(weights, snapped, mass)

    return PrecomputeResult(
        sample_idx=sample_idx,
        supp_edges=supp_edges,
        log_mag=log_mag,
        log_ang=log_ang,
        xp=xp,
        weights=weights,
    )


def precompute_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    epsilon: float,
    sample_n: Optional[int] = None,
    band_limit: int = 1,
    n_rings: int = 6,
    max_neighbors: int = 512,
    normalize: bool = True,
    d_multiple: int = 8,
    n_multiple: int = 8,
    d_slots: Optional[int] = None,
    n_pad: Optional[int] = None,
) -> tuple[EdgeTable, PrecomputeResult, np.ndarray]:
    """Full offline pipeline for one mesh.

    Returns (edge_table, raw precompute, normalised vertex positions).
    """
    v = normalize_area(vertices, faces) if normalize else np.asarray(vertices, float)
    mesh = TriMesh(v, faces)

    if sample_n is not None and sample_n < mesh.n:
        sample_idx = farthest_point_sampling(v, sample_n)
    else:
        sample_idx = np.arange(mesh.n)
    supp_edges = radius_graph(v[sample_idx], epsilon, max_neighbors=max_neighbors)

    pre = compute_log_xport(mesh, sample_idx, supp_edges, epsilon=epsilon)
    table = build_edge_table(
        pre.supp_edges, pre.log_mag, pre.log_ang, pre.weights, pre.xp,
        n_vertices=len(sample_idx), band_limit=band_limit, n_rings=n_rings,
        epsilon=epsilon, d_multiple=d_multiple, n_multiple=n_multiple,
        d_slots=d_slots, n_pad=n_pad,
    )
    return table, pre, v


def mesh_cache_key(vertices, faces, epsilon, sample_n, band_limit, n_rings,
                   extra: str = "") -> str:
    """Content hash for the artifact cache (SURVEY.md §5.4)."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(vertices, dtype=np.float64).tobytes())
    h.update(np.ascontiguousarray(faces, dtype=np.int64).tobytes())
    h.update(f"{epsilon}:{sample_n}:{band_limit}:{n_rings}:{extra}:v2".encode())
    return h.hexdigest()[:24]
