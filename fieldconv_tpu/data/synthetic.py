"""Synthetic test meshes: planar grids, icospheres, and subdivided variants.

Used by the test suite (no reference datasets required) and by bench.py
(synthetic benchmark meshes at arbitrary scale — SURVEY.md §5.7's 100k+-vertex
subdivided configs).
"""

from __future__ import annotations

import numpy as np


def grid_mesh(nx: int = 12, ny: int = 12, scale: float = 1.0, jitter: float = 0.0,
              seed: int = 0):
    """Triangulated planar grid in the z=0 plane. Returns (v, f)."""
    xs = np.linspace(0, scale, nx)
    ys = np.linspace(0, scale, ny)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    v = np.stack([gx.ravel(), gy.ravel(), np.zeros(nx * ny)], axis=1)
    if jitter:
        rng = np.random.default_rng(seed)
        interior = (
            (v[:, 0] > 0) & (v[:, 0] < scale) & (v[:, 1] > 0) & (v[:, 1] < scale)
        )
        v[interior, :2] += rng.uniform(-jitter, jitter, (interior.sum(), 2))
    f = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = (i + 1) * ny + j + 1
            d = i * ny + j + 1
            f.append((a, b, c))
            f.append((a, c, d))
    return v, np.asarray(f, dtype=np.int64)


def icosphere(subdiv: int = 2, radius: float = 1.0):
    """Unit icosphere via Loop-style midpoint subdivision. Returns (v, f)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    for _ in range(subdiv):
        v, f = _midpoint_subdivide(v, f)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * radius, f


def _midpoint_subdivide(v, f):
    verts = list(v)
    mid = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key not in mid:
            mid[key] = len(verts)
            verts.append((v[a] + v[b]) / 2.0)
        return mid[key]

    nf = []
    for a, b, c in f:
        ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
        nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
    return np.asarray(verts), np.asarray(nf, dtype=np.int64)


def subdivided_mesh(v, f, levels: int = 1):
    """Midpoint-subdivide an arbitrary mesh (no reprojection)."""
    for _ in range(levels):
        v, f = _midpoint_subdivide(v, f)
    return v, f
