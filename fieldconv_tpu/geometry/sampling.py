"""Point sampling and support-graph construction (host-side).

Replaces the reference's PyG `fps` + `radius` usage
(transforms/support_graph.py:46,56): farthest-point subsampling and a
Euclidean ε-ball graph over the sampled points with a per-source neighbor
cap of 512.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def farthest_point_sampling(points: np.ndarray, n_samples: int, start: int = 0):
    """Greedy FPS; returns sorted indices (the reference sorts too,
    support_graph.py:46)."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if n_samples >= n:
        return np.arange(n)
    chosen = np.empty(n_samples, dtype=np.int64)
    chosen[0] = start
    d2 = np.sum((pts - pts[start]) ** 2, axis=1)
    for s in range(1, n_samples):
        idx = int(np.argmax(d2))
        chosen[s] = idx
        d2 = np.minimum(d2, np.sum((pts - pts[idx]) ** 2, axis=1))
    return np.sort(chosen)


def radius_graph(points: np.ndarray, epsilon: float, max_neighbors: int = 512):
    """ε-ball support edges (source j, target i), j the ball center.

    Matches transforms/support_graph.py:56: each source j collects up to
    `max_neighbors` targets within ε (self-edge included).  Returns (E, 2)
    int64 sorted by source.
    """
    pts = np.asarray(points, dtype=np.float64)
    tree = cKDTree(pts)
    edges = []
    for j, nbrs in enumerate(tree.query_ball_point(pts, epsilon)):
        nbrs = np.asarray(nbrs, dtype=np.int64)
        if len(nbrs) > max_neighbors:
            d = np.linalg.norm(pts[nbrs] - pts[j], axis=1)
            nbrs = nbrs[np.argsort(d)[:max_neighbors]]
        for i in np.sort(nbrs):
            edges.append((j, i))
    return np.asarray(edges, dtype=np.int64)
