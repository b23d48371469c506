"""Geodesic label utilities (reference fcutils main.cpp:199-522).

All built on the batched heat-method solver; where the reference loops a
full distance solve per vertex (composeMap/samplesToNearest are O(V) solves,
main.cpp:257-289, 305-345), these batch the solves from the smaller side of
the problem with identical semantics.
"""

from __future__ import annotations

import os
import numpy as np

from .mesh import TriMesh
from .vhm import VectorHeatSolver


def nearest(mesh: TriMesh, selected_points: np.ndarray, labels: np.ndarray):
    """Diffused label values at every vertex (main.cpp:199-228): short-time
    scalar extension of `labels` placed at `selected_points`."""
    solver = VectorHeatSolver(mesh, t_coef=1e-4)
    return solver.extend_scalar(
        np.asarray(selected_points, np.int64), np.asarray(labels, np.float64)
    )


def samples_to_nearest(mesh: TriMesh, samples: np.ndarray,
                       chunk: int = 256) -> np.ndarray:
    """For every mesh vertex, the index of the geodesically nearest sample
    (main.cpp:297-345).  Batched distance fields from the samples."""
    samples = np.asarray(samples, np.int64)
    solver = VectorHeatSolver(mesh, t_coef=1.0)
    best_d = np.full(mesh.n, np.inf)
    best_i = np.zeros(mesh.n, np.int64)
    for lo in range(0, len(samples), chunk):
        hi = min(lo + chunk, len(samples))
        d = solver.distance(samples[lo:hi])            # (n, hi-lo)
        loc = np.argmin(d, axis=1)
        dmin = d[np.arange(mesh.n), loc]
        upd = dmin < best_d
        best_d[upd] = dmin[upd]
        best_i[upd] = lo + loc[upd]
    return best_i


def compose_map(labels_tem2tar: np.ndarray, labels_tem2sour: np.ndarray,
                mesh: TriMesh, chunk: int = 64) -> np.ndarray:
    """Invert/compose ground-truth label maps (main.cpp:235-294).

    labels_tem2sour holds 1-indexed source-vertex ids per template vertex
    (the .vts convention, SURVEY.md §6c.7): source vertex
    labels_tem2sour[l]-1 receives label labels_tem2tar[l]; unassigned source
    vertices take the label of their geodesically nearest assigned vertex.
    """
    t2t = np.asarray(labels_tem2tar)
    t2s = np.asarray(labels_tem2sour, np.int64)
    n = mesh.n
    lab = np.zeros(n, dtype=t2t.dtype)
    filled = np.zeros(n, dtype=bool)
    lab[t2s - 1] = t2t
    filled[t2s - 1] = True

    missing = np.nonzero(~filled)[0]
    if len(missing):
        solver = VectorHeatSolver(mesh, t_coef=1.0)
        filled_idx = np.nonzero(filled)[0]
        for lo in range(0, len(missing), chunk):
            hi = min(lo + chunk, len(missing))
            d = solver.distance(missing[lo:hi])        # (n, hi-lo)
            nearest_filled = filled_idx[np.argmin(d[filled_idx], axis=0)]
            lab[missing[lo:hi]] = lab[nearest_filled]
    return lab


# --- SHREC19 split files (main.cpp:347-522) --------------------------------

_SET_FILES = ["figure_pairs.txt", "glove_pairs.txt", "hand_pairs.txt"]


def split_shrec19(raw_dir: str, rng=None) -> None:
    """Generate random train/test pair splits (main.cpp:347-433): per
    category file, 20% of pairs (ceil) go to test; ids written as the
    3-character strings of the input format."""
    rng = rng or np.random.default_rng()
    test, train = [], []
    for name in _SET_FILES:
        pairs = []
        with open(os.path.join(raw_dir, "pairs", name)) as f:
            for line in f:
                if len(line) >= 7:
                    pairs.append((line[0:3], line[4:7]))
        n_test = int(np.ceil(len(pairs) * 0.2))
        order = rng.permutation(len(pairs))
        for rank, idx in enumerate(order):
            (test if rank < n_test else train).append(pairs[idx])
    with open(os.path.join(raw_dir, "test_pairs.txt"), "w") as f:
        for s, t in test:
            f.write(f"{s},{t}\n")
    with open(os.path.join(raw_dir, "train_pairs.txt"), "w") as f:
        for s, t in train:
            f.write(f"{s},{t}\n")


def read_split(raw_dir: str) -> np.ndarray:
    """Read the generated splits (main.cpp:436-522): returns (P, 3) int —
    columns (source id, target id, is_test)."""
    def parse(path):
        out = []
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if "," not in line:
                    continue
                s, t = line.split(",")[:2]
                out.append((int(s), int(t)))
        return out

    train = parse(os.path.join(raw_dir, "train_pairs.txt"))
    test = parse(os.path.join(raw_dir, "test_pairs.txt"))
    rows = [(s, t, 0) for s, t in train] + [(s, t, 1) for s, t in test]
    return np.asarray(rows, dtype=np.int64)
