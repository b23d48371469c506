"""SHREC'19 feature-matching dataset (reference datasets/SHREC19.py).

76 scan pairs; each side FPS-sampled to n_samples points; ground-truth
matches mapped onto samples with geodesic samplesToNearest; pairs stored as
(target sample idx, source sample idx) rows (SHREC19.py:131-174).  Both
meshes of a pair are scaled by the SOURCE's area (a reference quirk,
SHREC19.py:148-158).
"""

from __future__ import annotations

import json
import os
import zipfile

import numpy as np

from ..geometry.geodesics import read_split, samples_to_nearest, split_shrec19
from ..geometry.mesh import TriMesh
from ..geometry.sampling import farthest_point_sampling
from .base import FieldConvDataset, process_mesh
from .meshio import read_obj


def null_pairs(pos_pairs: np.ndarray, n_samples: int) -> np.ndarray:
    """All non-corresponding (target, source) pairs — the complement used by
    the notebook's getNullPairs (feature_matching.ipynb cell 12)."""
    pos_lin = pos_pairs[:, 0] * n_samples + pos_pairs[:, 1]
    all_lin = np.arange(n_samples * n_samples, dtype=np.int64)
    null_lin = np.setdiff1d(all_lin, pos_lin)
    np_s = null_lin % n_samples
    np_t = (null_lin - np_s) // n_samples
    return np.stack([np_t, np_s], axis=1)


def sample_null_pairs(rng, pos_pairs: np.ndarray, n_samples: int,
                      count: int) -> np.ndarray:
    """Uniform draw from the complement (rejection sampling — same
    distribution as shuffling the full complement, without the O(S²) set)."""
    pos_set = set((pos_pairs[:, 0] * n_samples + pos_pairs[:, 1]).tolist())
    out = []
    while len(out) < count:
        cand = rng.integers(0, n_samples, size=(2 * count, 2))
        for t, s in cand:
            if t * n_samples + s not in pos_set:
                out.append((t, s))
                if len(out) == count:
                    break
    return np.asarray(out, dtype=np.int64)


class SHREC19(FieldConvDataset):
    """which ∈ {0: train-source, 1: train-target, 2: test-source,
    3: test-target} matching the reference's four processed files."""

    def __init__(self, root, which=0, n_samples=2048, epsilon=0.1, **kw):
        self.which = which
        self.n_samples = n_samples
        super().__init__(root, train=(which in (0, 1)), epsilon=epsilon,
                         sample_n=n_samples, **kw)

    # index handling: one shared processing pass builds all four splits
    def _index_name(self):
        return f"index_shrec19_{self.which}.json"

    def _index_file(self, which):
        return os.path.join(self.store.dir, f"index_shrec19_{which}.json")

    def _process(self):
        raw = self.raw_dir()
        zpath = os.path.join(raw, "SHREC19.zip")
        if not os.path.isdir(os.path.join(raw, "models")):
            if not os.path.exists(zpath):
                raise RuntimeError(
                    f"SHREC19 data not found: place SHREC19.zip at {zpath}"
                )
            with zipfile.ZipFile(zpath) as z:
                z.extractall(raw)

        split_path = os.path.join(raw, "train_pairs.txt")
        if not os.path.exists(split_path):
            split_shrec19(raw, rng=self.rng)
        pairs = read_split(raw)

        indices = {0: [], 1: [], 2: [], 3: []}
        nS = self.n_samples
        for i in range(len(pairs)):
            sid, tid, is_test = pairs[i]
            vS, fS = read_obj(os.path.join(raw, "models", f"scan_{sid:03d}.obj"))
            vT, fT = read_obj(os.path.join(raw, "models", f"scan_{tid:03d}.obj"))
            gt = np.loadtxt(
                os.path.join(raw, "gt", f"scan_{sid:03d}.scan_{tid:03d}.gt.txt"),
                dtype=np.int64,
            ).reshape(-1)

            sample_S = np.sort(farthest_point_sampling(vS, nS))
            sample_T = np.sort(farthest_point_sampling(vT, nS))

            meshS_full = TriMesh(vS, fS)
            nearest = samples_to_nearest(meshS_full, sample_S)
            matches = nearest[gt[sample_T]]
            pos_pairs = np.stack([np.arange(nS), matches], axis=1)

            # both shapes scaled by the SOURCE area (SHREC19.py:148-158)
            areaS = meshS_full.surface_area()
            vSn = vS / np.sqrt(areaS)
            vTn = vT / np.sqrt(areaS)

            recS = process_mesh(vSn, fS, self.epsilon, None,
                                f"scan_{sid:03d}", np.int64(0),
                                normalize=False, rcm=self.rcm,
                                sample_idx=sample_S)
            recT = process_mesh(vTn, fT, self.epsilon, None,
                                f"scan_{tid:03d}", np.int64(0),
                                normalize=False, rcm=self.rcm,
                                sample_idx=sample_T)

            # pos_pairs index the original sample order; remap through the
            # RCM permutations (target col 0 / source col 1)
            invT = np.empty(nS, np.int64); invT[recT.rcm_perm] = np.arange(nS)
            invS = np.empty(nS, np.int64); invS[recS.rcm_perm] = np.arange(nS)
            pos_pairs = np.stack(
                [invT[pos_pairs[:, 0]], invS[pos_pairs[:, 1]]], axis=1
            )

            pair_tag = f"pair{i:03d}_{sid:03d}_{tid:03d}"
            skey, tkey = pair_tag + "_S", pair_tag + "_T"
            self.store.save(skey, recS)
            self.store.save(tkey, recT)
            np.save(os.path.join(self.store.dir, pair_tag + "_pp.npy"),
                    pos_pairs)

            if is_test:
                indices[2].append((skey, pair_tag))
                indices[3].append((tkey, pair_tag))
            else:
                indices[0].append((skey, pair_tag))
                indices[1].append((tkey, pair_tag))

        for which, idx in indices.items():
            with open(self._index_file(which), "w") as f:
                json.dump(idx, f)
        with open(self._index_file(self.which)) as f:
            return json.load(f)

    def record(self, i: int):
        key, _ = self.keys[i]
        return self.store.load(key)

    def pos_pairs(self, i: int) -> np.ndarray:
        _, pair_tag = self.keys[i]
        return np.load(os.path.join(self.store.dir, pair_tag + "_pp.npy"))
