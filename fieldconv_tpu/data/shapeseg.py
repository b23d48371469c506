"""Human-body segmentation dataset (reference datasets/SHAPESEG.py).

Train = Adobe + FAUST + MIT + SCAPE; test = SHREC (Maron et al. 2017
composite).  MIT ships edge labels converted to vertex labels
(SHAPESEG.py:12-34); all labels are subsampled by the FPS sample indices.
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

from .base import FieldConvDataset
from .meshio import read_obj, read_ply


def edge_to_vertex_labels(faces: np.ndarray, edge_labels: np.ndarray,
                          n_nodes: int) -> np.ndarray:
    """MeshCNN .eseg edge labels → vertex labels (SHAPESEG.py:12-34):
    edges are enumerated in face order / first-seen order; each edge writes
    its label to both endpoints (later edges overwrite); labels shift to
    0-based."""
    seen = {}
    order = []
    for face in faces:
        a, b, c = int(face[0]), int(face[1]), int(face[2])
        for e in ((a, b), (b, c), (a, c)):
            key = (min(e), max(e))
            if key not in seen:
                seen[key] = len(order)
                order.append(key)
    res = np.zeros(n_nodes, dtype=np.int64)
    for idx, (i, j) in enumerate(order):
        res[i] = edge_labels[idx]
        res[j] = edge_labels[idx]
    return res - 1


def _load_pt_labels(path: str) -> np.ndarray:
    """Label files in the raw zips are torch .pt tensors."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t).astype(np.int64)


class SHAPESEG(FieldConvDataset):
    n_classes = 8
    # the SHAPESEG pre_transform ends with NormalizeAxes()
    # (segmentation.ipynb cell 6): applied to stored pos only, after the
    # log-map solves
    post_axes = True

    def __init__(self, root, train=True, epsilon=0.2, sample_n=1024, **kw):
        super().__init__(root, train=train, epsilon=epsilon,
                         sample_n=sample_n, **kw)

    def _extract(self, raw, inner_zip, marker):
        base = os.path.dirname(inner_zip)
        if not os.path.isdir(os.path.join(base, marker)):
            with zipfile.ZipFile(inner_zip) as z:
                z.extractall(base)

    @staticmethod
    def _mesh_files(mdir, ext):
        """Mesh files in the reference's enumeration order.  The reference
        hard-codes the counts (41 Adobe / 100 FAUST / 71 SCAPE / 18 SHREC,
        SHAPESEG.py:113-214) and reads f"{i}{ext}" in index order; listing
        the directory numerically is identical on the real archives and also
        admits smaller fixture archives."""
        names = [n for n in os.listdir(mdir) if n.endswith(ext)]

        def key(n):
            stem = n[: -len(ext)]
            digits = "".join(c for c in stem if c.isdigit())
            return (int(digits) if digits else 0, stem)

        return sorted(names, key=key)

    def _process(self):
        raw = self.raw_dir()
        zpath = os.path.join(raw, "SHAPESEG.zip")
        root = os.path.join(raw, "SHAPESEG")
        if not os.path.isdir(root):
            if not os.path.exists(zpath):
                raise RuntimeError(
                    f"SHAPESEG data not found: place SHAPESEG.zip at {zpath}"
                )
            with zipfile.ZipFile(zpath) as z:
                z.extractall(raw)

        keys = []
        if self.train:
            # Adobe: 41 meshes, per-mesh .pt labels (SHAPESEG.py:113-130)
            adobe = os.path.join(root, "Adobe", "raw")
            self._extract(raw, os.path.join(adobe, "adobe.zip"), "meshes")
            for fn in self._mesh_files(os.path.join(adobe, "meshes"), ".ply"):
                v, f = read_ply(os.path.join(adobe, "meshes", fn))
                y = _load_pt_labels(
                    os.path.join(adobe, "segs", fn[:-4] + ".pt"))
                keys.append(self._build(v, f, f"adobe/{fn[:-4]}", y))
            # FAUST: 100 registrations sharing one label file (:133-150)
            faust = os.path.join(root, "FAUST", "raw")
            self._extract(raw, os.path.join(faust, "faust.zip"), "meshes")
            y = _load_pt_labels(os.path.join(faust, "segs", "faust_seg.pt"))
            for fn in self._mesh_files(os.path.join(faust, "meshes"), ".ply"):
                v, f = read_ply(os.path.join(faust, "meshes", fn))
                keys.append(self._build(v, f, f"faust/{fn[:-4]}", y))
            # MIT: edge labels per mesh (:152-170)
            mit = os.path.join(root, "MIT", "raw")
            self._extract(raw, os.path.join(mit, "mit.zip"), "meshes")
            mdir = os.path.join(mit, "meshes")
            for fn in sorted(os.listdir(mdir)):
                v, f = read_obj(os.path.join(mdir, fn))
                segs = np.loadtxt(
                    os.path.join(mit, "segs", fn.replace(".obj", ".eseg"))
                ).astype(np.int64)
                y = edge_to_vertex_labels(f, segs, len(v))
                keys.append(self._build(v, f, f"mit/{fn}", y))
            # SCAPE: 71 meshes, shared labels (:173-189)
            scape = os.path.join(root, "SCAPE", "raw")
            self._extract(raw, os.path.join(scape, "scape.zip"), "meshes")
            y = _load_pt_labels(os.path.join(scape, "segs", "scape_seg.pt"))
            for fn in self._mesh_files(os.path.join(scape, "meshes"), ".ply"):
                v, f = read_ply(os.path.join(scape, "meshes", fn))
                keys.append(self._build(v, f, f"scape/{fn[:-4]}", y))
        else:
            # SHREC test set: 18 meshes with per-mesh labels (:196-214)
            shrec = os.path.join(root, "SHREC", "raw")
            self._extract(raw, os.path.join(shrec, "shrec.zip"), "meshes")
            for fn in self._mesh_files(os.path.join(shrec, "meshes"), ".ply"):
                v, f = read_ply(os.path.join(shrec, "meshes", fn))
                y = _load_pt_labels(
                    os.path.join(shrec, "segs", fn[:-4] + ".pt"))
                keys.append(self._build(v, f, f"shrec/{fn[:-4]}", y))
        return keys
