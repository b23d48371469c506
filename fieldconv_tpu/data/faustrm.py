"""Remeshed FAUST dense-correspondence dataset (reference datasets/FAUSTRM.py).

100 watertight remeshed scans (Donati et al. 2020); labels are
template-relative vertex ids composed through the 1-indexed .vts maps with
geodesic nearest-fill (fcutils composeMap; SURVEY.md §6c.7).  Split: first
80 train / last 20 test (FAUSTRM.py:101-104).  Meshes are area-normalised
by scaling only (no centering — FAUSTRM.py:82-84).
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

from ..geometry.geodesics import compose_map
from ..geometry.mesh import TriMesh
from .base import FieldConvDataset
from .meshio import read_off


class FAUSTRM(FieldConvDataset):
    n_classes = 4999

    def __init__(self, root, train=True, epsilon=0.0425, sample_n=None, **kw):
        super().__init__(root, train=train, epsilon=epsilon,
                         sample_n=sample_n, **kw)

    def _process(self):
        raw = self.raw_dir()
        zpath = os.path.join(raw, "FAUSTRM.zip")
        shapes = os.path.join(raw, "shapes")
        labels_dir = os.path.join(raw, "labels")
        if not os.path.isdir(shapes):
            if not os.path.exists(zpath):
                raise RuntimeError(
                    f"FAUSTRM data not found: place FAUSTRM.zip at {zpath}"
                )
            with zipfile.ZipFile(zpath) as z:
                z.extractall(raw)

        label_z = np.loadtxt(
            os.path.join(labels_dir, "tr_reg_000.vts"), dtype=np.int64
        )
        # reference split: first 80 of the 100 scans train, last 20 test
        # (FAUSTRM.py:101-104); expressed as an 80% index cut so smaller
        # fixture archives exercise the same code path
        names = sorted(n for n in os.listdir(shapes)
                       if n.startswith("tr_reg_") and n.endswith(".off"))
        n_train = round(0.8 * len(names))
        picked = names[:n_train] if self.train else names[n_train:]
        keys = []
        for fn in picked:
            i = int(fn[len("tr_reg_"):-len(".off")])
            v, f = read_off(os.path.join(shapes, fn))
            # area normalisation without centering (FAUSTRM.py:78-84)
            mesh = TriMesh(v, f)
            v = v / np.sqrt(mesh.surface_area())
            labels_i = np.loadtxt(
                os.path.join(labels_dir, f"tr_reg_{i:03d}.vts"), dtype=np.int64
            )
            y = compose_map(label_z, labels_i, TriMesh(v, f)) - 1
            keys.append(self._build(
                v, f, f"faustrm/{i}", y.astype(np.int64), normalize=False
            ))
        return keys
