"""SHREC'11 classification dataset (reference datasets/SHREC11.py)."""

from __future__ import annotations

import os
import zipfile

import numpy as np

from .base import FieldConvDataset
from .meshio import read_obj

CLASS_NAMES = [
    "alien", "ants", "armadillo", "bird1", "bird2", "camel", "cat",
    "centaur", "dinosaur", "dino_ske", "dog1", "dog2", "flamingo",
    "glasses", "gorilla", "hand", "horse", "lamp", "laptop", "man",
    "myScissor", "octopus", "pliers", "rabbit", "santa", "shark",
    "snake", "spiders", "two_balls", "woman",
]


class SHREC11(FieldConvDataset):
    """30-class classification on MeshCNN-remeshed SHREC'11.

    Raw layout (datasets/SHREC11.py:103-141): raw/SHREC11.zip containing
    SHREC11/<class>/{train,test}/*.obj.  split10 picks a random 10 training
    meshes per class (:115).
    """

    n_classes = len(CLASS_NAMES)

    def __init__(self, root, train=True, epsilon=0.2, sample_n=None,
                 split10=True, **kw):
        self.split10 = split10
        super().__init__(root, train=train, epsilon=epsilon,
                         sample_n=sample_n, **kw)

    def _process(self):
        raw = self.raw_dir()
        zpath = os.path.join(raw, "SHREC11.zip")
        root = os.path.join(raw, "SHREC11")
        if not os.path.isdir(root):
            if not os.path.exists(zpath):
                raise RuntimeError(
                    f"SHREC11 data not found: place SHREC11.zip at {zpath}"
                )
            with zipfile.ZipFile(zpath) as z:
                z.extractall(raw)

        split = "train" if self.train else "test"
        keys = []
        for class_idx, cname in enumerate(CLASS_NAMES):
            d = os.path.join(root, cname, split)
            if not os.path.isdir(d):
                continue  # tolerate partial archives
            files = sorted(os.listdir(d))
            if self.train and self.split10:
                sel = self.rng.permutation(len(files))[:10]
                files = [files[i] for i in sorted(sel)]
            for fn in files:
                v, f = read_obj(os.path.join(d, fn))
                keys.append(self._build(
                    v, f, f"{cname}/{fn}", np.int64(class_idx)
                ))
        return keys
