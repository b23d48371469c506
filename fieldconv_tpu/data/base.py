"""Dataset infrastructure: per-mesh precompute artifacts + bucketed loading.

The reference caches collated torch tensors per dataset
(datasets/SHREC11.py:138-139).  Here each mesh's ragged precompute (support
edges, log map, transport, weights — everything *independent of* the filter
hyperparameters B/R) is cached as one .npz keyed on
(mesh content, ε, sample_n), per SURVEY.md §5.4; padded EdgeTables for a
given (B, R, bucket) are built at load time (cheap numpy).  Vertices are
RCM-reordered at build time so the banded Pallas path applies directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from ..geometry.mesh import TriMesh
from ..precomp.banded import rcm_order, reorder_precompute
from ..precomp.edge_table import EdgeTable, round_up
from ..precomp.pipeline import compute_log_xport, mesh_cache_key
from ..precomp.stencil import build_edge_table


@dataclasses.dataclass
class MeshRecord:
    """Ragged per-mesh artifact (host-side, filter-hyperparameter free)."""

    name: str
    pos: np.ndarray          # (S, 3) sampled positions (normalised, reordered)
    supp_edges: np.ndarray   # (E, 2) (src, tgt) in sampled indices
    log_mag: np.ndarray      # (E,)
    log_ang: np.ndarray      # (E,)
    xp: np.ndarray           # (E, 2) planar transport
    weights: np.ndarray      # (S,)
    labels: np.ndarray       # () mesh label or (S,) per-vertex labels
    epsilon: float
    rcm_perm: np.ndarray = None   # (S,) original sample index at each position
    # mean of the FULL normalised mesh (not just the samples): T.Center()
    # in the reference runs on data.pos before the sample_idx slice
    # (correspondence.ipynb cell 5), so the per-draw centering offset is the
    # full-vertex mean.  None (legacy records) falls back to the sample mean.
    center_mean: np.ndarray = None  # (3,)
    # (S,) FULL-mesh vertex id of each sample (pre-reorder sample order);
    # the input-file vertex behind output row i is
    # sample_idx[rcm_perm[i]] — see vertex_ids().  None on legacy records.
    sample_idx: np.ndarray = None

    def vertex_ids(self) -> np.ndarray:
        """(S,) original-mesh vertex id for each record row (model output
        row i corresponds to input-file vertex vertex_ids()[i]); identity
        when the mesh was not subsampled and legacy records lack
        sample_idx."""
        perm = (self.rcm_perm if self.rcm_perm is not None
                else np.arange(self.n_samples))
        if self.sample_idx is None:
            return np.asarray(perm, np.int64)
        return np.asarray(self.sample_idx, np.int64)[perm]

    @property
    def n_samples(self) -> int:
        return len(self.pos)

    def max_degree(self) -> int:
        if len(self.supp_edges) == 0:
            return 1
        return int(np.bincount(self.supp_edges[:, 1]).max())

    def table(self, band_limit: int, n_rings: int,
              n_pad: Optional[int] = None, d_slots: Optional[int] = None,
              n_multiple: int = 128, d_multiple: int = 8) -> EdgeTable:
        return build_edge_table(
            self.supp_edges, self.log_mag, self.log_ang, self.weights,
            self.xp, self.n_samples, band_limit, n_rings, self.epsilon,
            n_pad=n_pad, d_slots=d_slots,
            n_multiple=n_multiple, d_multiple=d_multiple,
        )

    def padded_pos(self, n_pad: int, center: bool = False) -> np.ndarray:
        """Zero-padded sampled positions; center=True subtracts the
        full-mesh mean first (the T.Center() pre-rotation step of the
        correspondence/matching transform chains).  Padded rows stay zero."""
        out = np.zeros((n_pad, 3), np.float32)
        pos = self.pos
        if center:
            mean = (self.center_mean if self.center_mean is not None
                    else pos.mean(axis=0))
            pos = pos - np.asarray(mean, pos.dtype)
        out[: self.n_samples] = pos
        return out

    def padded_labels(self, n_pad: int) -> np.ndarray:
        lab = np.asarray(self.labels)
        if lab.ndim == 0:
            return lab.astype(np.int32)
        out = np.full(n_pad, -1, np.int32)
        out[: self.n_samples] = lab
        return out


def process_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    epsilon: float,
    sample_n: Optional[int],
    name: str,
    labels: np.ndarray,
    normalize: bool = True,
    max_neighbors: int = 512,
    rcm: bool = True,
    sample_idx: Optional[np.ndarray] = None,
    post_axes: bool = False,
    order: str = "auto",
    kd_tb: int = 128,
    kd_threshold: int = 20000,
) -> MeshRecord:
    """Full offline precompute for one labelled mesh.

    `labels` is either a scalar (mesh class) or per-FULL-vertex array —
    subsampled by sample_idx like the reference (datasets/SHAPESEG.py:128).

    post_axes=True applies NormalizeAxes to the stored positions AFTER the
    log-map solves, exactly like the SHAPESEG pre_transform chain
    (segmentation.ipynb cell 6: NormalizeArea → SupportGraph →
    computeLogXPort → NormalizeAxes) — the permuted/rescaled pos feed the
    lift, the stencils keep the pre-permutation geometry.

    order: vertex ordering of the stored record — "rcm" (bandwidth-
    minimising, the dense-band layout's requirement), "kd" (k-d tree
    leaves of kd_tb points: block-LOCAL order, what the panel-CSR layout
    wants — panels/block mean 13 vs RCM 25 at 163k vertices), or "auto"
    (kd above kd_threshold samples, where only the panel layout fits;
    rcm below).  rcm=False skips reordering entirely (legacy flag).
    """
    from ..precomp.pipeline import normalize_area, normalize_axes
    from ..geometry.sampling import farthest_point_sampling, radius_graph

    v = normalize_area(vertices, faces) if normalize else np.asarray(vertices, float)
    mesh = TriMesh(v, faces)
    if sample_idx is None:
        if sample_n is not None and sample_n < mesh.n:
            sample_idx = farthest_point_sampling(v, sample_n)
        else:
            sample_idx = np.arange(mesh.n)
    sample_idx = np.asarray(sample_idx, np.int64)
    supp_edges = radius_graph(v[sample_idx], epsilon, max_neighbors=max_neighbors)
    pre = compute_log_xport(mesh, sample_idx, supp_edges, epsilon=epsilon)

    if post_axes:
        # NormalizeAxes over the FULL mesh (the reference transform sees
        # data.pos before the sample_idx slice)
        v = normalize_axes(v)
    center_mean = v.mean(axis=0)
    pos = v[sample_idx]
    lab = np.asarray(labels)
    if lab.ndim > 0 and len(lab) == mesh.n:
        lab = lab[sample_idx]

    w = pre.weights
    perm = np.arange(len(sample_idx))
    if rcm and len(supp_edges):
        if order == "auto":
            order = "kd" if len(sample_idx) > kd_threshold else "rcm"
        if order == "kd":
            from ..precomp.banded import kd_order

            perm = kd_order(pos, tb=kd_tb)
        else:
            perm = rcm_order(supp_edges, len(sample_idx))
        if lab.ndim > 0:
            supp_edges, pos, w, lab = reorder_precompute(
                perm, supp_edges, pos, w, lab
            )
        else:
            supp_edges, pos, w = reorder_precompute(perm, supp_edges, pos, w)
        # edge attribute arrays are indexed per-edge: unchanged

    return MeshRecord(
        name=name,
        pos=pos.astype(np.float32),
        supp_edges=supp_edges.astype(np.int64),
        log_mag=pre.log_mag.astype(np.float32),
        log_ang=pre.log_ang.astype(np.float32),
        xp=np.stack([pre.xp.real, pre.xp.imag], -1).astype(np.float32),
        weights=w.astype(np.float32),
        labels=lab,
        epsilon=float(epsilon),
        rcm_perm=np.asarray(perm, np.int64),
        center_mean=center_mean.astype(np.float32),
        sample_idx=sample_idx,
    )


class ArtifactStore:
    """npz-per-mesh cache under <root>/processed."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "processed")
        os.makedirs(self.dir, exist_ok=True)

    def path(self, key: str) -> str:
        return os.path.join(self.dir, key + ".npz")

    def has(self, key: str) -> bool:
        return os.path.exists(self.path(key))

    def save(self, key: str, rec: MeshRecord) -> None:
        np.savez_compressed(
            self.path(key),
            name=rec.name, pos=rec.pos, supp_edges=rec.supp_edges,
            log_mag=rec.log_mag, log_ang=rec.log_ang, xp=rec.xp,
            weights=rec.weights, labels=rec.labels, epsilon=rec.epsilon,
            rcm_perm=rec.rcm_perm if rec.rcm_perm is not None
            else np.arange(rec.n_samples),
            center_mean=rec.center_mean if rec.center_mean is not None
            else rec.pos.mean(axis=0),
            sample_idx=rec.sample_idx if rec.sample_idx is not None
            else np.arange(rec.n_samples),
        )

    def load(self, key: str) -> MeshRecord:
        z = np.load(self.path(key), allow_pickle=False)
        return MeshRecord(
            name=str(z["name"]), pos=z["pos"], supp_edges=z["supp_edges"],
            log_mag=z["log_mag"], log_ang=z["log_ang"], xp=z["xp"],
            weights=z["weights"], labels=z["labels"],
            epsilon=float(z["epsilon"]),
            rcm_perm=z["rcm_perm"] if "rcm_perm" in z else None,
            center_mean=z["center_mean"] if "center_mean" in z else None,
            sample_idx=z["sample_idx"] if "sample_idx" in z else None,
        )


def shared_bucket(records: List[MeshRecord], n_multiple=128, d_multiple=8):
    """(n_pad, d_slots) covering every record — one compile bucket."""
    n_pad = round_up(max(r.n_samples for r in records), n_multiple)
    d_slots = round_up(max(r.max_degree() for r in records), d_multiple)
    return n_pad, d_slots


class FieldConvDataset:
    """Base for the four reference datasets.

    Subclasses implement `_process()` returning a list of (key, MeshRecord)
    and may split train/test; records are cached through ArtifactStore.
    """

    def __init__(self, root: str, train: bool = True, epsilon: float = 0.2,
                 sample_n: Optional[int] = None, rcm: bool = True,
                 seed: int = 0):
        self.root = root
        self.train = train
        self.epsilon = epsilon
        self.sample_n = sample_n
        self.rcm = rcm
        self.rng = np.random.default_rng(seed)
        self.store = ArtifactStore(root)
        self.keys: List[str] = []
        self._index_path = os.path.join(self.store.dir, self._index_name())
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self.keys = json.load(f)
        else:
            self.keys = self._process()
            with open(self._index_path, "w") as f:
                json.dump(self.keys, f)

    # subclass API ---------------------------------------------------------
    def _index_name(self) -> str:
        return f"index_{'train' if self.train else 'test'}.json"

    def _process(self) -> List[str]:
        raise NotImplementedError

    def raw_dir(self) -> str:
        d = os.path.join(self.root, "raw")
        os.makedirs(d, exist_ok=True)
        return d

    def _mesh_key(self, v, f) -> str:
        # the trailing schema tag versions the ARTIFACT layout (v2 added
        # sample_idx); bumping it invalidates caches so rebuilt records
        # carry every field the current code reads
        return mesh_cache_key(v, f, self.epsilon, self.sample_n, 0, 0,
                              extra=f"axes{int(self.post_axes)}:v2")

    # subclasses with a NormalizeAxes tail in their pre_transform chain
    # (SHAPESEG, segmentation.ipynb cell 6) set this True
    post_axes = False

    def _build(self, v, f, name, labels, normalize=True, sample_idx=None) -> str:
        key = self._mesh_key(v, f)
        if not self.store.has(key):
            rec = process_mesh(
                v, f, self.epsilon, self.sample_n, name, labels,
                normalize=normalize, rcm=self.rcm, sample_idx=sample_idx,
                post_axes=self.post_axes,
            )
            self.store.save(key, rec)
        return key

    # loading --------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.keys)

    def record(self, i: int) -> MeshRecord:
        return self.store.load(self.keys[i])

    def records(self) -> List[MeshRecord]:
        return [self.record(i) for i in range(len(self))]
