"""Dataset layer tests against synthetic raw archives (no real data needed)."""

import os
import zipfile

import numpy as np
import pytest

from fieldconv_tpu.data import SHREC11, shared_bucket
from fieldconv_tpu.data.meshio import read_obj, read_off, read_ply
from fieldconv_tpu.data.shapeseg import edge_to_vertex_labels
from fieldconv_tpu.data.shrec19 import null_pairs, sample_null_pairs
from fieldconv_tpu.data.synthetic import icosphere
from fieldconv_tpu.geometry.geodesics import (
    compose_map,
    read_split,
    split_shrec19,
)
from fieldconv_tpu.geometry.mesh import TriMesh


def write_obj(path, v, f):
    with open(path, "w") as fh:
        for p in v:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for t in f:
            fh.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


def test_meshio_roundtrip(tmp_path):
    v, f = icosphere(subdiv=1)
    # OBJ
    p = tmp_path / "m.obj"
    write_obj(p, v, f)
    v2, f2 = read_obj(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)
    # OFF
    p = tmp_path / "m.off"
    with open(p, "w") as fh:
        fh.write(f"OFF\n{len(v)} {len(f)} 0\n")
        for q in v:
            fh.write(f"{q[0]} {q[1]} {q[2]}\n")
        for t in f:
            fh.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    v2, f2 = read_off(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)
    # PLY ascii
    p = tmp_path / "m.ply"
    with open(p, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(v)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for q in v:
            fh.write(f"{q[0]} {q[1]} {q[2]}\n")
        for t in f:
            fh.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    v2, f2 = read_ply(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def _fake_shrec11_zip(root, classes=("alien", "ants"), n_train=2, n_test=1):
    rawdir = os.path.join(root, "raw")
    os.makedirs(rawdir, exist_ok=True)
    zpath = os.path.join(rawdir, "SHREC11.zip")
    rng = np.random.default_rng(0)
    with zipfile.ZipFile(zpath, "w") as z:
        for ci, cname in enumerate(classes):
            for split, count in (("train", n_train), ("test", n_test)):
                for k in range(count):
                    v, f = icosphere(subdiv=1)
                    v = v * (1.0 + 0.4 * ci) + rng.normal(scale=0.01, size=v.shape)
                    lines = [f"v {p[0]} {p[1]} {p[2]}" for p in v]
                    lines += [f"f {t[0]+1} {t[1]+1} {t[2]+1}" for t in f]
                    z.writestr(f"SHREC11/{cname}/{split}/T{k}.obj",
                               "\n".join(lines))
    return zpath


def test_shrec11_dataset(tmp_path):
    root = str(tmp_path / "shrec11")
    os.makedirs(root)
    _fake_shrec11_zip(root)

    train = SHREC11(root, train=True, epsilon=0.4, split10=False)
    test = SHREC11(root, train=False, epsilon=0.4, split10=False)
    assert len(train) == 4 and len(test) == 2

    recs = train.records()
    n_pad, d_slots = shared_bucket(recs, n_multiple=8, d_multiple=8)
    labels = sorted(int(r.labels) for r in recs)
    assert labels == [0, 0, 1, 1]
    t = recs[0].table(band_limit=2, n_rings=4, n_pad=n_pad, d_slots=d_slots)
    assert t.src.shape == (n_pad, d_slots)

    # cache hit: a second instantiation loads the index without reprocessing
    train2 = SHREC11(root, train=True, epsilon=0.4, split10=False)
    assert train2.keys == train.keys


def test_edge_to_vertex_labels():
    f = np.array([[0, 1, 2], [1, 3, 2]])
    # edge enumeration order: (0,1),(1,2),(0,2) then (1,3),(2,3) [(1,2) seen]
    labels = np.array([1, 2, 3, 4, 5])
    out = edge_to_vertex_labels(f, labels, 4)
    # vertex 0: edges (0,1)->1, (0,2)->3  => last write 3 -> 2 after -1
    assert out.tolist() == [2, 3, 4, 4]


def test_compose_map_fills_all():
    v, f = icosphere(subdiv=2)
    mesh = TriMesh(v, f)
    n = mesh.n
    rng = np.random.default_rng(0)
    # template maps to a subset of source vertices (1-indexed)
    subset = np.sort(rng.choice(n, size=n - 20, replace=False))
    t2s = subset + 1
    t2t = rng.integers(0, 500, size=len(subset))
    out = compose_map(t2t, t2s, mesh)
    assert out.shape == (n,)
    np.testing.assert_array_equal(out[subset], t2t)
    # unfilled vertices took some neighbor's label
    assert np.isin(out, t2t).all()


def test_shrec19_split_roundtrip(tmp_path):
    raw = tmp_path / "raw"
    (raw / "pairs").mkdir(parents=True)
    for name, pairs in [
        ("figure_pairs.txt", [("001", "002"), ("003", "004"), ("005", "006")]),
        ("glove_pairs.txt", [("007", "008")]),
        ("hand_pairs.txt", [("009", "010"), ("011", "012")]),
    ]:
        with open(raw / "pairs" / name, "w") as f:
            for s, t in pairs:
                f.write(f"{s},{t}\n")
    split_shrec19(str(raw), rng=np.random.default_rng(0))
    out = read_split(str(raw))
    assert out.shape == (6, 3)
    assert set(out[:, 2].tolist()) == {0, 1}
    assert out[:, 2].sum() == 3  # ceil(3*.2)+ceil(1*.2)+ceil(2*.2) = 1+1+1


def test_null_pairs():
    pp = np.array([[0, 1], [2, 3]])
    np_ = null_pairs(pp, 4)
    assert len(np_) == 16 - 2
    lin = set((np_[:, 0] * 4 + np_[:, 1]).tolist())
    assert 0 * 4 + 1 not in lin and 2 * 4 + 3 not in lin
    samp = sample_null_pairs(np.random.default_rng(0), pp, 4, 5)
    assert samp.shape == (5, 2)
    for t, s in samp:
        assert (t, s) not in {(0, 1), (2, 3)}


@pytest.mark.slow
def test_fit_matching_synthetic():
    """Siamese matching loop runs end-to-end on synthetic sphere pairs."""
    import dataclasses

    from fieldconv_tpu.data.base import process_mesh
    from fieldconv_tpu.train.config import MATCHING
    from fieldconv_tpu.train.loop import fit_matching

    rng = np.random.default_rng(0)
    src_recs, tgt_recs, pps = [], [], []
    for k in range(2):
        v, f = icosphere(subdiv=1)
        v1 = v + rng.normal(scale=0.01, size=v.shape)
        v2 = v + rng.normal(scale=0.01, size=v.shape)
        src_recs.append(process_mesh(v1, f, 0.4, None, f"s{k}", np.int64(0)))
        tgt_recs.append(process_mesh(v2, f, 0.4, None, f"t{k}", np.int64(0)))
        n = src_recs[-1].n_samples
        # ground-truth: same (original) vertex; remap through both RCM perms
        inv_s = np.empty(n, np.int64); inv_s[src_recs[-1].rcm_perm] = np.arange(n)
        inv_t = np.empty(n, np.int64); inv_t[tgt_recs[-1].rcm_perm] = np.arange(n)
        pps.append(np.stack([inv_t, inv_s], axis=1))

    config = dataclasses.replace(
        MATCHING, epochs=2, n_pairs=16, nf=4, n_rings=4, band_limit=1
    )
    net, state, rates = fit_matching(
        config, src_recs, tgt_recs, pps,
        test_source_records=src_recs[:1], test_target_records=tgt_recs[:1],
        test_pos_pairs_list=pps[:1], eval_every=1,
    )
    assert rates is not None and all(0.0 <= r <= 1.0 for r in rates)
    leaves = [np.asarray(l) for l in
              __import__("jax").tree_util.tree_leaves(state.params)]
    assert all(np.all(np.isfinite(l)) for l in leaves)


def _ply_bytes(v, f):
    lines = ["ply", "format ascii 1.0", f"element vertex {len(v)}",
             "property float x", "property float y", "property float z",
             f"element face {len(f)}",
             "property list uchar int vertex_indices", "end_header"]
    lines += [f"{p[0]} {p[1]} {p[2]}" for p in v]
    lines += [f"3 {t[0]} {t[1]} {t[2]}" for t in f]
    return "\n".join(lines).encode()


def _obj_bytes(v, f):
    lines = [f"v {p[0]} {p[1]} {p[2]}" for p in v]
    lines += [f"f {t[0]+1} {t[1]+1} {t[2]+1}" for t in f]
    return "\n".join(lines).encode()


def _off_bytes(v, f):
    lines = ["OFF", f"{len(v)} {len(f)} 0"]
    lines += [f"{p[0]} {p[1]} {p[2]}" for p in v]
    lines += [f"3 {t[0]} {t[1]} {t[2]}" for t in f]
    return "\n".join(lines).encode()


def _pt_bytes(arr):
    import io

    import torch

    buf = io.BytesIO()
    torch.save(torch.as_tensor(arr), buf)
    return buf.getvalue()


def _inner_zip_bytes(entries):
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)
    return buf.getvalue()


def _fake_shapeseg_zip(root):
    """SHAPESEG.zip in the genuine nested layout (SHAPESEG.py:106-214):
    per-corpus raw/<corpus>.zip holding meshes/, with segs/ beside it."""
    rawdir = os.path.join(root, "raw")
    os.makedirs(rawdir, exist_ok=True)
    rng = np.random.default_rng(3)
    v0, f0 = icosphere(subdiv=1)
    nv = len(v0)

    def mesh(i):
        return v0 * (1 + 0.1 * i) + rng.normal(scale=0.01, size=v0.shape), f0

    with zipfile.ZipFile(os.path.join(rawdir, "SHAPESEG.zip"), "w") as z:
        # Adobe: per-mesh .pt labels
        v1, _ = mesh(0)
        v2, _ = mesh(1)
        z.writestr("SHAPESEG/Adobe/raw/adobe.zip", _inner_zip_bytes({
            "meshes/0.ply": _ply_bytes(v1, f0),
            "meshes/1.ply": _ply_bytes(v2, f0)}))
        for i in range(2):
            z.writestr(f"SHAPESEG/Adobe/raw/segs/{i}.pt",
                       _pt_bytes(rng.integers(0, 8, nv)))
        # FAUST: shared label file
        v3, _ = mesh(2)
        z.writestr("SHAPESEG/FAUST/raw/faust.zip", _inner_zip_bytes({
            "meshes/tr_reg_000.ply": _ply_bytes(v3, f0)}))
        z.writestr("SHAPESEG/FAUST/raw/segs/faust_seg.pt",
                   _pt_bytes(rng.integers(0, 8, nv)))
        # MIT: .obj meshes + .eseg edge labels
        v4, _ = mesh(3)
        n_edges = len({(min(a, b), max(a, b)) for t in f0
                       for a, b in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2]))})
        z.writestr("SHAPESEG/MIT/raw/mit.zip", _inner_zip_bytes({
            "meshes/crane.obj": _obj_bytes(v4, f0)}))
        z.writestr("SHAPESEG/MIT/raw/segs/crane.eseg", "\n".join(
            str(x) for x in rng.integers(1, 9, n_edges)))
        # SCAPE: shared label file
        v5, _ = mesh(4)
        z.writestr("SHAPESEG/SCAPE/raw/scape.zip", _inner_zip_bytes({
            "meshes/0.ply": _ply_bytes(v5, f0)}))
        z.writestr("SHAPESEG/SCAPE/raw/segs/scape_seg.pt",
                   _pt_bytes(rng.integers(0, 8, nv)))
        # SHREC test: per-mesh labels
        v6, _ = mesh(5)
        z.writestr("SHAPESEG/SHREC/raw/shrec.zip", _inner_zip_bytes({
            "meshes/0.ply": _ply_bytes(v6, f0)}))
        z.writestr("SHAPESEG/SHREC/raw/segs/0.pt",
                   _pt_bytes(rng.integers(0, 8, nv)))


def test_shapeseg_process_real_layout(tmp_path):
    """SHAPESEG._process end-to-end on a fixture archive in the genuine
    nested-zip layout — all four train corpora + the SHREC test set."""
    from fieldconv_tpu.data import SHAPESEG

    root = str(tmp_path / "shapeseg")
    os.makedirs(root)
    _fake_shapeseg_zip(root)

    train = SHAPESEG(root, train=True, epsilon=0.45, sample_n=24)
    test = SHAPESEG(root, train=False, epsilon=0.45, sample_n=24)
    assert len(train) == 5 and len(test) == 1   # 2 adobe + 1 each f/m/s
    for r in train.records() + test.records():
        assert r.labels.shape == (24,)          # subsampled by sample_idx
        assert r.labels.min() >= 0 and r.labels.max() <= 7
    # cache hit
    train2 = SHAPESEG(root, train=True, epsilon=0.45, sample_n=24)
    assert train2.keys == train.keys


def _fake_faustrm_zip(root, n=5):
    rawdir = os.path.join(root, "raw")
    os.makedirs(rawdir, exist_ok=True)
    rng = np.random.default_rng(4)
    v0, f0 = icosphere(subdiv=1)
    nv = len(v0)
    with zipfile.ZipFile(os.path.join(rawdir, "FAUSTRM.zip"), "w") as z:
        for i in range(n):
            v = v0 * (1 + 0.05 * i) + rng.normal(scale=0.005, size=v0.shape)
            z.writestr(f"shapes/tr_reg_{i:03d}.off", _off_bytes(v, f0))
            # .vts: 1-indexed template->scan vertex map (FAUSTRM.py:74-92)
            z.writestr(f"labels/tr_reg_{i:03d}.vts", "\n".join(
                str(x) for x in rng.permutation(nv) + 1))


def test_faustrm_process_real_layout(tmp_path):
    """FAUSTRM._process end-to-end: .off + 1-indexed .vts composeMap path,
    80/20 index split, area normalisation without centering."""
    from fieldconv_tpu.data import FAUSTRM

    root = str(tmp_path / "faustrm")
    os.makedirs(root)
    _fake_faustrm_zip(root, n=5)

    train = FAUSTRM(root, train=True, epsilon=0.45)
    test = FAUSTRM(root, train=False, epsilon=0.45)
    assert len(train) == 4 and len(test) == 1
    for r in train.records() + test.records():
        # labels are template-relative 0-based vertex ids
        assert r.labels.min() >= 0 and r.labels.max() < 42
    train2 = FAUSTRM(root, train=True, epsilon=0.45)
    assert train2.keys == train.keys


def _fake_shrec19_zip(root):
    rawdir = os.path.join(root, "raw")
    os.makedirs(rawdir, exist_ok=True)
    rng = np.random.default_rng(5)
    v0, f0 = icosphere(subdiv=1)
    nv = len(v0)
    with zipfile.ZipFile(os.path.join(rawdir, "SHREC19.zip"), "w") as z:
        for sid in (1, 2, 3):
            v = v0 * (1 + 0.05 * sid) + rng.normal(scale=0.005, size=v0.shape)
            z.writestr(f"models/scan_{sid:03d}.obj", _obj_bytes(v, f0))
        # category pair files (main.cpp:347-433 format: "001,002")
        z.writestr("pairs/figure_pairs.txt", "001,002\n002,003\n")
        z.writestr("pairs/glove_pairs.txt", "")
        z.writestr("pairs/hand_pairs.txt", "")
        for s, t in ((1, 2), (2, 3)):
            gt = rng.integers(0, nv, nv)     # per-target-vertex source id
            z.writestr(f"gt/scan_{s:03d}.scan_{t:03d}.gt.txt",
                       "\n".join(str(x) for x in gt))


def test_shrec19_process_real_layout(tmp_path):
    """SHREC19._process end-to-end on the genuine layout: models/ + pairs/
    category files + gt/ maps; split generation, FPS sampling,
    samplesToNearest matching, all four which-splits, pos_pairs storage."""
    from fieldconv_tpu.data import SHREC19

    root = str(tmp_path / "shrec19")
    os.makedirs(root)
    _fake_shrec19_zip(root)

    nS = 16
    ds = {w: SHREC19(root, which=w, n_samples=nS, epsilon=0.45, seed=0)
          for w in range(4)}
    # 2 figure pairs -> ceil(0.2*2)=1 test + 1 train
    assert len(ds[0]) == 1 and len(ds[1]) == 1
    assert len(ds[2]) == 1 and len(ds[3]) == 1
    for w in range(4):
        r = ds[w].record(0)
        assert r.pos.shape[0] == nS
    pp = ds[0].pos_pairs(0)
    assert pp.shape == (nS, 2)
    assert pp.min() >= 0 and pp.max() < nS
    # source/target of one pair share the pair tag
    assert ds[0].keys[0][1] == ds[1].keys[0][1]


# --- full-dress pipeline rehearsals (VERDICT r4 #6) -------------------------
#
# The fixture-archive tests above pin the LAYOUT semantics on tiny meshes;
# the convergence demos (scripts/train_synthetic_shrec.py) build meshes
# directly and bypass data/ entirely.  These two slow tests close the gap:
# the full archive → _process → artifact cache → cli.main → held-out
# metric path at the real per-mesh scale, so the only untested seam left
# before real data is the download itself.

def _class_shape(ci, inst_rng, subdiv=3):
    """A mesh with CLASS-distinctive GROSS geometry at SHREC11's
    ~600-vertex regime (subdiv 3 = 642 v): a 6×5 grid of ellipsoid axis
    ratios (plus a bump texture).  Gross shape, not texture, is what the
    magnitude-pooled classification head separates — bump-only classes
    keep the pooled logits constant at init and a 30-way softmax never
    escapes chance (measured while building
    scripts/train_synthetic_shrec.py, round 3)."""
    v, f = icosphere(subdiv=subdiv)
    fx = 2 + ci % 5
    r = 1.0 + 0.08 * np.sin(fx * np.arctan2(v[:, 1], v[:, 0])) \
        * np.cos(fx * np.arccos(np.clip(v[:, 2], -1, 1)))
    v = v * r[:, None]
    sx = 0.5 + 0.35 * (ci % 6)
    sz = 0.5 + 0.45 * (ci // 6)
    v = v * np.array([sx, 1.0, sz])
    v = v + inst_rng.normal(scale=0.01, size=v.shape)
    return v, f


@pytest.mark.slow
def test_shrec11_full_dress_rehearsal(tmp_path):
    """ALL 30 classes at the real ~600-vertex scale through the genuine
    zip layout: SHREC11.zip → _process (VHM precompute per mesh) →
    artifact cache → cli --task classification end-to-end.

    Two held-out signals, split by what they can prove on CPU budget:
    (1) DATA INTEGRITY — a 1-NN on each processed record's rotation-
        invariant gross geometry (sorted covariance eigenvalues of the
        stored pos) classifies the held-out test records ≥80%: labels,
        meshes, splits and the cache survived the archive round-trip
        un-scrambled.  (Training-from-scratch accuracy is NOT a
        CPU-budget signal: the magnitude-pooled head needs thousands of
        batch-1 steps to escape the ln(30) plateau — measured curve
        docs/TRAIN_CLASS_r3_curve.jsonl, flat to step ~300, converged by
        10k.  scripts/rehearse_shrec11.py runs that full convergence
        on-chip; its result is recorded in docs/ROUND5_SUMMARY.md.)
    (2) PIPELINE — one full cli epoch over the 90 meshes trains and
        evaluates with a finite loss and a sane metric."""
    from fieldconv_tpu.data.shrec11 import CLASS_NAMES
    from fieldconv_tpu.train import cli

    root = str(tmp_path / "shrec11")
    rawdir = os.path.join(root, "raw")
    os.makedirs(rawdir)
    rng = np.random.default_rng(0)
    n_train, n_test = 3, 1
    with zipfile.ZipFile(os.path.join(rawdir, "SHREC11.zip"), "w") as z:
        for ci, cname in enumerate(CLASS_NAMES):
            for split, count in (("train", n_train), ("test", n_test)):
                for k in range(count):
                    v, f = _class_shape(ci, rng)
                    z.writestr(f"SHREC11/{cname}/{split}/T{k}.obj",
                               _obj_bytes(v, f))

    from fieldconv_tpu.data import SHREC11

    tr = SHREC11(root, train=True, epsilon=0.2)
    te = SHREC11(root, train=False, epsilon=0.2)
    assert len(tr) == 30 * n_train and len(te) == 30 * n_test

    def feat(r):
        p = np.asarray(r.pos, np.float64)
        p = p - p.mean(0)
        return np.sort(np.linalg.eigvalsh(p.T @ p / len(p)))

    trF = np.stack([feat(r) for r in tr.records()])
    trY = np.array([int(r.labels) for r in tr.records()])
    hits = 0
    for r in te.records():
        d = np.linalg.norm(trF - feat(r)[None], axis=1)
        hits += int(trY[np.argmin(d)] == int(r.labels))
    acc = hits / len(te)
    assert acc >= 0.8, f"held-out 1-NN on processed geometry: {acc}"

    metric = cli.main([
        "--task", "classification", "--root", root, "--epochs", "1",
        "--seed", "0",
    ])
    assert metric is not None and 0.0 <= metric <= 1.0
    # artifact cache: a re-instantiation must not reprocess (index reused)
    t0 = __import__("time").time()
    tr2 = SHREC11(root, train=True, epsilon=0.2)
    assert __import__("time").time() - t0 < 30, "cache miss on reload"
    assert tr2.keys == tr.keys


@pytest.mark.slow
def test_faustrm_full_dress_rehearsal(tmp_path):
    """FAUSTRM composeMap labeling on a deformed-pair fixture with KNOWN
    correspondence: scans are vertex-PERMUTED deformations of the
    template, .vts maps are the genuine 1-indexed template→scan maps, so
    the composed labels must recover each scan's permutation exactly;
    then cli --task correspondence runs 2 epochs end-to-end."""
    from fieldconv_tpu.train import cli

    root = str(tmp_path / "faustrm")
    rawdir = os.path.join(root, "raw")
    os.makedirs(rawdir)
    rng = np.random.default_rng(1)
    v0, f0 = icosphere(subdiv=2)
    nv = len(v0)
    perms = []
    with zipfile.ZipFile(os.path.join(rawdir, "FAUSTRM.zip"), "w") as z:
        for i in range(5):
            if i == 0:
                p = np.arange(nv)          # tr_reg_000 IS the template
                v = v0
            else:
                p = rng.permutation(nv)
                v = (v0 * (1 + 0.1 * np.sin(3 * v0[:, 2]))[:, None]
                     + rng.normal(scale=0.004, size=v0.shape))[p]
            inv = np.empty(nv, np.int64)
            inv[p] = np.arange(nv)         # template t sits at scan row inv[t]
            perms.append(p)
            fz = inv[f0]
            z.writestr(f"shapes/tr_reg_{i:03d}.off", _off_bytes(v, fz))
            z.writestr(f"labels/tr_reg_{i:03d}.vts",
                       "\n".join(str(x + 1) for x in inv))

    from fieldconv_tpu.data import FAUSTRM

    train = FAUSTRM(root, train=True, epsilon=0.45)
    test = FAUSTRM(root, train=False, epsilon=0.45)
    assert len(train) == 4 and len(test) == 1
    # composeMap must recover the exact permutation (bijective maps:
    # label of scan row j is the template vertex that sits there); the
    # record stores rows RCM-reordered, so compare through rcm_perm
    for idx, r in enumerate(train.records()):
        np.testing.assert_array_equal(
            np.asarray(r.labels), perms[idx][np.asarray(r.rcm_perm)])

    metric = cli.main([
        "--task", "correspondence", "--root", root, "--epochs", "2",
        "--seed", "0",
    ])
    assert metric is not None and np.isfinite(metric)


@pytest.mark.slow
def test_shapeseg_full_dress_rehearsal(tmp_path):
    """SHAPESEG archive (genuine nested-zip layout, all 5 corpora) →
    _process → cache → cli --task segmentation end-to-end for one epoch:
    closes the cli/fit seam for the segmentation task (the layout
    semantics themselves are pinned by test_shapeseg_process_real_layout)."""
    from fieldconv_tpu.train import cli

    root = str(tmp_path / "shapeseg")
    os.makedirs(root)
    _fake_shapeseg_zip(root)

    metric = cli.main([
        "--task", "segmentation", "--root", root, "--epochs", "1",
        "--seed", "0",
    ])
    assert metric is not None and 0.0 <= metric <= 1.0


@pytest.mark.slow
def test_shrec19_full_dress_rehearsal(tmp_path):
    """SHREC19 archive (models/ + pairs/ + gt/) → _process (split
    generation, FPS, samplesToNearest) → cache → cli --task matching
    end-to-end: twin training over the generated pairs plus the TwinEval
    FP/FN test metric."""
    from fieldconv_tpu.train import cli

    root = str(tmp_path / "shrec19")
    os.makedirs(root)
    _fake_shrec19_zip(root)

    err = cli.main([
        "--task", "matching", "--root", root, "--epochs", "2",
        "--seed", "0", "--sample-n", "16",
    ])
    assert err is not None and np.isfinite(err) and err >= 0.0
