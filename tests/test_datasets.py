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
