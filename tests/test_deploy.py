"""Deployment bundles + AOT predictor (fieldconv_tpu/deploy).

The reference has no deployment path at all — eval cells reuse the
in-session net (classification.ipynb cell 13) — so these tests pin the
framework-native contract: export → load round-trips config+params exactly,
the AOT-compiled forward equals the jit forward, and task-level outputs
carry the documented fields at true (unpadded) lengths.
"""

import numpy as np
import pytest

def _records(rng, task="classification", n_meshes=3, N=20, n_classes=3):
    from fieldconv_tpu.data.base import MeshRecord

    recs = []
    for m in range(n_meshes):
        edges = []
        for i in range(N):
            for j in rng.choice(N, size=4, replace=False):
                edges.append((j, i))
        edges = np.asarray(edges, np.int64)
        E = len(edges)
        ang = rng.uniform(-np.pi, np.pi, E)
        labels = (np.int64(m % n_classes) if task == "classification"
                  else rng.integers(0, n_classes, N).astype(np.int32))
        recs.append(MeshRecord(
            name=f"m{m}",
            pos=rng.normal(size=(N, 3)).astype(np.float32),
            supp_edges=edges,
            log_mag=rng.uniform(0.0, 0.3, E).astype(np.float32),
            log_ang=rng.uniform(-np.pi, np.pi, E).astype(np.float32),
            xp=np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32),
            weights=rng.uniform(0.1, 1.0, N).astype(np.float32),
            labels=labels,
            epsilon=0.5,
        ))
    return recs


def _tiny_config(task):
    from fieldconv_tpu.train.config import ExperimentConfig

    return ExperimentConfig(task=task, band_limit=1, n_rings=2, nf=4,
                            n_des=4, n_bins=2, epochs=1)


def _init_params(config, recs, n_classes, seed=0):
    import jax

    from fieldconv_tpu.data.base import shared_bucket
    from fieldconv_tpu.train.loop import build_model, make_batches

    net = build_model(config, n_classes)
    n_pad, d_slots = shared_bucket(recs)
    batches = make_batches(recs, config, 1, None, n_pad, d_slots)
    b0 = batches[0]
    import jax.numpy as jnp  # noqa: F401

    params = jax.jit(net.init)(
        jax.random.key(seed), b0.pos[0],
        jax.tree.map(lambda x: x[0], b0.table))
    return net, params, (n_pad, d_slots)


def test_bundle_roundtrip(tmp_path, rng):
    """export → load restores the exact config, n_classes, meta, and params
    (bitwise: msgpack carries raw float bytes)."""
    import jax

    from fieldconv_tpu.deploy import export_bundle, load_bundle

    config = _tiny_config("classification")
    recs = _records(rng)
    net, params, _ = _init_params(config, recs, n_classes=3)

    path = export_bundle(str(tmp_path / "b"), config, params, 3,
                         meta={"note": "test", "final_metric": 0.5})
    bundle = load_bundle(path)
    assert bundle.config == config
    assert bundle.n_classes == 3
    assert bundle.meta == {"note": "test", "final_metric": 0.5}
    ref = jax.tree.leaves(params)
    got = jax.tree.leaves(bundle.params)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bundle_rejects_unknown_fields_and_versions(tmp_path, rng):
    import json
    import os

    from fieldconv_tpu.deploy import export_bundle, load_bundle

    config = _tiny_config("classification")
    recs = _records(rng, n_meshes=1)
    net, params, _ = _init_params(config, recs, n_classes=3)
    path = export_bundle(str(tmp_path / "b"), config, params, 3)

    doc_path = os.path.join(path, "bundle.json")
    with open(doc_path) as f:
        doc = json.load(f)
    doc["config"]["not_a_field"] = 1
    with open(doc_path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(ValueError, match="unknown fields"):
        load_bundle(path)

    del doc["config"]["not_a_field"]
    doc["format"] = 99
    with open(doc_path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(ValueError, match="format"):
        load_bundle(path)


def test_predictor_classification_aot_matches_jit(tmp_path, rng):
    """Warm-up builds one executable for one bucket; the AOT-compiled
    output equals the plain jit forward; predictions carry class + logits
    per record, in input order."""
    from fieldconv_tpu.deploy import Predictor, export_bundle
    from fieldconv_tpu.train.trainer import batched_apply

    config = _tiny_config("classification")
    recs = _records(rng, n_meshes=3)
    net, params, _ = _init_params(config, recs, n_classes=3)
    path = export_bundle(str(tmp_path / "b"), config, params, 3)

    pred = Predictor(path)
    batches = pred.make_batches(recs)
    assert pred.warmup(batches) == 1          # one shared bucket signature
    assert pred.warmup(batches) == 0          # idempotent
    aot = np.asarray(pred.logits(batches[0]))
    ref = np.asarray(batched_apply(net, params, batches[0]))
    np.testing.assert_allclose(aot, ref, rtol=1e-6, atol=1e-6)

    outs = pred.predict(recs)
    assert len(outs) == 3
    for o in outs:
        assert set(o) == {"class", "logits"}
        assert o["logits"].shape == (3,)
        assert o["class"] == int(np.argmax(o["logits"]))


def test_predictor_segmentation_outputs_true_length(tmp_path, rng):
    """Per-vertex outputs are cut to each record's true sample count, not
    the padded bucket size."""
    from fieldconv_tpu.deploy import Predictor, export_bundle

    config = _tiny_config("segmentation")
    recs = _records(rng, task="segmentation", n_meshes=2, N=20)
    net, params, _ = _init_params(config, recs, n_classes=3)
    path = export_bundle(str(tmp_path / "s"), config, params, 3)

    pred = Predictor(path)
    outs = pred.predict(recs)
    assert len(outs) == 2
    for o, r in zip(outs, recs):
        assert o["labels"].shape == (r.n_samples,)
        assert o["logits"].shape == (r.n_samples, 3)
        np.testing.assert_array_equal(
            o["labels"], np.argmax(o["logits"], axis=-1))


def test_predictor_strict_shapes_guard(tmp_path, rng):
    """strict_shapes=True turns an un-warmed signature into an error —
    the serving guard against silent first-request compiles."""
    import pytest

    from fieldconv_tpu.deploy import Predictor, export_bundle

    config = _tiny_config("classification")
    recs = _records(rng, n_meshes=2)
    net, params, _ = _init_params(config, recs, n_classes=3)
    path = export_bundle(str(tmp_path / "b"), config, params, 3)

    pred = Predictor(path, strict_shapes=True)
    batches = pred.make_batches(recs)
    with pytest.raises(RuntimeError, match="not warmed up"):
        pred.logits(batches[0])
    pred.warmup(batches[:1])
    pred.logits(batches[0])   # now fine


def test_train_cli_export_then_deploy_cli(tmp_path, rng, monkeypatch):
    """End-to-end: fit() → export_bundle → deploy CLI predicts the same
    records from disk only (no training-session state)."""
    from fieldconv_tpu.deploy import cli as dcli
    from fieldconv_tpu.deploy import export_bundle
    from fieldconv_tpu.train.loop import fit

    config = _tiny_config("classification")
    recs = _records(rng, n_meshes=3)
    net, state, final = fit(config, recs, test_records=recs[:1],
                            n_classes=3, batch_size=1)
    path = export_bundle(str(tmp_path / "b"), config, state.params, 3,
                         {"final_metric": final})

    # deploy CLI over raw records is dataset-bound; drive main() with a
    # monkeypatched record source instead of a dataset root
    monkeypatch.setattr(dcli, "records_from_root",
                        lambda root, split, cfg: recs)
    out_npz = str(tmp_path / "preds.npz")
    outs = dcli.main(["--bundle", path, "--root", "unused",
                      "--out", out_npz])
    assert len(outs) == 3
    data = np.load(out_npz)
    assert f"{recs[0].name}/class" in data
    assert data[f"{recs[0].name}/logits"].shape == (3,)


def test_descriptor_match_bruteforce(rng):
    """Chunked MXU nearest-descriptor search == numpy brute force, incl.
    a source count that is not a chunk multiple."""
    from fieldconv_tpu.deploy.matching import descriptor_match

    fs = rng.normal(size=(37, 8)).astype(np.float32)
    ft = rng.normal(size=(53, 8)).astype(np.float32)
    idx, d2 = descriptor_match(fs, ft, chunk=16)
    ref_d2 = ((fs[:, None, :] - ft[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, np.argmin(ref_d2, axis=1))
    np.testing.assert_allclose(d2, ref_d2.min(axis=1), rtol=1e-4, atol=1e-4)


def test_predictor_match_pairs(tmp_path, rng):
    """A deployed MatchingNet matches two shapes end-to-end; identical
    shapes match mostly to themselves with near-zero distance."""
    from fieldconv_tpu.deploy import Predictor, export_bundle

    config = _tiny_config("matching")
    recs = _records(rng, task="classification", n_meshes=2, N=20)
    net, params, _ = _init_params(config, recs, n_classes=1)
    path = export_bundle(str(tmp_path / "m"), config, params, 1)

    pred = Predictor(path)
    outs = pred.match([recs[0]], [recs[0]])   # self-match
    assert len(outs) == 1
    o = outs[0]
    assert set(o) == {"indices", "sq_dist", "accepted"}
    assert o["indices"].shape == (recs[0].n_samples,)
    # self-match: every vertex's nearest descriptor distance is ~0
    np.testing.assert_allclose(o["sq_dist"], 0.0, atol=1e-5)
    assert o["accepted"].all()

    with pytest.raises(ValueError, match="matching bundle"):
        cfg2 = _tiny_config("classification")
        _, p2, _ = _init_params(cfg2, recs, n_classes=3)
        path2 = export_bundle(str(tmp_path / "c"), cfg2, p2, 3)
        Predictor(path2).match([recs[0]], [recs[0]])


def test_predictor_banded_path_matches_xla(tmp_path, rng):
    """Serving through the Pallas banded layout (banded_tb=) predicts the
    same labels/logits as the XLA gather path — the deploy CLI's
    --banded-tb flag is safe to flip on."""
    from fieldconv_tpu.deploy import Predictor, export_bundle

    config = _tiny_config("segmentation")
    recs = _records(rng, task="segmentation", n_meshes=2, N=20)
    net, params, _ = _init_params(config, recs, n_classes=3)
    path = export_bundle(str(tmp_path / "s"), config, params, 3)

    xla = Predictor(path).predict(recs)
    banded = Predictor(path, banded_tb=8).predict(recs)
    for a, b in zip(xla, banded):
        np.testing.assert_allclose(a["logits"], b["logits"],
                                   rtol=5e-4, atol=5e-5)


def test_raw_mesh_cli_preprocessing_matches_training(tmp_path, rng):
    """The raw-mesh serving path applies the TASK's training transform
    chain, validated against the dataset classes' OWN build recipes
    (not against the CLI's flag table): segmentation must match a
    SHAPESEG-style build (NormalizeArea + NormalizeAxes), correspondence
    a FAUSTRM-style build (manual sqrt-area scaling, normalize=False —
    data/faustrm.py:57-59)."""
    from fieldconv_tpu.data.base import process_mesh
    from fieldconv_tpu.data.synthetic import icosphere
    from fieldconv_tpu.deploy.cli import records_from_meshes
    from fieldconv_tpu.geometry.mesh import TriMesh

    v, f = icosphere(subdiv=1)
    v = v * np.array([1.0, 1.3, 0.7]) + 0.1   # break symmetry, off-center
    off = tmp_path / "m.off"
    with open(off, "w") as fh:
        fh.write(f"OFF\n{len(v)} {len(f)} 0\n")
        for p in v:
            fh.write(f"{p[0]} {p[1]} {p[2]}\n")
        for t in f:
            fh.write(f"3 {t[0]} {t[1]} {t[2]}\n")

    # segmentation: the SHAPESEG recipe (base._build with post_axes=True)
    config = _tiny_config("segmentation")
    rec = records_from_meshes([str(off)], config)[0]
    want = process_mesh(
        np.asarray(v, np.float64), np.asarray(f, np.int64),
        epsilon=config.epsilon, sample_n=None, name="w",
        labels=np.int64(-1), normalize=True, post_axes=True)
    np.testing.assert_allclose(rec.pos, want.pos, rtol=1e-6)
    np.testing.assert_allclose(rec.log_mag, want.log_mag, rtol=1e-5)

    # correspondence: the FAUSTRM recipe — v /= sqrt(area), THEN
    # process_mesh(normalize=False) (data/faustrm.py:57-65)
    config = _tiny_config("correspondence")
    rec = records_from_meshes([str(off)], config)[0]
    v64 = np.asarray(v, np.float64)
    v_scaled = v64 / np.sqrt(TriMesh(v64, f).surface_area())
    want = process_mesh(
        v_scaled, np.asarray(f, np.int64),
        epsilon=config.epsilon, sample_n=None, name="w",
        labels=np.int64(-1), normalize=False, post_axes=False)
    np.testing.assert_allclose(rec.pos, want.pos, rtol=1e-6)
    np.testing.assert_allclose(rec.log_mag, want.log_mag, rtol=1e-5)

    # the two chains genuinely differ on this mesh (else the test is vacuous)
    seg = records_from_meshes([str(off)], _tiny_config("segmentation"))[0]
    assert not np.allclose(seg.pos, rec.pos)


def test_vertex_ids_roundtrip(rng, tmp_path):
    """MeshRecord.vertex_ids maps output rows back to input-file vertices
    through both the FPS subsample and the RCM reorder; the deploy CLI
    writes it beside per-vertex outputs."""
    from fieldconv_tpu.data.base import ArtifactStore, process_mesh
    from fieldconv_tpu.data.synthetic import icosphere

    v, f = icosphere(subdiv=2)
    rec = process_mesh(np.asarray(v, np.float64), np.asarray(f, np.int64),
                       epsilon=0.5, sample_n=100, name="m",
                       labels=np.int64(-1))
    vid = rec.vertex_ids()
    assert vid.shape == (rec.n_samples,)
    # each record row's position is exactly the original vertex it claims
    # (use an unnormalized build so positions compare directly):
    rec2 = process_mesh(np.asarray(v, np.float64), np.asarray(f, np.int64),
                        epsilon=0.5, sample_n=100, name="m2",
                        labels=np.int64(-1), normalize=False)
    vid2 = rec2.vertex_ids()
    np.testing.assert_allclose(rec2.pos, np.asarray(v, np.float32)[vid2],
                               rtol=1e-6)

    # survives the artifact cache
    store = ArtifactStore(str(tmp_path))
    store.save("k", rec2)
    back = store.load("k")
    np.testing.assert_array_equal(back.vertex_ids(), vid2)


def test_raw_mesh_matching_pairs_scale_by_source_area(tmp_path, rng):
    """Matching serves (source, target) pairs: BOTH meshes are scaled by
    the SOURCE's surface area, as SHREC19 training does
    (data/shrec19.py:104-107); an odd mesh count is rejected."""
    from fieldconv_tpu.data.base import process_mesh
    from fieldconv_tpu.data.synthetic import icosphere
    from fieldconv_tpu.deploy.cli import records_from_meshes
    from fieldconv_tpu.geometry.mesh import TriMesh

    paths = []
    meshes = []
    for i, r in enumerate([1.0, 2.0]):   # unequal areas
        v, f = icosphere(subdiv=1)
        v = v * r
        p = tmp_path / f"m{i}.off"
        with open(p, "w") as fh:
            fh.write(f"OFF\n{len(v)} {len(f)} 0\n")
            for q in v:
                fh.write(f"{q[0]} {q[1]} {q[2]}\n")
            for t in f:
                fh.write(f"3 {t[0]} {t[1]} {t[2]}\n")
        paths.append(str(p))
        meshes.append((np.asarray(v, np.float64), np.asarray(f, np.int64)))

    config = _tiny_config("matching")
    src_scale = np.sqrt(TriMesh(*meshes[0]).surface_area())
    recs = records_from_meshes(paths, config)
    for (v, f), rec in zip(meshes, recs):
        want = process_mesh(v / src_scale, f, epsilon=config.epsilon,
                            sample_n=None, name="w", labels=np.int64(-1),
                            normalize=False, post_axes=False)
        np.testing.assert_allclose(rec.pos, want.pos, rtol=1e-6)

    with pytest.raises(SystemExit, match="PAIRS"):
        records_from_meshes(paths[:1], config)
