"""Production-pipeline panel routing: process_mesh(order) → make_batches →
fit() trains end-to-end through the panel-CSR layout (VERDICT r3 #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import random_graph


def _seg_records(rng, n_meshes=2, N=24):
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
        recs.append(MeshRecord(
            name=f"m{m}",
            pos=rng.normal(size=(N, 3)).astype(np.float32),
            supp_edges=edges,
            log_mag=rng.uniform(0.0, 0.3, E).astype(np.float32),
            log_ang=rng.uniform(-np.pi, np.pi, E).astype(np.float32),
            xp=np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32),
            weights=rng.uniform(0.1, 1.0, N).astype(np.float32),
            labels=rng.integers(0, 4, N).astype(np.int32),
            epsilon=0.5,
        ))
    return recs


def test_make_batches_resolves_panel_layout(rng):
    """layout='auto' routes to panels above the threshold; the batch then
    carries per-mesh PanelTables and no banded/comp tables."""
    from fieldconv_tpu.precomp.banded import PanelTable
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import make_batches, resolve_layout

    recs = _seg_records(rng)
    cfg_auto = ExperimentConfig(task="segmentation", band_limit=1,
                                n_rings=2, panel_threshold=8)
    assert resolve_layout(cfg_auto, 128) == "panel"
    assert resolve_layout(cfg_auto.__class__(
        task="segmentation", panel_threshold=10**9), 128) == "banded"

    batches = make_batches(recs, cfg_auto, batch_size=2, banded_tb=8)
    b = batches[0]
    assert b.banded is None and b.comp is None
    assert isinstance(b.panel, list) and len(b.panel) == 2
    assert all(isinstance(p, PanelTable) and p.compressed for p in b.panel)


def test_fit_trains_through_panels(rng):
    """fit() end-to-end on the panel layout: every op (lift, convs, ECHO)
    runs the panel paths, loss is finite, params update, evaluation runs."""
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import fit

    recs = _seg_records(rng)
    config = ExperimentConfig(
        task="segmentation", band_limit=1, n_rings=2, nf=4, n_des=4,
        n_bins=2, epochs=2, smoothing=0.2, log_every=1,
        layout="panel")
    net, state, final = fit(config, recs, test_records=recs[:1],
                            n_classes=4, batch_size=1, banded_tb=8)
    assert int(np.asarray(state.step)) == 2 * len(recs)
    assert final is not None and 0.0 <= final <= 1.0


def test_fit_trains_through_panel_compact_pair(rng):
    """Pure-panel layout with echo_impl='compact': batches pair block
    PanelTables (convs) with CompactPanelTables (ECHO + lift) — the
    >=20k-vertex routing — and fit() trains end-to-end through it."""
    from fieldconv_tpu.precomp.banded import CompactPanelTable, PanelTable
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import fit, make_batches

    recs = _seg_records(rng)
    config = ExperimentConfig(
        task="segmentation", band_limit=1, n_rings=2, nf=4, n_des=4,
        n_bins=2, epochs=2, smoothing=0.2, log_every=1,
        layout="panel", echo_impl="compact")
    batches = make_batches(recs, config, batch_size=1, banded_tb=8)
    b = batches[0]
    assert b.banded is None
    assert all(isinstance(p, PanelTable) for p in b.panel)
    assert all(isinstance(c, CompactPanelTable) for c in b.compact)

    net, state, final = fit(config, recs, test_records=recs[:1],
                            n_classes=4, batch_size=1, banded_tb=8)
    assert int(np.asarray(state.step)) == 2 * len(recs)
    assert final is not None and 0.0 <= final <= 1.0


def test_fit_trains_through_all_compact(rng):
    """Pure-panel layout with conv_impl='compact' + echo_impl='compact':
    ONE CompactPanelTable serves every op (convs included — the measured
    163k optimum, docs/SCALE_100K.json); the block-panel build is skipped
    (batch.panel IS batch.compact) and fit() trains end-to-end."""
    from fieldconv_tpu.precomp.banded import CompactPanelTable
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import fit, make_batches

    recs = _seg_records(rng)
    config = ExperimentConfig(
        task="segmentation", band_limit=1, n_rings=2, nf=4, n_des=4,
        n_bins=2, epochs=2, smoothing=0.2, log_every=1,
        layout="panel", echo_impl="compact", conv_impl="compact")
    batches = make_batches(recs, config, batch_size=1, banded_tb=8)
    b = batches[0]
    assert b.banded is None
    assert all(isinstance(p, CompactPanelTable) for p in b.panel)
    assert all(p is c for p, c in zip(b.panel, b.compact))

    net, state, final = fit(config, recs, test_records=recs[:1],
                            n_classes=4, batch_size=1, banded_tb=8)
    assert int(np.asarray(state.step)) == 2 * len(recs)
    assert final is not None and 0.0 <= final <= 1.0


def test_conv_impl_compact_requires_echo_compact():
    from fieldconv_tpu.train.config import ExperimentConfig

    with pytest.raises(ValueError, match="echo_impl"):
        ExperimentConfig(task="segmentation", conv_impl="compact",
                         echo_impl="panel")


def test_fit_trains_through_compact(rng):
    """fit() end-to-end with echo_impl='compact': mixed batches carry a
    BandedTable for the convs and per-mesh CompactPanelTables for ECHO +
    lift; loss is finite, params update, evaluation runs."""
    from fieldconv_tpu.precomp.banded import CompactPanelTable
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import fit, make_batches

    recs = _seg_records(rng)
    config = ExperimentConfig(
        task="segmentation", band_limit=1, n_rings=2, nf=4, n_des=4,
        n_bins=2, epochs=2, smoothing=0.2, log_every=1,
        layout="banded", echo_impl="compact")
    batches = make_batches(recs, config, batch_size=1, banded_tb=8)
    b = batches[0]
    assert b.banded is not None
    assert isinstance(b.panel, list)
    assert all(isinstance(p, CompactPanelTable) for p in b.panel)

    net, state, final = fit(config, recs, test_records=recs[:1],
                            n_classes=4, batch_size=1, banded_tb=8)
    assert int(np.asarray(state.step)) == 2 * len(recs)
    assert final is not None and 0.0 <= final <= 1.0


def test_process_mesh_kd_order(rng):
    """order='kd' (and 'auto' above the threshold) stores records in k-d
    leaf order — the block-local order the panel layout wants."""
    from fieldconv_tpu.data.base import process_mesh
    from fieldconv_tpu.data.synthetic import icosphere
    from fieldconv_tpu.precomp.banded import kd_order

    v, f = icosphere(subdiv=2)
    rec_kd = process_mesh(v, f, epsilon=0.4, sample_n=None, name="s",
                          labels=np.int32(0), order="kd", kd_tb=16)
    rec_auto = process_mesh(v, f, epsilon=0.4, sample_n=None, name="s",
                            labels=np.int32(0), order="auto", kd_tb=16,
                            kd_threshold=10)
    # same ordering choice: auto resolved to kd above the tiny threshold
    np.testing.assert_array_equal(rec_kd.rcm_perm, rec_auto.rcm_perm)
    # the stored positions are a permutation of the normalised positions
    # consistent with kd_order on the stored pos
    perm_again = kd_order(rec_kd.pos[np.argsort(rec_kd.rcm_perm)], tb=16)
    np.testing.assert_array_equal(np.sort(rec_kd.rcm_perm),
                                  np.arange(len(rec_kd.pos)))
    assert len(perm_again) == len(rec_kd.pos)
