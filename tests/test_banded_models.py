"""Banded Pallas path through the full models: parity with the XLA path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from test_band_conv import banded_graph, tables_for
from fieldconv_tpu.models import ClassificationNet
from fieldconv_tpu.train.trainer import stack_batch, batched_apply, MeshBatch


@pytest.mark.slow
def test_model_banded_matches_xla(rng):
    g = banded_graph(rng, n_vertices=64, tb=8, bw=7)
    table, banded = tables_for(g, tb=8)
    pos = np.zeros((table.n_pad, 3), np.float32)
    pos[: table.n_valid] = rng.normal(size=(table.n_valid, 3))
    pos = jnp.asarray(pos)

    net = ClassificationNet(n_classes=5, nf=6, band_limit=g["B"], n_rings=g["R"])
    params = net.init(jax.random.key(0), pos, table)
    y_xla = net.apply(params, pos, table)
    y_band = net.apply(params, pos, table, banded)
    np.testing.assert_allclose(
        np.asarray(y_band), np.asarray(y_xla), atol=1e-4, rtol=1e-4
    )


def test_stack_batch_banded_and_vmap(rng):
    g = banded_graph(rng, n_vertices=32, tb=8, bw=7)
    table, _ = tables_for(g, tb=8)
    pos = np.zeros((table.n_pad, 3), np.float32)
    pos[: table.n_valid] = rng.normal(size=(table.n_valid, 3))

    batch = stack_batch(
        [(pos, table, np.int32(0)), (pos, table, np.int32(1))], banded_tb=8
    )
    assert batch.banded is not None
    assert batch.banded.sten_band.ndim == 5  # leading batch axis

    net = ClassificationNet(n_classes=5, nf=6, band_limit=g["B"], n_rings=g["R"])
    params = net.init(jax.random.key(0), jnp.asarray(pos), table)
    out = batched_apply(net, params, batch)
    assert out.shape == (2, 1, 5)

    batch_plain = MeshBatch(batch.pos, batch.table, batch.labels, None)
    out_plain = batched_apply(net, params, batch_plain)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_plain), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_segmentation_comp_echo_matches(rng):
    """SegmentationNet with the banded gather-free ECHO == XLA ECHO."""
    import jax
    from fieldconv_tpu.models import SegmentationNet
    from fieldconv_tpu.train.trainer import stack_batch, batched_apply

    g = banded_graph(rng, n_vertices=64, tb=8, bw=14)
    table, banded = tables_for(g, tb=8)
    pos = np.asarray(rng.normal(size=(table.n_pad, 3)), np.float32)
    net = SegmentationNet(n_classes=4, nf=6, n_des=6, n_bins=2,
                          band_limit=2, n_rings=6)
    params = net.init(jax.random.key(0), pos, table)
    batch = stack_batch([(pos, table, np.zeros(table.n_pad, np.int32))],
                        banded_tb=8, echo_banded=True)
    assert batch.comp is not None
    y_comp = batched_apply(net, params, batch)
    y_ref = net.apply(params, pos, table)
    np.testing.assert_allclose(np.asarray(y_comp[0]), np.asarray(y_ref),
                               atol=5e-5, rtol=5e-5)


def test_segmentation_mixed_banded_conv_panel_echo(rng):
    """MIXED batch mode (stack_batch(banded_tb, echo_panel=True)): banded
    Pallas convs + panel-kernel ECHO/lift == the XLA path — the
    measured-optimal routing at production shapes (KERNEL_NOTES r4)."""
    from fieldconv_tpu.models import SegmentationNet
    from fieldconv_tpu.precomp.banded import PanelTable

    g = banded_graph(rng, n_vertices=64, tb=8, bw=7)
    table, banded = tables_for(g, tb=8)
    pos = np.asarray(rng.normal(size=(table.n_pad, 3)), np.float32)
    net = SegmentationNet(n_classes=4, nf=6, n_des=6, n_bins=2,
                          band_limit=2, n_rings=6)
    params = net.init(jax.random.key(0), pos, table)
    batch = stack_batch([(pos, table, np.zeros(table.n_pad, np.int32))],
                        banded_tb=8, echo_panel=True)
    assert batch.banded is not None
    assert isinstance(batch.panel, list) and \
        isinstance(batch.panel[0], PanelTable)
    y_mixed = batched_apply(net, params, batch)
    y_ref = net.apply(params, pos, table)
    np.testing.assert_allclose(np.asarray(y_mixed[0]), np.asarray(y_ref),
                               atol=5e-5, rtol=5e-5)


def test_correspondence_panel_full_model_matches_xla(rng):
    """The full correspondence-style net (Lift + 8×ResNet + 4 meta-res +
    ECHOBlock + head) through the panel-CSR layout for EVERY op — convs
    (_band_panel), lift (trans_field_panel_contrib), ECHO (echo_panel) —
    == the XLA gather path: outputs and parameter grads.  This is the
    layout stack that runs the 100k-vertex config (VERDICT r3 #1)."""
    from test_band_conv import _panel_setup
    from fieldconv_tpu.models import CorrespondenceNet

    g, table, panel = _panel_setup(rng, compressed=True, B=1, R=3,
                                   n_vertices=96)
    pos = np.asarray(rng.normal(size=(table.n_pad, 3)), np.float32)
    labels = jnp.asarray(rng.integers(0, 7, table.n_pad), jnp.int32)

    net = CorrespondenceNet(n_classes=7, nf=6, n_des=4, n_bins=2,
                            band_limit=1, n_rings=3, dropout=0.0)
    params = net.init(jax.random.key(0), pos, table)

    def loss(params, use_panel):
        if use_panel:
            logits = net.apply(params, pos, table, panel, panel)
        else:
            logits = net.apply(params, pos, table)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], 1))

    (l1, g1) = jax.value_and_grad(loss)(params, False)
    (l2, g2) = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(flat2[path]), np.asarray(leaf),
            rtol=2e-3, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.slow
def test_mixed_nh_batch_comp_parity(rng):
    """Two meshes with different bandwidths stacked into one batch: the
    widened compressed tables (_pad_comp's R_SENTINEL/zero slots) must give
    the same per-mesh outputs as each mesh's own unwidened comp table
    (ADVICE r1 #3)."""
    from fieldconv_tpu.models import SegmentationNet

    g_narrow = banded_graph(rng, n_vertices=64, tb=8, bw=7)    # nh = 1
    g_wide = banded_graph(rng, n_vertices=64, tb=8, bw=14)     # nh = 2
    t_n, _ = tables_for(g_narrow, tb=8)
    t_w, _ = tables_for(g_wide, tb=8)
    pos_n = np.asarray(rng.normal(size=(t_n.n_pad, 3)), np.float32)
    pos_w = np.asarray(rng.normal(size=(t_w.n_pad, 3)), np.float32)
    labels = np.zeros(t_n.n_pad, np.int32)

    net = SegmentationNet(n_classes=4, nf=6, n_des=6, n_bins=2,
                          band_limit=2, n_rings=6)
    params = net.init(jax.random.key(0), jnp.asarray(pos_n), t_n)

    batch = stack_batch([(pos_n, t_n, labels), (pos_w, t_w, labels)],
                        banded_tb=8, echo_banded=True)
    assert batch.comp is not None and batch.comp.nh == 2
    y = batched_apply(net, params, batch)

    for i, (pos, tab) in enumerate([(pos_n, t_n), (pos_w, t_w)]):
        single = stack_batch([(pos, tab, labels)], banded_tb=8,
                             echo_banded=True)
        y_one = batched_apply(net, params, single)
        np.testing.assert_allclose(np.asarray(y[i]), np.asarray(y_one[0]),
                                   atol=5e-5, rtol=5e-5)
