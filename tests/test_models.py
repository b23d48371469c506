"""Model-level tests: shapes, jit, grads, losses, and the gauge-equivariance
property of the field-convolution pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import random_graph, random_field
import ref_numpy as ref

from fieldconv_tpu.precomp.stencil import build_edge_table
from fieldconv_tpu.models import (
    ClassificationNet,
    CorrespondenceNet,
    MatchingNet,
    SegmentationNet,
)
from fieldconv_tpu.nn import losses
from fieldconv_tpu.nn.modules import FieldConv
from fieldconv_tpu.utils import complexops as co


def make_table(g, **kw):
    return build_edge_table(
        g["edges"], g["log_mag"], g["log_ang"], g["w"], g["xp"],
        g["n_vertices"], g["B"], g["R"], g["epsilon"], **kw,
    )


def make_pos(rng, table):
    pos = rng.normal(size=(table.n_pad, 3)).astype(np.float32)
    pos[table.n_valid:] = 0.0
    return jnp.asarray(pos)


def test_classification_net(rng):
    g = random_graph(rng, n_vertices=30, avg_deg=6)
    table = make_table(g)
    pos = make_pos(rng, table)
    net = ClassificationNet(n_classes=7, nf=8, band_limit=g["B"], n_rings=g["R"])
    params = net.init(jax.random.key(0), pos, table)
    logits = jax.jit(net.apply)(params, pos, table)
    assert logits.shape == (1, 7)
    assert np.all(np.isfinite(np.asarray(logits)))

    def loss_fn(p):
        return losses.cross_entropy(net.apply(p, pos, table), jnp.array([3]))

    gr = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(gr)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_segmentation_net(rng):
    g = random_graph(rng, n_vertices=26, avg_deg=5)
    table = make_table(g)
    pos = make_pos(rng, table)
    net = SegmentationNet(n_classes=4, nf=6, n_des=6, n_bins=2,
                          band_limit=g["B"], n_rings=g["R"])
    params = net.init(jax.random.key(0), pos, table)
    out = jax.jit(net.apply)(params, pos, table)
    assert out.shape == (table.n_pad, 4)
    labels = jnp.asarray(
        np.where(np.asarray(table.vmask) > 0,
                 np.arange(table.n_pad) % 4, -1))
    l = losses.label_smoothing_loss(out, labels, 4, smoothing=0.2)
    assert np.isfinite(float(l))


@pytest.mark.slow
def test_correspondence_net(rng):
    g = random_graph(rng, n_vertices=22, avg_deg=5, B=1, R=3)
    table = make_table(g)
    pos = make_pos(rng, table)
    net = CorrespondenceNet(n_classes=50, nf=6, n_des=4, n_bins=2,
                            band_limit=1, n_rings=3)
    params = net.init(jax.random.key(0), pos, table)
    out = net.apply(params, pos, table, deterministic=True)
    assert out.shape == (table.n_pad, 50)
    # dropout path needs an rng
    out2 = net.apply(params, pos, table, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})
    assert out2.shape == (table.n_pad, 50)


def test_matching_net_and_twin_loss(rng):
    g = random_graph(rng, n_vertices=20, avg_deg=5, B=1, R=6)
    table = make_table(g)
    pos = make_pos(rng, table)
    net = MatchingNet(nf=6, descriptor_dim=5, band_limit=1, n_rings=6)
    params = net.init(jax.random.key(0), pos, table)
    f_s = net.apply(params, pos, table)
    f_t = net.apply(params, pos + 0.01, table)
    assert f_s.shape == (table.n_pad, 5)

    pp = jnp.asarray(rng.integers(0, 20, size=(8, 2)))
    npairs = jnp.asarray(rng.integers(0, 20, size=(8, 2)))
    l = losses.twin_loss(jax.random.key(2), f_s, f_t, pp, npairs)
    assert np.isfinite(float(l))
    n_fn, n_fp = losses.twin_eval(f_s, f_t, pp, npairs)
    assert 0 <= int(n_fn) <= 8 and 0 <= int(n_fp) <= 8


def test_gauge_equivariance(rng):
    """Rotating every tangent frame by α (features by e^{-iα}, log angles and
    transport consistently) must rotate FieldConv outputs by e^{-iα} —
    the core equivariance the architecture exists for (paper §4)."""
    alpha = 0.73
    g = random_graph(rng, n_vertices=24, avg_deg=6)
    # rotated-frame copy: θ -> θ - α  (log map expressed in source frame);
    # transport e^{iφ} is frame-to-frame and for a *global* frame rotation
    # is unchanged.
    g2 = dict(g)
    g2["log_ang"] = g["log_ang"] - alpha

    t1, t2 = make_table(g), make_table(g2)
    x = random_field(rng, g["n_vertices"], 4, zero_frac=0.0)
    rot = np.exp(-1j * alpha)

    def planar_pad(z, n_pad):
        p = np.stack([z.real, z.imag], -1).astype(np.float32)
        return jnp.asarray(np.pad(p, ((0, n_pad - z.shape[0]), (0, 0), (0, 0))))

    net = FieldConv(4, 3, band_limit=g["B"], n_rings=g["R"], ftype=1)
    params = net.init(jax.random.key(0), planar_pad(x, t1.n_pad), t1)

    y1 = np.asarray(net.apply(params, planar_pad(x, t1.n_pad), t1))
    y2 = np.asarray(net.apply(params, planar_pad(x * rot, t2.n_pad), t2))
    y1c = (y1[..., 0] + 1j * y1[..., 1]) * rot
    y2c = y2[..., 0] + 1j * y2[..., 1]
    np.testing.assert_allclose(y2c, y1c, atol=1e-5)


def test_label_smoothing_matches_manual(rng):
    logits = jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=6))
    got = float(losses.label_smoothing_loss(logits, labels, 5, smoothing=0.2))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    td = np.full((6, 5), 0.2 / 4)
    td[np.arange(6), np.asarray(labels)] = 0.8
    want = float(np.mean(np.sum(-td * lp, axis=1)))
    assert abs(got - want) < 1e-6


def test_weight_porting_roundtrip(rng):
    """flax -> torch-style dict -> flax is identity, incl. the (1,C) bias
    shape adaptation."""
    from fieldconv_tpu.utils.port_weights import (
        flax_to_torch_state_dict,
        torch_state_dict_to_flax,
    )

    g = random_graph(rng, n_vertices=20, avg_deg=4)
    table = make_table(g)
    pos = make_pos(rng, table)
    net = ClassificationNet(n_classes=4, nf=6, band_limit=g["B"], n_rings=g["R"])
    params = net.init(jax.random.key(0), pos, table)

    sd = flax_to_torch_state_dict(params)
    assert "lift.field.zonalAng" in sd
    assert "resnet1.conv1.zonal" in sd
    assert "resnet2.res.Re" in sd
    # simulate the reference's (1, C) nonlin bias layout
    sd2 = {k: (v.reshape(1, -1) if k.endswith("nonlin.bias") or
               k.endswith("nonlin1.bias") or k.endswith("nonlin2.bias")
               else v) for k, v in sd.items()}
    restored = torch_state_dict_to_flax(sd2, params)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(restored)[0],
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    y1 = net.apply(params, pos, table)
    y2 = net.apply(restored, pos, table)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
