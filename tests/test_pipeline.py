"""End-to-end slice (SURVEY.md §7.2): synthetic-mesh precompute → training."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp
import optax

from fieldconv_tpu.data.synthetic import icosphere
from fieldconv_tpu.models import ClassificationNet
from fieldconv_tpu.nn import losses
from fieldconv_tpu.precomp.pipeline import precompute_mesh, mesh_cache_key


def deformed_sphere(stretch, seed):
    rng = np.random.default_rng(seed)
    v, f = icosphere(subdiv=2)
    v = v * np.array([1.0, 1.0, stretch])
    v = v + rng.normal(scale=0.01, size=v.shape)
    return v, f


def test_precompute_properties():
    v, f = icosphere(subdiv=2)
    table, pre, vn = precompute_mesh(v, f, epsilon=0.35, band_limit=2, n_rings=4)
    # transport coefficients are unit complex
    np.testing.assert_allclose(np.abs(pre.xp), 1.0, atol=1e-6)
    # self-edges carry log 0
    selfe = pre.supp_edges[:, 0] == pre.supp_edges[:, 1]
    assert selfe.sum() == len(pre.sample_idx)
    np.testing.assert_allclose(pre.log_mag[selfe], 0.0, atol=1e-9)
    # integration weights: non-negative, sum to total mass (=1 after area
    # normalisation up to lumping)
    assert (pre.weights >= 0).all()
    assert abs(pre.weights.sum() - 1.0) < 0.02
    # log magnitudes roughly match Euclidean distance on the sampled sphere
    sij = pre.supp_edges[~selfe]
    d_euc = np.linalg.norm(vn[sij[:, 1]] - vn[sij[:, 0]], axis=1)
    rel = np.abs(pre.log_mag[~selfe] - d_euc) / np.maximum(d_euc, 1e-9)
    assert np.median(rel) < 0.1, np.median(rel)

    key = mesh_cache_key(v, f, 0.35, None, 2, 4)
    assert key == mesh_cache_key(v, f, 0.35, None, 2, 4)
    assert key != mesh_cache_key(v, f, 0.36, None, 2, 4)


@pytest.mark.slow
def test_end_to_end_classification_training():
    """Two synthetic shape classes; the net must overfit to 100% train acc."""
    B, R, eps = 2, 4, 0.35
    meshes, labels = [], []
    for s in range(4):
        stretch = 1.0 if s % 2 == 0 else 1.6
        v, f = deformed_sphere(stretch, seed=s)
        meshes.append(precompute_mesh(v, f, epsilon=eps, band_limit=B, n_rings=R,
                                      d_slots=96, n_pad=168))
        labels.append(s % 2)

    net = ClassificationNet(n_classes=2, nf=8, band_limit=B, n_rings=R)

    def pos_of(m):
        table, _, vn = m
        pos = np.zeros((table.n_pad, 3), np.float32)
        pos[: table.n_valid] = vn[np.asarray(m[1].sample_idx)]
        return jnp.asarray(pos)

    tables = [m[0] for m in meshes]
    poss = [pos_of(m) for m in meshes]
    params = net.init(jax.random.key(0), poss[0], tables[0])
    opt = optax.adam(0.01)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, pos, table, y):
        def lf(p):
            return losses.cross_entropy(net.apply(p, pos, table), y)
        l, gr = jax.value_and_grad(lf)(params)
        up, ost2 = opt.update(gr, ost)
        return optax.apply_updates(params, up), ost2, l

    for epoch in range(15):
        for i in range(4):
            params, ost, l = step(params, ost, poss[i], tables[i],
                                  jnp.array([labels[i]]))

    correct = 0
    for i in range(4):
        pred = int(jnp.argmax(net.apply(params, poss[i], tables[i])[0]))
        correct += pred == labels[i]
    assert correct == 4, f"train accuracy {correct}/4"
