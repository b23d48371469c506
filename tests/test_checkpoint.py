"""Checkpoint/resume round-trip (train/checkpoint.py, SURVEY.md §5.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _tiny_state(seed=0):
    from fieldconv_tpu.train.trainer import TrainState

    key = jax.random.key(seed)
    params = {
        "dense": {"w": jax.random.normal(key, (4, 3)),
                  "b": jnp.zeros((3,))},
    }
    opt_state = {"m": jax.tree.map(jnp.zeros_like, params)}
    return TrainState(params, opt_state, jnp.asarray(7, jnp.int32))


def test_checkpoint_roundtrip(tmp_path):
    try:
        from fieldconv_tpu.train.checkpoint import CheckpointManager
    except ImportError:
        pytest.skip("orbax not available")

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() is None

    state = _tiny_state()
    mgr.save(state)
    assert mgr.latest_step() == 7

    template = jax.tree.map(jnp.zeros_like, state)
    restored = mgr.restore(template)
    assert restored is not None
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a later save wins latest-resume
    state2 = _tiny_state(seed=1)
    state2 = type(state2)(state2.params, state2.opt_state,
                          jnp.asarray(11, jnp.int32))
    mgr.save(state2)
    assert mgr.latest_step() == 11
    restored2 = mgr.restore(template)
    for a, b in zip(jax.tree.leaves(restored2.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
