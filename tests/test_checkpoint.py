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


def test_preemption_kill_resume(tmp_path):
    """SIGKILL a training run mid-flight (a simulated preemption — no
    atexit, no cleanup), then relaunch: the second run must resume from the
    last *finalized* checkpoint, not step 0, and train to completion
    (SURVEY.md §5.3 — the reference has no failure handling at all)."""
    import os
    import subprocess
    import sys
    import time

    try:
        from fieldconv_tpu.train.checkpoint import CheckpointManager
    except ImportError:
        pytest.skip("orbax not available")

    worker = os.path.join(os.path.dirname(__file__), "preempt_worker.py")
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    # run 1: nominally 500 epochs; SIGKILL as soon as a checkpoint is on disk
    p = subprocess.Popen([sys.executable, worker, ckpt, "500"], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        def steps_on_disk():
            if not os.path.isdir(ckpt):
                return []
            return [d for d in os.listdir(ckpt) if d.isdigit()]

        deadline = time.time() + 300
        while time.time() < deadline and not steps_on_disk():
            if p.poll() is not None:
                raise AssertionError(
                    "worker exited before its first checkpoint:\n"
                    + p.stdout.read().decode())
            time.sleep(0.5)
        assert steps_on_disk(), "no checkpoint appeared within 300 s"
        time.sleep(1.0)          # let it get back into training
        p.kill()                 # SIGKILL the exact PID we spawned
        p.wait()
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()

    latest = CheckpointManager(ckpt).latest_step()
    assert latest is not None and latest > 0

    # run 2: resume, finish a couple of epochs past the kill point
    steps_per_epoch = 2
    epochs = latest // steps_per_epoch + 2
    out = subprocess.run([sys.executable, worker, ckpt, str(epochs)],
                         env=env, capture_output=True, timeout=600)
    text = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, text
    assert "resumed from step" in text, text
    assert "FINISHED" in text, text
    final = CheckpointManager(ckpt).latest_step()
    assert final == epochs * steps_per_epoch
