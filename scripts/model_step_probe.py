"""On-chip full-model train-step timing at the production shape classes.

Times make_train_step (fwd+bwd+Adam, augmentation on device) for the
segmentation and correspondence nets over synthetic band-limited graphs
at the notebook shapes, with the batch built by the PRODUCTION routing
(stack_batch mixed mode: banded convs + panel ECHO/lift — the presets'
echo_impl='panel').  Median of host-dispatched steps.

Env: STEP_TASKS (seg,corr), STEP_MODE (panel|compact|banded|onehot),
STEP_INNER.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_synthetic_tables
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import build_model
    from fieldconv_tpu.train.trainer import (TrainState, make_optimizer,
                                             make_train_step, stack_batch)

    tasks = os.environ.get("STEP_TASKS", "seg,corr").split(",")
    mode = os.environ.get("STEP_MODE", "panel")
    INNER = int(os.environ.get("STEP_INNER", "10"))

    cfgs = {
        "seg": dict(task="segmentation", N=2048, nf=48, n_des=48, n_bins=3,
                    B=2, R=6, n_classes=8),
        "corr": dict(task="correspondence", N=5120, nf=32, n_des=12,
                     n_bins=2, B=1, R=3, n_classes=4999),
    }
    for name in tasks:
        c = cfgs[name]
        config = ExperimentConfig(
            task=c["task"], band_limit=c["B"], n_rings=c["R"], nf=c["nf"],
            n_des=c["n_des"], n_bins=c["n_bins"],
            echo_impl=mode if mode in ("onehot", "banded", "panel",
                                       "compact")
            else "onehot",
            random_scale=(0.85, 1.15) if name == "seg" else None)
        table_np = build_synthetic_tables(N=c["N"], D=128, B=c["B"],
                                          R=c["R"])
        rng = np.random.default_rng(0)
        pos = np.asarray(rng.normal(size=(table_np.n_pad, 3)) * 0.3,
                         np.float32)
        labels = rng.integers(0, c["n_classes"],
                              table_np.n_pad).astype(np.int32)
        kw = {}
        if mode == "panel":
            kw = dict(banded_tb=128, echo_panel=True)
        elif mode == "compact":
            kw = dict(banded_tb=128, echo_compact=True)
        elif mode == "banded":
            kw = dict(banded_tb=128, echo_banded=True)
        elif mode == "onehot":
            kw = dict(banded_tb=128)
        batch = stack_batch([(pos, table_np, labels)], **kw)
        batch = jax.device_put(batch)

        net = build_model(config, c["n_classes"])
        params = jax.jit(net.init)(
            jax.random.key(0), batch.pos[0],
            jax.tree.map(lambda x: x[0], batch.table))
        opt = make_optimizer(config)
        state = TrainState(params, jax.jit(opt.init)(params),
                           jnp.zeros((), jnp.int32))
        step_fn = make_train_step(net, config, c["n_classes"], opt)
        key = jax.random.key(1)
        t0 = time.time()
        key, sub = jax.random.split(key)
        state, m = step_fn(state, sub, batch)
        l0 = float(m["loss"])
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(INNER):
                key, sub = jax.random.split(key)
                state, m = step_fn(state, sub, batch)
            float(m["loss"])
            ts.append((time.time() - t0) / INNER)
        print(json.dumps({
            "task": name, "mode": mode, "n_pad": int(table_np.n_pad),
            "ms_per_step": round(sorted(ts)[1] * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "loss0": round(l0, 3)}), flush=True)


if __name__ == "__main__":
    main()
