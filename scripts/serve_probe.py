"""On-chip serving probe for the deploy path (AOT Predictor).

Reports, at the two production shape classes (segmentation N=2048 nf=48,
correspondence N=5120 nf=32 — the notebook regimes), for a deployed bundle:

  * warm-up (AOT .lower().compile()) wall time,
  * steady-state per-request device latency via the repo's honest
    device-loop protocol (KERNEL_NOTES.md: a lax.scan chains ITERS
    forwards with a data dependence — each iteration perturbs pos by a
    scalar folded from the previous logits — and ONE scalar rides D2H as
    the tunnel barrier; single-call block_until_ready timings through the
    axon tunnel are unreliable in BOTH directions: identical repeated
    calls dedup to ~0.1 ms, and per-call dispatch on the shared chip
    queues to 100+ ms),
  * one-time H2D placement cost of the mesh artifact (Predictor.place).

The batch is built by the PRODUCTION routing (stack_batch mixed mode:
banded convs + panel ECHO/lift, the presets' measured optimum).  Prints
one JSON line per task.

Env: SERVE_TASKS (seg,corr), SERVE_ITERS (10), SERVE_REPS (3),
SERVE_TB (128).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_synthetic_tables
    from fieldconv_tpu.deploy import Predictor, export_bundle
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import build_model
    from fieldconv_tpu.train.trainer import batched_apply, stack_batch

    tasks = os.environ.get("SERVE_TASKS", "seg,corr").split(",")
    ITERS = int(os.environ.get("SERVE_ITERS", "10"))
    REPS = int(os.environ.get("SERVE_REPS", "3"))
    TB = int(os.environ.get("SERVE_TB", "128"))

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
            n_des=c["n_des"], n_bins=c["n_bins"], echo_impl="panel")
        table_np = build_synthetic_tables(N=c["N"], D=128, B=c["B"],
                                          R=c["R"])
        pos = np.random.default_rng(0).normal(
            size=(table_np.n_pad, 3)).astype(np.float32)
        labels = np.zeros((table_np.n_pad,), np.int32)
        batch = stack_batch([(pos, table_np, labels)], banded_tb=TB,
                            echo_panel=True)

        net = build_model(config, c["n_classes"])
        params = jax.jit(net.init)(
            jax.random.key(0), batch.pos[0],
            jax.tree.map(lambda x: x[0], batch.table))

        path = f"/tmp/serve_probe_{name}"
        export_bundle(path, config, params, c["n_classes"])
        pred = Predictor(path, banded_tb=TB)

        # one-time costs: H2D placement of the mesh artifact + AOT compile
        t0 = time.perf_counter()
        placed = jax.block_until_ready(pred.place(batch))
        h2d_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_exe = pred.warmup([placed])
        warm_s = time.perf_counter() - t0

        # steady-state device latency: scan-chained forwards, one D2H
        # scalar; the body is the Predictor's OWN serving forward (net,
        # params, apply_kw all from the loaded bundle)
        @jax.jit
        def run_batch(params, b):
            def body(carry, _):
                bi = dataclasses.replace(b, pos=b.pos + carry)
                y = batched_apply(pred.net, params, bi, **pred.apply_kw)
                return jnp.sum(y) * 1e-20, None

            chk, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=ITERS)
            return chk

        float(run_batch(pred.params, placed))   # compile + settle
        meds = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            float(run_batch(pred.params, placed))   # tunnel barrier
            meds.append((time.perf_counter() - t0) * 1e3 / ITERS)
        lat = float(np.median(meds))
        print(json.dumps({
            "task": name, "N": c["N"], "nf": c["nf"], "tb": TB,
            "warmup_s": round(warm_s, 2), "executables": n_exe,
            "h2d_s": round(h2d_s, 2),
            "device_latency_ms": round(lat, 2),
            "meshes_per_s": round(1e3 / lat, 1),
            "reps_ms": [round(m, 2) for m in meds],
        }), flush=True)


if __name__ == "__main__":
    main()
