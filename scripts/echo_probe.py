"""On-chip A/B: ECHO implementations at the two production shape classes.

Variants: onehot (XLA separable one-hot splat, ops/echo.py::echo),
banded (XLA gather-free windowed, ops/echo.py::echo_banded),
panel_pallas (in-VMEM channel-major panel kernel,
ops/pallas/echo_panel.py::echo_panel_pallas — the 100k hot path, runnable
at any shape).  The banded in-VMEM kernel was deleted in r4: two
restructures in, it still crashed the Mosaic compiler at TB=128
(channel-minor VMEM blowup); docs/KERNEL_NOTES.md.

Device-loop protocol (lax.scan of INNER iters inside one jit) — the honest
chip step rate, per docs/KERNEL_NOTES.md.
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
    from fieldconv_tpu.ops.echo import echo, echo_banded
    from fieldconv_tpu.ops.pallas.echo_panel import echo_panel_pallas
    from fieldconv_tpu.precomp.banded import build_panel_table
    from fieldconv_tpu.precomp.banded import build_compressed_banded

    shapes = os.environ.get(
        "ECHO_SHAPES", "corr:5120:12:2,seg:2048:48:3").split(",")
    variants = os.environ.get("ECHO_VARIANTS", "onehot,banded,panel_pallas").split(",")
    mode = os.environ.get("ECHO_MODE", "fwdbwd")      # fwd | fwdbwd
    cc = int(os.environ.get("ECHO_CC", "16"))
    INNER = int(os.environ.get("ECHO_INNER", "10"))
    # loop=host: single-step jit (small program — the scan-of-grad programs
    # have been observed to wedge the remote-compile helper), median of
    # chained host dispatches; loop=device: lax.scan protocol
    loop = os.environ.get("ECHO_LOOP", "device")

    for spec in shapes:
        name, N, C, nb = spec.split(":")
        N, C, nb = int(N), int(C), int(nb)
        table_np = build_synthetic_tables(N=N, D=128, B=2, R=6)
        table = jax.device_put(table_np)
        comp = jax.device_put(build_compressed_banded(table_np, tb=128))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(N, C, 2)) * 0.5, jnp.float32)

        fns = {
            "onehot": lambda x: echo(x, table, nb, d_chunk=128),
            "banded": lambda x: echo_banded(x, comp, nb),
            "panel_pallas": lambda x, _pn=jax.device_put(
                build_panel_table(table_np, tb=128, compressed=True)):
                echo_panel_pallas(x, _pn, nb, cc=cc),
        }
        for vname in variants:
            fn = fns[vname]

            if mode == "fwd":
                def one(x):
                    y = fn(x * 1.000001)
                    return x + 1e-6 * jnp.mean(y)
            else:
                def loss(x):
                    return jnp.sum(jnp.sin(fn(x)))

                def one(x):
                    dx = jax.grad(loss)(x)
                    return dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-8) * 0.5

            if loop == "host":
                step = jax.jit(one)

                def steps(x):
                    for _ in range(INNER):
                        x = step(x)
                    return x, jnp.sum(x)
            else:
                @jax.jit
                def steps(x):
                    def body(x, _):
                        return one(x), ()
                    xf, _ = jax.lax.scan(body, x, None, length=INNER)
                    return xf, jnp.sum(xf)

            try:
                t0 = time.time()
                xf, s = steps(x)
                float(s)
                compile_s = time.time() - t0
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    xf, s = steps(x)
                    float(s)
                    ts.append((time.time() - t0) / INNER)
                dt = sorted(ts)[1]
                print(json.dumps({
                    "shape": name, "variant": vname, "mode": mode,
                    "loop": loop, "ms": round(dt * 1e3, 2),
                    "compile_s": round(compile_s, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001 — report and keep probing
                print(json.dumps({
                    "shape": name, "variant": vname, "mode": mode,
                    "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
