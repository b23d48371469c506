"""On-chip smoke + timing probe for the panel-CSR kernel at moderate scale.

Builds a synthetic kd-ordered graph at N vertices, runs the panel kernel
fwd+bwd under a device loop, and prints ms/step + Medges/s alongside the
dense-banded kernel at the same shapes (when it fits).
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
    from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded
    from fieldconv_tpu.precomp.banded import (build_banded_table,
                                              build_panel_table)

    N = int(os.environ.get("PROBE_N", "8192"))
    D = int(os.environ.get("PROBE_D", "128"))
    TB = int(os.environ.get("PROBE_TB", "128"))
    B, R, C, O = 2, 6, 32, 32
    compressed = os.environ.get("PROBE_COMPRESSED", "1") != "0"
    variants = os.environ.get("PROBE_VARIANTS", "panel,banded").split(",")

    table = build_synthetic_tables(N=N, D=D, B=B, R=R)
    edges = N * D
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(N, C, 2)) * 0.5, jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)) * 0.2, jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)) * 0.2, jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)) * 0.2, jnp.float32)

    tables = {}
    if "panel" in variants:
        t0 = time.time()
        panel = build_panel_table(table, tb=TB, compressed=compressed)
        tables["panel"] = jax.device_put(panel)
        print(json.dumps({
            "variant": "panel", "P": int(panel.n_panels),
            "sten_mb": round(panel.sten.size * 4 / 1e6, 1),
            "build_s": round(time.time() - t0, 1)}), flush=True)
    if "compact" in variants:
        from fieldconv_tpu.precomp.banded import build_compact_panel_table

        CTB = int(os.environ.get("PROBE_CTB", "32"))
        t0 = time.time()
        compact = build_compact_panel_table(table, tb=CTB, ts=128)
        tables["compact"] = jax.device_put(compact)
        print(json.dumps({
            "variant": "compact", "P": int(compact.n_panels), "tbt": CTB,
            "sten_mb": round(compact.sten.size * 4 / 1e6, 1),
            "build_s": round(time.time() - t0, 1)}), flush=True)
    if "banded" in variants:
        banded = build_banded_table(table, tb=128)
        tables["banded"] = jax.device_put(banded)
        print(json.dumps({
            "variant": "banded",
            "sten_mb": round(banded.sten_band.size * 4 / 1e6, 1)}),
            flush=True)

    def loss(x, t):
        from fieldconv_tpu.precomp.banded import CompactPanelTable
        from fieldconv_tpu.ops.pallas.band_conv import field_conv_compact

        if isinstance(t, CompactPanelTable):
            y = field_conv_compact(x, t, zon, sph, ph, 1)
        else:
            y = field_conv_banded(x, t, zon, sph, ph, 1)
        return jnp.sum(y * y)

    INNER = 10

    @jax.jit
    def steps(x, t):
        def body(x, _):
            dx = jax.grad(loss)(x, t)
            return dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-8), ()
        xf, _ = jax.lax.scan(body, x, None, length=INNER)
        return xf, jnp.sum(xf)

    for name, t in tables.items():
        t0 = time.time()
        xf, s = steps(x, t)
        float(s)
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            xf, s = steps(x, t)
            float(s)
            ts.append((time.time() - t0) / INNER)
        dt = sorted(ts)[1]
        print(json.dumps({
            "variant": name, "N": N, "ms_per_step": round(dt * 1e3, 2),
            "medges_per_s": round(edges / dt / 1e6),
            "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
