"""BASELINE configs[4] stand-in: the 100k+-vertex single-chip pipeline.

Subdivided-FAUST is not obtainable in this environment (no dataset
archives); the stand-in is an area-normalised icosphere at subdiv 7
(163,842 vertices — same vertex count regime).  Measures, end to end:
  1. offline precompute (vectorised radius_graph + tiled patch-local VHM)
  2. kd-order reorder + compressed panel-CSR table build
     (precomp/banded.py::build_panel_table — the layout whose stencil
     memory scales with the actual panel count; the dense band is O(N^1.5)
     and the fixed-NJ block-sparse band was measured 32.5GB at this N)
  3. jitted fwd+bwd FieldConv step on the real TPU chip (scan-timed,
     ops/pallas/band_conv.py::_band_panel)

Replaces the reference's per-sample solver loop (fcutils/src/main.cpp:
118-124) at a scale the reference cannot reach.  Writes one JSON line per
stage to stdout.

Env knobs: SCALE_SUBDIV (7), SCALE_TB (128), SCALE_CHUNK (1),
SCALE_CACHE (npz path).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    from fieldconv_tpu.data.synthetic import icosphere
    from fieldconv_tpu.geometry.mesh import TriMesh
    from fieldconv_tpu.geometry.sampling import radius_graph
    from fieldconv_tpu.precomp.pipeline import (compute_log_xport,
                                                normalize_area)
    from fieldconv_tpu.precomp.banded import (build_panel_table, kd_order,
                                              reorder_precompute)
    from fieldconv_tpu.precomp.stencil import build_edge_table

    t_all = time.time()
    subdiv = int(os.environ.get("SCALE_SUBDIV", "7"))
    TB = int(os.environ.get("SCALE_TB", "128"))
    CH = int(os.environ.get("SCALE_CHUNK", "1"))
    v, f = icosphere(subdiv=subdiv)
    v = normalize_area(v, f)
    N = len(v)
    eps = float(np.sqrt(64 / (np.pi * N)))
    t0 = time.time()
    edges = radius_graph(v, eps)
    t_graph = time.time() - t0
    print(json.dumps({"stage": "radius_graph", "n_vertices": N,
                      "n_edges": len(edges), "seconds": round(t_graph, 2)}),
          flush=True)

    mesh = TriMesh(v, f)
    sample_idx = np.arange(N)
    cache = os.environ.get("SCALE_CACHE", "/tmp/scale100k_cache.npz")
    if cache and os.path.exists(cache):
        z = np.load(cache)
        lm, la, xpc, w = z["lm"], z["la"], z["xp"], z["w"]
        print(json.dumps({"stage": "precompute_tiled", "seconds": "cached"}),
              flush=True)
    else:
        t0 = time.time()
        pre = compute_log_xport(mesh, sample_idx, edges, epsilon=eps)
        t_pre = time.time() - t0
        lm, la, xpc, w = pre.log_mag, pre.log_ang, pre.xp, pre.weights
        if cache:
            np.savez(cache, lm=lm, la=la, xp=xpc, w=w)
        print(json.dumps({"stage": "precompute_tiled",
                          "seconds": round(t_pre, 1)}), flush=True)

    B, R = 1, 3   # correspondence-style filters at scale
    t0 = time.time()
    perm = kd_order(v, tb=TB)
    edges_r, w_r = reorder_precompute(perm, edges, w)
    table = build_edge_table(edges_r, lm, la, w_r, xpc,
                             N, B, R, eps, n_multiple=TB)
    panel = build_panel_table(table, tb=TB, compressed=True, chunk=CH)
    t_band = time.time() - t0
    sten_gb = panel.sten.size * 4 / 1e9
    nb = table.n_pad // TB
    print(json.dumps({"stage": "panel_table", "seconds": round(t_band, 1),
                      "chunk": CH, "n_panels": int(panel.n_panels),
                      "panels_per_block": round(panel.n_panels / nb, 1),
                      "stencil_gb": round(sten_gb, 2)}), flush=True)

    # on-chip step
    import jax
    import jax.numpy as jnp

    from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded
    C = O = 16
    rng = np.random.default_rng(0)
    Np = table.n_pad
    x0 = jnp.asarray(np.stack([rng.normal(size=(Np, C)),
                               rng.normal(size=(Np, C))], -1), jnp.float32)
    zon = jnp.asarray(rng.normal(size=(O, C, R)) * 0.1, jnp.float32)
    sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)) * 0.1, jnp.float32)
    ph = jnp.asarray(rng.normal(size=(O, C, B + 1)) * 0.1, jnp.float32)
    panel_d = jax.device_put(panel)
    edges_n = float(np.asarray(table.mask, np.float64).sum())

    def loss(x, t):
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

    t0 = time.time()
    xf, s = steps(x0, panel_d)
    float(s)
    print(json.dumps({"stage": "compile+first",
                      "seconds": round(time.time() - t0, 1)}), flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        xf, s = steps(x0, panel_d)
        float(s)
        ts.append((time.time() - t0) / INNER)
    dt = sorted(ts)[1]
    print(json.dumps({"stage": "fwd_bwd_step_tpu", "n_pad": int(Np),
                      "ms_per_step": round(dt * 1e3, 2),
                      "medges_per_s": round(edges_n / dt / 1e6)}), flush=True)
    print(json.dumps({"stage": "total",
                      "seconds": round(time.time() - t_all, 1)}), flush=True)


if __name__ == "__main__":
    main()
