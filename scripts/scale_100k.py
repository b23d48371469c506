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
SCALE_CACHE (npz path), SCALE_OP (1: run the single-conv stage),
SCALE_MODEL (0: run the FULL correspondence-style net — Lift + 8×ResNet +
4 meta-residuals + ECHOBlock(n_des 12, n_bins 2) + dropout + 4999-way
head — fwd+bwd+Adam on the chip; the head is applied row-chunked with
rematerialisation so the (N, 4999) logits never materialise),
SCALE_ECHO_PC (8: panels per echo scan step), SCALE_STEPS (3).
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

    if os.environ.get("SCALE_CONV_IMPL", "panel") == "compact" and \
            os.environ.get("SCALE_COMPACT_TABLE", "1") == "0":
        raise SystemExit(
            "SCALE_CONV_IMPL=compact needs the compact table: unset "
            "SCALE_COMPACT_TABLE=0 (otherwise SCALE_MODEL would init with "
            "no tables at all)")
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
    if int(os.environ.get("SCALE_FAKE_PRECOMP", "0")):
        # kernel-timing-only mode: keep the REAL graph structure (radius
        # graph on the real surface, kd order, panel occupancy) but fill
        # the stencil values randomly — the VHM solve contributes nothing
        # to kernel timing and costs ~22 min at this N
        r = np.random.default_rng(0)
        E = len(edges)
        lm = r.uniform(0.0, 0.9 * eps, E)
        la = r.uniform(-np.pi, np.pi, E)
        xpc = np.exp(1j * r.uniform(-np.pi, np.pi, E))
        w = r.uniform(0.1, 1.0, N)
        print(json.dumps({"stage": "precompute_tiled",
                          "seconds": "FAKE (timing-only structure)"}),
              flush=True)
    elif cache and os.path.exists(cache):
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
    # pad rows so the compact-table block count divides the planned shard
    # counts (e.g. 1024 = 32·32 keeps nb divisible through 16 shards)
    nmult = int(os.environ.get("SCALE_NMULT", str(TB)))
    table = build_edge_table(edges_r, lm, la, w_r, xpc,
                             N, B, R, eps, n_multiple=nmult)
    compressed = os.environ.get("SCALE_COMPRESSED", "1") != "0"
    conv_impl = os.environ.get("SCALE_CONV_IMPL", "panel")
    panel = None
    if conv_impl != "compact":
        panel = build_panel_table(table, tb=TB, compressed=compressed,
                                  chunk=CH)
        if os.environ.get("SCALE_STEN_BF16", "0") != "0":
            from fieldconv_tpu.precomp.banded import cast_panel_sten

            panel = cast_panel_sten(panel)
        t_band = time.time() - t0
        sten_gb = panel.sten.size * panel.sten.dtype.itemsize / 1e9
        nb = table.n_pad // TB
        print(json.dumps({"stage": "panel_table",
                          "seconds": round(t_band, 1),
                          "chunk": CH, "n_panels": int(panel.n_panels),
                          "panels_per_block": round(panel.n_panels / nb, 1),
                          "stencil_gb": round(sten_gb, 2)}), flush=True)
    else:
        # all-compact mode: the block-panel table is never built — ONE
        # CompactPanelTable serves every op (the 5.54 GB / 98 s block
        # build disappears from the pipeline)
        print(json.dumps({"stage": "panel_table", "skipped":
                          "conv_impl=compact"}), flush=True)

    compact = None
    if os.environ.get("SCALE_COMPACT_TABLE", "1") != "0":
        from fieldconv_tpu.precomp.banded import (build_compact_panel_table,
                                                  cast_panel_sten)

        t0 = time.time()
        ctb = int(os.environ.get("SCALE_COMPACT_TB", str(TB)))
        compact = build_compact_panel_table(table, tb=ctb)
        if os.environ.get("SCALE_STEN_BF16", "0") != "0":
            compact = cast_panel_sten(compact)
        cgb = compact.sten.size * compact.sten.dtype.itemsize / 1e9
        print(json.dumps({
            "stage": "compact_table", "seconds": round(time.time() - t0, 1),
            "tb": ctb, "n_panels": int(compact.n_panels),
            "stencil_gb": round(cgb, 2)}), flush=True)

        if os.environ.get("SCALE_HALO_STATS", "0") != "0":
            # boundary-compression measurement (CompactHaloShards): how
            # many referenced rows are actually remote per shard pair at
            # this kd-ordered 163k table — grounds the multi-host wire-
            # byte projection in docs/KERNEL_NOTES.md
            from fieldconv_tpu.parallel.comm_model import (
                correspondence_compact_halo_step_bytes,
                correspondence_panel_step_bytes)
            from fieldconv_tpu.precomp.banded import compact_halo_stats

            nb_c = table.n_pad // ctb
            for S in (2, 4, 8, 16):
                if nb_c % S:
                    print(json.dumps({
                        "stage": "halo_stats", "n_shards": S,
                        "skipped": f"nb={nb_c} % {S} != 0 (pad with "
                                   "SCALE_NMULT)"}), flush=True)
                    continue
                t0 = time.time()
                st = compact_halo_stats(compact, S)
                halo = correspondence_compact_halo_step_bytes(
                    st["h_max"], S)["total"]
                gather = correspondence_panel_step_bytes(
                    table.n_pad, table.n_pad // S)["total"]
                print(json.dumps({
                    "stage": "halo_stats", "n_shards": S,
                    "h_max": st["h_max"],
                    "pair_rows_mean": round(st["pair_rows_mean"], 1),
                    "boundary_fraction": round(st["boundary_fraction"], 4),
                    "step_wire_gb_halo": round(halo / 1e9, 4),
                    "step_wire_gb_gather": round(gather / 1e9, 3),
                    "wire_reduction": round(gather / max(halo, 1), 1),
                    "panel_imbalance": round(st.get("panel_imbalance", 1),
                                             3),
                    "seconds": round(time.time() - t0, 1)}), flush=True)

    # on-chip step
    import jax
    import jax.numpy as jnp

    from fieldconv_tpu.ops.pallas.band_conv import field_conv_banded
    rng = np.random.default_rng(0)
    Np = table.n_pad
    # all-compact mode: the op stage measures the conv off the compact
    # table (field_conv_banded dispatches on the table type)
    op_tbl = panel if panel is not None else compact
    panel_d = jax.device_put(op_tbl) if op_tbl is not None else None
    edges_n = float(np.asarray(table.mask, np.float64).sum())

    if int(os.environ.get("SCALE_OP", "1")) and panel_d is not None:
        C = O = 16
        x0 = jnp.asarray(np.stack([rng.normal(size=(Np, C)),
                                   rng.normal(size=(Np, C))], -1),
                         jnp.float32)
        zon = jnp.asarray(rng.normal(size=(O, C, R)) * 0.1, jnp.float32)
        sph = jnp.asarray(rng.normal(size=(O, C, R, B, 2)) * 0.1,
                          jnp.float32)
        ph = jnp.asarray(rng.normal(size=(O, C, B + 1)) * 0.1, jnp.float32)

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
                          "medges_per_s": round(edges_n / dt / 1e6)}),
              flush=True)

        if compact is not None and int(os.environ.get("SCALE_OP_COMPACT",
                                                      "1")):
            # same protocol through the compact-layout conv (the block vs
            # compact A/B at the north-star sparsity)
            from fieldconv_tpu.ops.pallas.band_conv import field_conv_compact

            compact_dd = jax.device_put(compact)

            def loss_cp(x, t):
                y = field_conv_compact(x, t, zon, sph, ph, 1)
                return jnp.sum(y * y)

            @jax.jit
            def steps_cp(x, t):
                def body(x, _):
                    dx = jax.grad(loss_cp)(x, t)
                    return dx * jax.lax.rsqrt(jnp.mean(dx * dx) + 1e-8), ()
                xf, _ = jax.lax.scan(body, x, None, length=INNER)
                return xf, jnp.sum(xf)

            t0 = time.time()
            xf, s = steps_cp(x0, compact_dd)
            float(s)
            print(json.dumps({"stage": "compact_compile+first",
                              "seconds": round(time.time() - t0, 1)}),
                  flush=True)
            ts = []
            for _ in range(3):
                t0 = time.time()
                xf, s = steps_cp(x0, compact_dd)
                float(s)
                ts.append((time.time() - t0) / INNER)
            dt = sorted(ts)[1]
            print(json.dumps({"stage": "fwd_bwd_step_tpu_compact",
                              "n_pad": int(Np),
                              "ms_per_step": round(dt * 1e3, 2),
                              "medges_per_s": round(edges_n / dt / 1e6)}),
                  flush=True)
            del compact_dd

    compact_d = jax.device_put(compact) if compact is not None else None
    if int(os.environ.get("SCALE_MODEL", "0")):
        run_full_model(panel_d, table, edges_n, rng, compact=compact_d)
    if int(os.environ.get("SCALE_INFER", "0")):
        run_infer(panel_d, table, rng, compact=compact_d)
    if int(os.environ.get("SCALE_DECOMP", "0")):
        if panel_d is None:
            print(json.dumps({"stage": "decomp",
                              "skipped": "needs the block panel table "
                              "(unset SCALE_CONV_IMPL=compact)"}),
                  flush=True)
        else:
            run_decomp(panel_d, table, rng, compact=compact_d)
    print(json.dumps({"stage": "total",
                      "seconds": round(time.time() - t_all, 1)}), flush=True)


def run_infer(panel, table, rng, compact=None):
    """Serving probe at the 163k north star (SCALE_INFER=1): the full
    correspondence net FORWARD-ONLY — deterministic (no dropout), no
    grads, no optimizer — plus the chunked 4999-way argmax head, i.e.
    what `deploy`-style inference of the trained model runs per mesh.
    Each timed call perturbs pos by a distinct scalar and reads back one
    device-summed scalar (the anti-dedup + barrier protocol of
    KERNEL_NOTES.md)."""
    import jax
    import jax.numpy as jnp

    from fieldconv_tpu.models import CorrespondenceNet

    n_classes = 4999
    Np = table.n_pad
    echo_pc = int(os.environ.get("SCALE_ECHO_PC", "8"))
    n_steps = int(os.environ.get("SCALE_STEPS", "3"))
    pos = jnp.asarray(rng.normal(size=(Np, 3)) * 0.1, jnp.float32)

    net = CorrespondenceNet(n_classes=n_classes, nf=32, n_des=12, n_bins=2,
                            band_limit=table.band_limit,
                            n_rings=table.n_rings,
                            echo_panel_chunk=echo_pc)
    comp_tbl = panel if compact is None else compact
    if compact is not None and \
            os.environ.get("SCALE_CONV_IMPL", "panel") == "compact":
        panel = compact
    params = jax.jit(
        lambda k, pn, cp: net.init(k, pos, None, pn, cp))(jax.random.key(0),
                                                          panel, comp_tbl)
    feat_net = net.clone(return_features=True)
    HCH = 8192                       # head row-chunk (run_full_model)

    @jax.jit
    def infer(params, pos, off, panel, comp_tbl):
        feats = feat_net.apply(params, pos + off, None, panel, comp_tbl,
                               deterministic=True)
        w = params["params"]["lin2"]["weight"]
        b = params["params"]["lin2"]["bias"]

        def chunk_pred(f_c):
            return jnp.argmax(f_c @ w.T + b, axis=-1)

        nc = -(-Np // HCH)
        while Np % nc:
            nc += 1
        preds = jax.lax.map(chunk_pred, feats.reshape(nc, Np // nc, -1))
        return jnp.sum(preds)        # one-scalar barrier; preds.reshape(Np)
                                     # is the serving output

    t0 = time.time()
    float(infer(params, pos, jnp.float32(0.0), panel, comp_tbl))
    print(json.dumps({"stage": "infer_compile+first",
                      "seconds": round(time.time() - t0, 1)}), flush=True)
    ts = []
    for i in range(n_steps):
        t0 = time.time()
        float(infer(params, pos, jnp.float32(1e-6 * (i + 1)), panel,
                    comp_tbl))
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(json.dumps({
        "stage": "full_model_infer_tpu", "n_pad": int(Np),
        "ms_per_inference": round(dt * 1e3, 1),
        "meshes_per_s": round(1.0 / dt, 2),
        "comp_layout": "compact" if compact is not None else "panel",
        "all_ms": [round(t * 1e3, 1) for t in ts]}), flush=True)


def run_decomp(panel, table, rng, compact=None):
    """Time the non-conv panel ops standalone at 163k (fwd+bwd): where the
    full-model step's time goes beyond the 17 x 74 ms convs."""
    import jax
    import jax.numpy as jnp

    from fieldconv_tpu.ops.echo import echo_panel
    from fieldconv_tpu.ops.trans_field import (trans_field_compact_contrib,
                                               trans_field_panel_contrib)

    Np = table.n_pad
    echo_pc = int(os.environ.get("SCALE_ECHO_PC", "8"))

    def timeit(name, f, *args):
        # panel rides as a jit ARG (closures inline the 5.5GB stencil)
        g = jax.jit(jax.grad(f, argnums=0))
        t0 = time.time()
        float(jnp.sum(g(*args)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(jnp.sum(g(*args)))
            ts.append(time.time() - t0)
        print(json.dumps({"stage": f"decomp_{name}",
                          "compile_s": round(compile_s, 1),
                          "ms_fwd_bwd": round(sorted(ts)[1] * 1e3, 1)}),
              flush=True)

    xs = jnp.asarray(rng.normal(size=(Np, 3)), jnp.float32)

    def lift_loss(x, pn):
        ang, mag = trans_field_panel_contrib(x, pn, lift_cols=(1, 2))
        return jnp.sum(ang * ang) + jnp.sum(mag * mag)

    timeit("lift", lift_loss, xs, panel)

    if compact is not None:
        def lift_loss_cp(x, cp):
            ang, mag = trans_field_compact_contrib(x, cp, lift_cols=(1, 2))
            return jnp.sum(ang * ang) + jnp.sum(mag * mag)

        timeit("lift_compact", lift_loss_cp, xs, compact)

    xe = jnp.asarray(np.stack([rng.normal(size=(Np, 12)),
                               rng.normal(size=(Np, 12))], -1), jnp.float32)

    if int(os.environ.get("SCALE_ECHO_XLA", "1")):
        def echo_loss(x, pn):
            h = echo_panel(x, pn, 2, panel_chunk=echo_pc)
            return jnp.sum(h * h)

        timeit(f"echo_pc{echo_pc}", echo_loss, xe, panel)

    from fieldconv_tpu.ops.pallas.echo_panel import echo_panel_pallas

    def echo_pl_loss(x, pn):
        h = echo_panel_pallas(x, pn, 2)
        return jnp.sum(h * h)

    timeit("echo_pallas", echo_pl_loss, xe, panel)

    if compact is not None:
        cc = int(os.environ.get("SCALE_ECHO_CC", "8"))

        def echo_cp_loss(x, cp):
            h = echo_panel_pallas(x, cp, 2, cc=cc)
            return jnp.sum(h * h)

        timeit(f"echo_compact_cc{cc}", echo_cp_loss, xe, compact)

    feats = jnp.asarray(rng.normal(size=(Np, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4999, 256)) * 0.01, jnp.float32)
    b = jnp.zeros((4999,), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4999, Np), jnp.int32)

    def head_loss(feats):
        def chunk_ce(args):
            f_c, lab_c = args
            logits = f_c @ w.T + b
            lp = jax.nn.log_softmax(logits)
            return -jnp.sum(jnp.take_along_axis(lp, lab_c[:, None], 1))
        nc = 21
        per = jax.lax.map(jax.checkpoint(chunk_ce),
                          (feats.reshape(nc, Np // nc, -1),
                           labels.reshape(nc, Np // nc)))
        return jnp.sum(per) / Np

    timeit("head", head_loss, feats)


def run_full_model(panel, table, edges_n, rng, compact=None):
    """The VERDICT r3 #1 config: the full correspondence-style net
    (correspondence.ipynb cell 8 — Lift(3→16) + 8×FCResNet(nf 32) + 4 meta
    residuals + ECHOBlock(n_des 12, n_bins 2) + dropout(.5) + 4999-way
    head) fwd+bwd+Adam at 163k vertices on the chip, every op through the
    panel-CSR layout.  The head is the big-vocab pattern: the model
    returns the 256-dim features (return_features) and the loss applies
    lin2 + CE row-chunked under jax.checkpoint, so the 3.3 GB logits
    never materialise."""
    import jax
    import jax.numpy as jnp
    import optax

    from fieldconv_tpu.models import CorrespondenceNet

    n_classes = 4999
    Np = table.n_pad
    echo_pc = int(os.environ.get("SCALE_ECHO_PC", "8"))
    n_steps = int(os.environ.get("SCALE_STEPS", "3"))
    pos = jnp.asarray(rng.normal(size=(Np, 3)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, n_classes, Np), jnp.int32)

    net = CorrespondenceNet(n_classes=n_classes, nf=32, n_des=12, n_bins=2,
                            band_limit=table.band_limit,
                            n_rings=table.n_rings,
                            echo_panel_chunk=echo_pc, remat_blocks=True)
    # lift + ECHO run on the compacted layout when available (3x less
    # dead-slot work); SCALE_CONV_IMPL=compact routes the convs through
    # it too (field_conv_banded dispatches on the table type)
    comp_tbl = panel if compact is None else compact
    if compact is not None and \
            os.environ.get("SCALE_CONV_IMPL", "panel") == "compact":
        panel = compact
    t0 = time.time()
    # NOTE: the panel table rides as a jit ARGUMENT everywhere (closures
    # inline the 5.5GB stencil as a stablehlo constant — module blowup)
    params = jax.jit(
        lambda k, pn, cp: net.init(k, pos, None, pn, cp))(jax.random.key(0),
                                                          panel, comp_tbl)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(json.dumps({"stage": "model_init", "params": n_params,
                      "seconds": round(time.time() - t0, 1)}), flush=True)

    feat_net = net.clone(return_features=True)
    opt = optax.adam(0.01)
    opt_state = jax.jit(opt.init)(params)
    HCH = 8192                       # head row-chunk: (HCH, 4999) ≈ 163 MB

    def loss_fn(params, key, pos, panel, comp_tbl):
        feats = feat_net.apply(params, pos, None, panel, comp_tbl,
                               deterministic=False, rngs={"dropout": key})
        w = params["params"]["lin2"]["weight"]
        b = params["params"]["lin2"]["bias"]

        def chunk_ce(args):
            f_c, lab_c = args
            logits = f_c @ w.T + b
            lp = jax.nn.log_softmax(logits)
            return -jnp.sum(jnp.take_along_axis(lp, lab_c[:, None], 1))

        nc = -(-Np // HCH)
        while Np % nc:               # smallest chunk count dividing N
            nc += 1
        per = jax.lax.map(jax.checkpoint(chunk_ce),
                          (feats.reshape(nc, Np // nc, -1),
                           labels.reshape(nc, Np // nc)))
        return jnp.sum(per) / Np

    @jax.jit
    def train_step(params, opt_state, key, pos, panel, comp_tbl):
        l, grads = jax.value_and_grad(loss_fn)(params, key, pos, panel,
                                               comp_tbl)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    key = jax.random.key(1)
    t0 = time.time()
    key, sub = jax.random.split(key)
    params, opt_state, l = train_step(params, opt_state, sub, pos, panel,
                                      comp_tbl)
    l0 = float(l)
    print(json.dumps({"stage": "model_compile+first",
                      "seconds": round(time.time() - t0, 1),
                      "loss": round(l0, 4)}), flush=True)
    ts = []
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        t0 = time.time()
        params, opt_state, l = train_step(params, opt_state, sub, pos,
                                          panel, comp_tbl)
        lf = float(l)              # readback = completion barrier
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2]
    n_convs = 17                   # 8 ResNet blocks x 2 + echo-block conv
    print(json.dumps({
        "stage": "full_model_step_tpu", "n_pad": int(Np),
        "net": "lift + 8xFCResNet(nf32) + 4 meta + ECHOBlock(12, nb2) "
               "+ chunked 4999-way head",
        "ms_per_step": round(dt * 1e3, 1),
        "conv_medges_per_s": round(n_convs * edges_n / dt / 1e6),
        "loss_first": round(l0, 4), "loss_last": round(lf, 4),
        "comp_layout": "compact" if compact is not None else "panel",
        "echo_panel_chunk": echo_pc}), flush=True)


if __name__ == "__main__":
    main()
