"""Training demonstration at the 100k north-star scale (BASELINE configs[4]).

Trains the FULL correspondence-style network (Lift + 8×FCResNet(nf 32) +
4 meta-residuals + ECHOBlock(n_des 12, n_bins 2) + dropout + 4999-way
head) at 163,842 vertices on ONE v5e chip, every op through the
panel-CSR layout, on a LEARNABLE stand-in for the dense-correspondence
task: each vertex's label is its template id bucket (4999 classes laid
out over the kd-ordered surface), so the net must map geometry →
template coordinates exactly as the FAUST task does (the real archives
are unobtainable here; correspondence.ipynb cell 8/10 recipe: Adam
lr 0.01, CE, dropout .5).  The head is applied row-chunked under
jax.checkpoint; ResNet blocks rematerialise.

Writes one JSON line per log interval (step, loss, train-acc on a fixed
8192-row probe slice) to stdout and docs/TRAIN_100K_r4.jsonl.

Env: T100K_STEPS (150), T100K_LOG (10), T100K_BF16 (1), SCALE_SUBDIV(7),
SCALE_CACHE as scale_100k.py.
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
    from fieldconv_tpu.precomp.banded import (build_panel_table,
                                              cast_panel_sten, kd_order,
                                              reorder_precompute)
    from fieldconv_tpu.precomp.stencil import build_edge_table

    subdiv = int(os.environ.get("SCALE_SUBDIV", "7"))
    TB = 128
    n_steps = int(os.environ.get("T100K_STEPS", "150"))
    log_every = int(os.environ.get("T100K_LOG", "10"))
    v, f = icosphere(subdiv=subdiv)
    v = normalize_area(v, f)
    N = len(v)
    eps = float(np.sqrt(64 / (np.pi * N)))
    edges = radius_graph(v, eps)

    mesh = TriMesh(v, f)
    cache = os.environ.get("SCALE_CACHE", "/tmp/scale100k_cache.npz")
    if cache and os.path.exists(cache):
        z = np.load(cache)
        lm, la, xpc, w = z["lm"], z["la"], z["xp"], z["w"]
    else:
        pre = compute_log_xport(mesh, np.arange(N), edges, epsilon=eps)
        lm, la, xpc, w = pre.log_mag, pre.log_ang, pre.xp, pre.weights
        if cache:
            np.savez(cache, lm=lm, la=la, xp=xpc, w=w)

    B, R = 1, 3
    perm = kd_order(v, tb=TB)
    edges_r, w_r = reorder_precompute(perm, edges, w)
    table = build_edge_table(edges_r, lm, la, w_r, xpc,
                             N, B, R, eps, n_multiple=TB)
    # compacted-column layout for ECHO + lift (docs/KERNEL_NOTES.md r4:
    # echo 1,825 -> 411 ms at 163k with TBt=32); 0 falls back to panels.
    # T100K_CONV_IMPL=compact runs the CONVS off the same table too (the
    # memory/startup mode: no block-panel build, 0.97 GB total tables,
    # ~+10% step time at nf=32 — docs/SCALE_100K.json)
    ctb = int(os.environ.get("T100K_COMPACT_TB", "32"))
    if os.environ.get("T100K_CONV_IMPL", "panel") == "compact" and not ctb:
        raise SystemExit(
            "T100K_CONV_IMPL=compact needs the compact table; unset "
            "T100K_COMPACT_TB=0 (the all-compact route runs every op off "
            "that one table)")
    all_compact = (os.environ.get("T100K_CONV_IMPL", "panel") == "compact"
                   and ctb)
    panel = None
    if not all_compact:
        panel = build_panel_table(table, tb=TB, compressed=True)
        if os.environ.get("T100K_BF16", "1") != "0":
            panel = cast_panel_sten(panel)
    comp = panel
    if ctb:
        from fieldconv_tpu.precomp.banded import build_compact_panel_table

        comp = build_compact_panel_table(table, tb=ctb)
        if os.environ.get("T100K_BF16", "1") != "0":
            comp = cast_panel_sten(comp)
    if all_compact:
        panel = comp
    v_r = v[perm]
    print(json.dumps({"stage": "tables", "n_pad": table.n_pad,
                      "n_panels": int(panel.n_panels),
                      "all_compact": bool(all_compact),
                      "sten_gb": round(
                          panel.sten.size * panel.sten.dtype.itemsize / 1e9,
                          2)}), flush=True)

    import jax
    import jax.numpy as jnp
    import optax

    from fieldconv_tpu.models import CorrespondenceNet

    n_classes = 4999
    Np = table.n_pad
    pos = np.zeros((Np, 3), np.float32)
    pos[:N] = v_r
    pos = jnp.asarray(pos)
    # template-id labels: 4999 buckets over the kd-ordered surface (each
    # bucket a compact patch — the geometric structure the net must learn)
    lab = np.full(Np, -1, np.int32)
    lab[:N] = (np.arange(N, dtype=np.int64) * n_classes // N).astype(np.int32)
    labels = jnp.asarray(lab)

    net = CorrespondenceNet(n_classes=n_classes, nf=32, n_des=12, n_bins=2,
                            band_limit=B, n_rings=R, remat_blocks=True)
    params = jax.jit(
        lambda k, pn, cp: net.init(k, pos, None, pn, cp))(jax.random.key(0),
                                                          panel, comp)
    feat_net = net.clone(return_features=True)
    opt = optax.adam(0.01)
    opt_state = jax.jit(opt.init)(params)
    HCH = 8192

    def head_chunks(Np):
        nc = -(-Np // HCH)
        while Np % nc:
            nc += 1
        return nc

    NC = head_chunks(Np)

    def loss_fn(params, key, panel, comp):
        feats = feat_net.apply(params, pos, None, panel, comp,
                               deterministic=False, rngs={"dropout": key})
        wh = params["params"]["lin2"]["weight"]
        bh = params["params"]["lin2"]["bias"]

        def chunk_ce(args):
            f_c, lab_c = args
            logits = f_c @ wh.T + bh
            lp = jax.nn.log_softmax(logits)
            valid = lab_c >= 0
            safe = jnp.where(valid, lab_c, 0)
            per = -jnp.take_along_axis(lp, safe[:, None], 1)[:, 0]
            return jnp.sum(jnp.where(valid, per, 0.0)), jnp.sum(valid)

        tot, cnt = jax.lax.map(jax.checkpoint(chunk_ce),
                               (feats.reshape(NC, Np // NC, -1),
                                labels.reshape(NC, Np // NC)))
        return jnp.sum(tot) / jnp.maximum(jnp.sum(cnt), 1)

    @jax.jit
    def train_step(params, opt_state, key, panel, comp):
        l, grads = jax.value_and_grad(loss_fn)(params, key, panel, comp)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def probe_acc(params, panel, comp):
        """Train accuracy on a fixed 8192-row slice (eval mode)."""
        feats = feat_net.apply(params, pos, None, panel, comp)
        sl = feats[:HCH]
        logits = sl @ params["params"]["lin2"]["weight"].T \
            + params["params"]["lin2"]["bias"]
        pred = jnp.argmax(logits, axis=-1)
        valid = labels[:HCH] >= 0
        ok = jnp.sum(jnp.where(valid, pred == labels[:HCH], False))
        return ok / jnp.maximum(jnp.sum(valid), 1)

    out_path = os.environ.get("T100K_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "TRAIN_100K_r5.jsonl")
    fout = open(out_path, "a")
    # tag the run so one file never silently concatenates two configs
    fout.write(json.dumps({
        "run": {"conv_impl": os.environ.get("T100K_CONV_IMPL", "panel"),
                "compact_tb": ctb, "steps": n_steps,
                "bf16": os.environ.get("T100K_BF16", "1")}}) + "\n")
    fout.flush()
    key = jax.random.key(1)
    t_start = time.time()
    for step in range(n_steps):
        key, sub = jax.random.split(key)
        t0 = time.time()
        params, opt_state, l = train_step(params, opt_state, sub, panel,
                                          comp)
        lf = float(l)
        if step % log_every == 0 or step == n_steps - 1:
            acc = float(probe_acc(params, panel, comp))
            rec = {"step": step, "loss": round(lf, 4),
                   "probe_acc": round(acc, 4),
                   "ms_step": round((time.time() - t0) * 1e3)}
            print(json.dumps(rec), flush=True)
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
    done = {"stage": "done", "steps": n_steps,
            "total_s": round(time.time() - t_start, 1),
            "s_per_step_incl_probes": round(
                (time.time() - t_start) / n_steps, 2)}
    print(json.dumps(done), flush=True)
    fout.write(json.dumps(done) + "\n")
    fout.close()


if __name__ == "__main__":
    main()
