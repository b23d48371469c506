"""Quantify the tiled-VHM log-map truncation error DOWNSTREAM (VERDICT r2 #7).

The tiled patch-local precompute (precomp/tiled.py) carries p99 ~1.4e-2
relative log-map / 2.5e-2 rad angle error vs the exact global solves
(docs/KERNEL_NOTES.md).  This experiment pins what that does to training:

  1. 4 bumped-sphere meshes at 10,242 vertices, per-vertex 8-class labels
     from the bump field; identical support graphs for both precomputes.
  2. compute_log_xport with mode="global" (exact) and mode="tiled" (forced
     — auto only engages above 20k, but the patch-margin truncation is the
     same mechanism; the 1.4e-2 p99 figure was itself measured on a 10k
     sphere).
  3. Train the segmentation net on one stencil set, evaluate on both;
     repeat with the roles swapped.  Report stencil-level error, output
     relative error under swapped stencils, and the accuracy deltas.

Prints one JSON line per result row (table lands in KERNEL_NOTES).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def bumped_sphere(seed, subdiv=5):
    from fieldconv_tpu.data.synthetic import icosphere

    rng = np.random.default_rng(seed)
    v0, f0 = icosphere(subdiv=subdiv)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ca = v0 @ axis
    az = np.arctan2(v0[:, 1], v0[:, 0])
    bump = np.cos(3 * np.arccos(np.clip(ca, -1, 1))) * np.cos(3 * az)
    v = v0 * (1.0 + 0.15 * bump)[:, None]
    labels = np.clip(((bump + 1) * 4).astype(np.int64), 0, 7)
    return v, f0, labels


def precompute_pair(v, f, eps, cache_tag):
    """(exact, tiled) PrecomputeResults over the SAME support graph."""
    import pickle

    from fieldconv_tpu.geometry.mesh import TriMesh
    from fieldconv_tpu.geometry.sampling import radius_graph
    from fieldconv_tpu.precomp.pipeline import (compute_log_xport,
                                                normalize_area)

    path = f"/tmp/tiled_vs_exact_{cache_tag}.pkl"
    try:
        with open(path, "rb") as fh:
            return pickle.load(fh)
    except OSError:
        pass
    v = normalize_area(v, f)
    edges = radius_graph(v, eps)
    mesh = TriMesh(v, f)
    si = np.arange(len(v))
    t0 = time.time()
    exact = compute_log_xport(mesh, si, edges, mode="global")
    t_exact = time.time() - t0
    t0 = time.time()
    tiled = compute_log_xport(mesh, si, edges, mode="tiled", epsilon=eps)
    t_tiled = time.time() - t0
    out = (v, edges, exact, tiled, t_exact, t_tiled)
    with open(path, "wb") as fh:
        pickle.dump(out, fh)
    return out


def main():
    import jax

    from fieldconv_tpu.models import SegmentationNet
    from fieldconv_tpu.nn.losses import label_smoothing_loss
    from fieldconv_tpu.precomp.stencil import build_edge_table
    from fieldconv_tpu.train.trainer import (TrainState, make_optimizer,
                                             stack_batch)
    import jax.numpy as jnp
    import optax

    n_mesh = int(os.environ.get("TVE_MESHES", "4"))
    eps = 0.05
    B, R, NFC = 2, 6, 16
    meshes = []
    for i in range(n_mesh):
        v, f, y = bumped_sphere(seed=i)
        vn, edges, exact, tiled, t_e, t_t = precompute_pair(v, f, eps, f"m{i}")
        print(json.dumps({"mesh": i, "n_vertices": len(vn),
                          "n_edges": len(edges),
                          "exact_s": round(t_e, 1),
                          "tiled_s": round(t_t, 1)}), flush=True)
        # stencil-level deltas
        rel_r = np.abs(tiled.log_mag - exact.log_mag) / np.maximum(
            np.abs(exact.log_mag), 1e-9)
        dang = np.abs(np.angle(np.exp(1j * (tiled.log_ang - exact.log_ang))))
        print(json.dumps({"mesh": i,
                          "logmag_rel_p50": round(float(np.median(rel_r)), 5),
                          "logmag_rel_p99": round(float(np.percentile(rel_r, 99)), 5),
                          "ang_rad_p99": round(float(np.percentile(dang, 99)), 5)}),
              flush=True)
        meshes.append((vn, edges, exact, tiled, y))

    def table_of(vn, edges, pre):
        return build_edge_table(edges, pre.log_mag, pre.log_ang, pre.weights,
                                pre.xp, len(vn), B, R, eps, n_multiple=64)

    def batches(which):
        out = []
        for vn, edges, exact, tiled, y in meshes:
            pre = exact if which == "exact" else tiled
            t = table_of(vn, edges, pre)
            yp = np.full(t.n_pad, -1, np.int64)
            yp[:len(y)] = y
            out.append(stack_batch([(np.asarray(
                np.pad(vn, ((0, t.n_pad - len(vn)), (0, 0))), np.float32),
                t, yp.astype(np.int32))]))
        return out

    b_exact, b_tiled = batches("exact"), batches("tiled")
    net = SegmentationNet(n_classes=8, nf=NFC, n_des=NFC, n_bins=2,
                          band_limit=B, n_rings=R)

    def accuracy(params, bs):
        ok = tot = 0
        for b in bs:
            logits = net.apply(params, b.pos[0],
                               jax.tree.map(lambda x: x[0], b.table))
            pred = np.asarray(jnp.argmax(logits, -1))
            lab = np.asarray(b.labels[0])
            m = lab >= 0
            ok += int((pred[m] == lab[m]).sum())
            tot += int(m.sum())
        return ok / tot

    def train_on(bs, steps=120):
        opt = make_optimizer(
            __import__("fieldconv_tpu.train.config",
                       fromlist=["ExperimentConfig"]).ExperimentConfig(
                task="segmentation", band_limit=B, n_rings=R, nf=NFC,
                lr=0.01))
        b0 = bs[0]
        params = jax.jit(net.init)(jax.random.key(0), b0.pos[0],
                                   jax.tree.map(lambda x: x[0], b0.table))
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, pos, table, labels):
            def loss_fn(p):
                logits = net.apply(p, pos, table)
                lab = labels.reshape(-1)
                valid = lab >= 0
                safe = jnp.where(valid, lab, 0)
                logp = jax.nn.log_softmax(logits, -1)
                nll = -jnp.take_along_axis(logp, safe[:, None], -1)[:, 0]
                return jnp.sum(jnp.where(valid, nll, 0)) / jnp.maximum(
                    jnp.sum(valid), 1)

            l, g = jax.value_and_grad(loss_fn)(params)
            upd, opt_state2 = opt.update(g, opt_state)
            return optax.apply_updates(params, upd), opt_state2, l

        rng = np.random.default_rng(0)
        for s in range(steps):
            b = bs[rng.integers(len(bs))]
            params, opt_state, l = step(
                params, opt_state, b.pos[0],
                jax.tree.map(lambda x: x[0], b.table), b.labels[0])
        return params, float(l)

    for train_on_name, train_bs, eval_other in (
            ("exact", b_exact, b_tiled), ("tiled", b_tiled, b_exact)):
        params, final_loss = train_on(train_bs)
        acc_same = accuracy(params, train_bs)
        acc_other = accuracy(params, eval_other)
        # output relative error under swapped stencils
        b = train_bs[0]
        y1 = np.asarray(net.apply(params, b.pos[0],
                                  jax.tree.map(lambda x: x[0], b.table)))
        bo = eval_other[0]
        y2 = np.asarray(net.apply(params, bo.pos[0],
                                  jax.tree.map(lambda x: x[0], bo.table)))
        rel = float(np.linalg.norm(y2 - y1) / (np.linalg.norm(y1) + 1e-9))
        print(json.dumps({
            "trained_on": train_on_name, "final_loss": round(final_loss, 4),
            "acc_same_stencils": round(acc_same, 4),
            "acc_swapped_stencils": round(acc_other, 4),
            "logit_rel_err_swapped": round(rel, 5)}), flush=True)


if __name__ == "__main__":
    main()
