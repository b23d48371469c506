"""Segmentation training-to-convergence on the real chip (VERDICT r2 #6).

8-class bump-band vertex labels on 10,242-vertex bumped spheres (the
tiled-precompute meshes from scripts/tiled_vs_exact.py — tiled VHM,
measured downstream-safe there): train on 3 meshes, hold out the 4th,
SHAPESEG-style recipe (LabelSmoothing 0.2, Adam 1e-2, batch 1).  Prints a
JSON line per eval; final line carries the held-out accuracy.
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
    import optax

    from scripts.tiled_vs_exact import bumped_sphere, precompute_pair
    from fieldconv_tpu.models import SegmentationNet
    from fieldconv_tpu.precomp.stencil import build_edge_table
    from fieldconv_tpu.train.trainer import stack_batch

    eps = 0.05
    B, R, NF = 2, 6, 16
    steps = int(os.environ.get("SEG_STEPS", "600"))
    meshes = []
    for i in range(4):
        v, f, y = bumped_sphere(seed=i)
        vn, edges, exact, tiled, t_e, t_t = precompute_pair(v, f, eps, f"m{i}")
        t = build_edge_table(edges, tiled.log_mag, tiled.log_ang,
                             tiled.weights, tiled.xp, len(vn), B, R, eps,
                             n_multiple=64)
        yp = np.full(t.n_pad, -1, np.int64)
        yp[:len(y)] = y
        pos = np.asarray(np.pad(vn, ((0, t.n_pad - len(vn)), (0, 0))),
                         np.float32)
        meshes.append(stack_batch([(pos, t, yp.astype(np.int32))]))
    train_b, test_b = meshes[:3], meshes[3:]

    net = SegmentationNet(n_classes=8, nf=NF, n_des=NF, n_bins=2,
                          band_limit=B, n_rings=R)
    b0 = train_b[0]
    params = jax.jit(net.init)(jax.random.key(0), b0.pos[0],
                               jax.tree.map(lambda x: x[0], b0.table))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, pos, table, labels):
        def loss_fn(p):
            logits = net.apply(p, pos, table)
            lab = labels.reshape(-1)
            valid = lab >= 0
            safe = jnp.where(valid, lab, 0)
            logp = jax.nn.log_softmax(logits, -1)
            conf, off = 0.8, 0.2 / 7            # LabelSmoothing 0.2
            onehot = jax.nn.one_hot(safe, 8)
            dist = onehot * (conf - off) + off
            nll = jnp.sum(-dist * logp, -1)
            return jnp.sum(jnp.where(valid, nll, 0)) / jnp.maximum(
                jnp.sum(valid), 1)

        l, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state2 = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state2, l

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

    rng = np.random.default_rng(0)
    t0 = time.time()
    for s in range(steps):
        b = train_b[rng.integers(len(train_b))]
        params, opt_state, l = step(params, opt_state, b.pos[0],
                                    jax.tree.map(lambda x: x[0], b.table),
                                    b.labels[0])
        if s % 100 == 0 or s == steps - 1:
            print(json.dumps({"step": s, "loss": round(float(l), 4)}),
                  flush=True)
    acc_tr = accuracy(params, train_b)
    acc_te = accuracy(params, test_b)
    print(json.dumps({
        "task": "segmentation_convergence_10k",
        "n_vertices": 10242, "train_meshes": 3, "test_meshes": 1,
        "steps": steps, "train_accuracy": round(acc_tr, 4),
        "heldout_accuracy": round(acc_te, 4),
        "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
