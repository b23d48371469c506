"""Training-to-convergence on the chip: a SHREC11-scale synthetic stand-in.

Real SHREC11 archives are unobtainable in this environment, so this builds
the closest obtainable stand-in for the >=95%-accuracy north star
(classification.ipynb cell 15): 10 classes of deformed spheres at SHREC11's
vertex scale (~642 v, MeshCNN remeshes are ~600), 10 train + 2 test meshes
per class (the reference's split10 regime), trained with the SHREC11 recipe
— B=2, R=6, nf=32, eps=0.2, Adam 0.01, random +/-45deg rotations + 0.85-1.15
scale augmentation, 30 epochs, batch_size 1 (classification.ipynb cells
3-11) — through the banded Pallas path on the real TPU.

Class signal: radial bump fields of class-dependent angular frequency and
amplitude tier, randomly rotated per mesh — rotation augmentation means the
net must learn rotation-robust geometry, not axis-aligned shortcuts.

Writes metrics JSONL (loss curve + edges/s) and prints per-epoch eval; a
mid-run checkpoint exercises resume: run once with SYNTH_EPOCHS=15 and again
with 30 and the second run restores from step 1500.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def make_records(n_classes=10, n_train=10, n_test=2, subdiv=3, seed=0,
                 cache="/tmp/synth_shrec_records_v4"):
    from fieldconv_tpu.data.base import process_mesh
    from fieldconv_tpu.data.synthetic import icosphere

    try:
        import pickle

        with open(f"{cache}_{n_classes}_{n_train}_{n_test}_{subdiv}.pkl",
                  "rb") as f:
            return pickle.load(f)
    except OSError:
        pass

    rng = np.random.default_rng(seed)
    v0, f0 = icosphere(subdiv=subdiv)
    train, test = [], []
    t0 = time.time()
    for c in range(n_classes):
        # classes differ in GROSS geometry (like SHREC11's categories):
        # an ellipsoid stretch ladder, with frequency bumps as texture.
        # Probed alternatives that fail: bump-only classes keep the
        # magnitude-pooled logits nearly constant across meshes at init
        # (measured: identical loss/|grad| to 4 digits on 20 meshes), and
        # a 10-way softmax never escapes chance in 10k batch-1 steps
        # while 2-class and 5-class controls descend.
        freq = 2 + (c % 5)              # bump texture frequency
        amp = 0.10
        stretch = 0.4 + 0.25 * c        # gross shape: z-axis ratio ladder
        for k in range(n_train + n_test):
            # class-specific radial field around a random axis
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            ca = v0 @ axis
            az = np.arctan2(v0[:, 1], v0[:, 0])
            r = 1.0 + amp * np.cos(freq * np.arccos(np.clip(ca, -1, 1))) \
                * np.cos(freq * az)
            v = v0 * r[:, None]
            v = v * np.array([1.0, 1.0, stretch])
            v = v + rng.normal(scale=0.002, size=v.shape)
            rec = process_mesh(v, f0, epsilon=0.2, sample_n=None,
                               name=f"c{c}_{k}", labels=np.int64(c))
            (train if k < n_train else test).append(rec)
    print(f"precompute: {len(train)+len(test)} meshes in "
          f"{time.time()-t0:.0f}s", flush=True)
    try:
        import pickle

        with open(f"{cache}_{n_classes}_{n_train}_{n_test}_{subdiv}.pkl",
                  "wb") as f:
            pickle.dump((train, test), f)
    except OSError:
        pass
    return train, test


def main():
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import fit

    epochs = int(os.environ.get("SYNTH_EPOCHS", "30"))
    ckpt_dir = os.environ.get("SYNTH_CKPT", "/tmp/synth_shrec_ckpt")
    log_path = os.environ.get("SYNTH_LOG", "/tmp/synth_shrec_metrics.jsonl")
    tb = int(os.environ.get("SYNTH_TB", "128"))

    train, test = make_records()
    # SHREC11 recipe (classification.ipynb cells 3,10,15; config presets 6b)
    config = ExperimentConfig(
        task="classification", band_limit=2, n_rings=6, nf=32, epsilon=0.2,
        epochs=epochs, lr=0.01, lr_decay_epoch=60, lr_decayed=0.001,
        checkpoint_dir=ckpt_dir, checkpoint_every=10,
        d_chunk=64,   # neighbor bucket here is 192 slots (eps 0.2 spheres)
    )
    t0 = time.time()
    eval_every = int(os.environ.get("SYNTH_EVAL_EVERY", "0")) or None
    net, state, metric = fit(config, train, test, n_classes=10,
                             banded_tb=tb, log_path=log_path,
                             eval_every=eval_every, seed=0)
    wall = time.time() - t0
    print(json.dumps({
        "task": "synthetic_shrec11_standin", "n_classes": 10,
        "train_meshes": len(train), "test_meshes": len(test),
        "epochs": epochs, "final_eval_accuracy": round(float(metric), 4),
        "wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
