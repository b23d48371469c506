"""Full-dress SHREC11 convergence rehearsal on the chip (VERDICT r4 #6).

Builds a 30-class synthetic SHREC11.zip in the GENUINE archive layout at
the real ~600-vertex scale (tests/test_datasets._class_shape: a 6×5 grid
of ellipsoid axis ratios + bump texture — gross geometry, which the
magnitude-pooled head can separate), then runs the COMPLETE production
path — SHREC11._process (per-mesh VHM precompute) → artifact cache →
cli --task classification with the reference recipe (Adam 0.01, ±45°
rotation + 0.85-1.15 scale augmentation, batch 1) through the banded
Pallas kernels on the TPU — to a held-out 30-way accuracy.

Escaping the ln(30) plateau takes thousands of batch-1 steps (the
10-way curve docs/TRAIN_CLASS_r3_curve.jsonl was flat to ~step 300 and
converged by 10k), which is why this is a script on the chip, not a
CPU test: REHEARSE_EPOCHS (default 60) × 90 meshes ≈ 5.4k steps.

Env: REHEARSE_ROOT (/tmp/shrec11_dress642), REHEARSE_EPOCHS (60),
REHEARSE_TB (128: banded kernel block size), REHEARSE_SUBDIV (3).
"""
import json
import os
import sys
import time
import zipfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np


def main():
    from test_datasets import _class_shape, _obj_bytes
    from fieldconv_tpu.data.shrec11 import CLASS_NAMES
    from fieldconv_tpu.train import cli

    root = os.environ.get("REHEARSE_ROOT", "/tmp/shrec11_dress642x10")
    epochs = int(os.environ.get("REHEARSE_EPOCHS", "60"))
    tb = os.environ.get("REHEARSE_TB", "128")
    subdiv = int(os.environ.get("REHEARSE_SUBDIV", "3"))
    # the reference split10 regime: 10 train meshes per class
    # (datasets/SHREC11.py:115).  Per-class mesh count is decisive for the
    # 30-way plateau escape: 3/class stayed at ln(30) for 27k steps while
    # 6-way controls on the same data converged by step ~900 (measured
    # this round).
    n_train = int(os.environ.get("REHEARSE_NTRAIN", "10"))
    n_test = int(os.environ.get("REHEARSE_NTEST", "2"))
    rawdir = os.path.join(root, "raw")
    if not os.path.isdir(rawdir):
        os.makedirs(rawdir)
        rng = np.random.default_rng(0)
        with zipfile.ZipFile(os.path.join(rawdir, "SHREC11.zip"), "w") as z:
            for ci, cname in enumerate(CLASS_NAMES):
                for split, count in (("train", n_train), ("test", n_test)):
                    for k in range(count):
                        v, f = _class_shape(ci, rng, subdiv=subdiv)
                        z.writestr(f"SHREC11/{cname}/{split}/T{k}.obj",
                                   _obj_bytes(v, f))
        print(json.dumps({"stage": "archive", "classes": 30,
                          "train": 30 * n_train, "test": 30 * n_test}),
              flush=True)

    t0 = time.time()
    args = ["--task", "classification", "--root", root,
            "--epochs", str(epochs), "--seed", "0",
            "--log", os.path.join(root, "metrics.jsonl")]
    if tb:
        args += ["--banded-tb", tb]
    metric = cli.main(args)
    print(json.dumps({
        "stage": "done", "epochs": epochs,
        "held_out_accuracy": round(float(metric), 4),
        "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
