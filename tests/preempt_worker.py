"""Subprocess worker for the preemption kill+resume test (SURVEY.md §5.3).

Usage: python preempt_worker.py <ckpt_dir> <epochs>

Trains the tiny synthetic classification task with checkpoint_every=1
epoch; the test SIGKILLs run 1 mid-training (a simulated preemption) and
run 2 must resume from the last finalized checkpoint rather than step 0.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_records(rng, n=2):
    from fieldconv_tpu.data.base import MeshRecord

    recs = []
    for m in range(n):
        N = 24
        edges = []
        for i in range(N):
            for j in rng.choice(N, size=4, replace=False):
                edges.append((j, i))
        edges = np.asarray(edges, np.int64)
        E = len(edges)
        ang = rng.uniform(-np.pi, np.pi, E)
        recs.append(MeshRecord(
            name=f"m{m}",
            pos=rng.normal(size=(N, 3)).astype(np.float32),
            supp_edges=edges,
            log_mag=rng.uniform(0.0, 0.3, E).astype(np.float32),
            log_ang=rng.uniform(-np.pi, np.pi, E).astype(np.float32),
            xp=np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32),
            weights=rng.uniform(0.1, 1.0, N).astype(np.float32),
            labels=np.asarray(m % 2),
            epsilon=0.5,
        ))
    return recs


def main():
    ckpt_dir, epochs = sys.argv[1], int(sys.argv[2])
    from fieldconv_tpu.train.config import ExperimentConfig
    from fieldconv_tpu.train.loop import fit

    config = ExperimentConfig(
        task="classification", band_limit=1, n_rings=2, nf=4, epsilon=0.5,
        epochs=epochs, checkpoint_dir=ckpt_dir, checkpoint_every=1,
        log_every=1)
    recs = make_records(np.random.default_rng(0))
    fit(config, recs, n_classes=2, batch_size=1)
    print("FINISHED", flush=True)


if __name__ == "__main__":
    main()
