"""Training orchestration: the CLI replacement for the reference notebooks.

Builds compile buckets over the dataset records, stacks same-bucket meshes
into batches, runs the jitted train step with on-device augmentation, logs
metrics, checkpoints, and evaluates with the task's reference metric.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.base import FieldConvDataset, MeshRecord, shared_bucket
from ..models import (
    ClassificationNet,
    CorrespondenceNet,
    MatchingNet,
    SegmentationNet,
)
from . import evaluate
from .checkpoint import CheckpointManager
from .config import ExperimentConfig
from .metrics import MetricsLogger
from .trainer import (
    MeshBatch,
    TrainState,
    make_optimizer,
    make_train_step,
    stack_batch,
)


def build_model(config: ExperimentConfig, n_classes: int):
    kw = dict(band_limit=config.band_limit, n_rings=config.n_rings,
              ftype=config.ftype, d_chunk=config.d_chunk)
    if config.task == "classification":
        return ClassificationNet(n_classes=n_classes, nf=config.nf, **kw)
    if config.task == "segmentation":
        return SegmentationNet(n_classes=n_classes, nf=config.nf,
                               n_des=config.n_des or config.nf,
                               n_bins=config.n_bins, **kw)
    if config.task == "correspondence":
        return CorrespondenceNet(n_classes=n_classes, nf=config.nf,
                                 n_des=config.n_des or 12,
                                 n_bins=config.n_bins, **kw)
    if config.task == "matching":
        return MatchingNet(nf=config.nf, **kw)
    raise ValueError(config.task)


def make_batches(records: List[MeshRecord], config: ExperimentConfig,
                 batch_size: int = 1, banded_tb: Optional[int] = None,
                 n_pad=None, d_slots=None):
    """Group records into same-bucket MeshBatches."""
    if n_pad is None or d_slots is None:
        n_pad, d_slots = shared_bucket(records)
    batches = []
    for lo in range(0, len(records), batch_size):
        group = records[lo:lo + batch_size]
        items = []
        for r in group:
            table = r.table(config.band_limit, config.n_rings,
                            n_pad=n_pad, d_slots=d_slots)
            items.append((r.padded_pos(n_pad), table, r.padded_labels(n_pad)))
        batches.append(stack_batch(items, banded_tb=banded_tb))
    return batches


def fit(
    config: ExperimentConfig,
    train_records: List[MeshRecord],
    test_records: Optional[List[MeshRecord]] = None,
    n_classes: int = 30,
    batch_size: int = 1,
    banded_tb: Optional[int] = None,
    log_path: Optional[str] = None,
    eval_every: Optional[int] = None,
    seed: int = 0,
):
    """Train per the config; returns (net, final TrainState, final metric)."""
    net = build_model(config, n_classes)
    all_records = train_records + (test_records or [])
    n_pad, d_slots = shared_bucket(all_records)
    train_batches = make_batches(train_records, config, batch_size,
                                 banded_tb, n_pad, d_slots)
    test_batches = (
        make_batches(test_records, config, batch_size, banded_tb, n_pad, d_slots)
        if test_records else []
    )

    steps_per_epoch = len(train_batches)
    opt = make_optimizer(config, steps_per_epoch)
    b0 = train_batches[0]
    params = jax.jit(net.init)(jax.random.key(seed), b0.pos[0],
                               jax.tree.map(lambda x: x[0], b0.table))
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    ckpt = None
    if config.checkpoint_dir:
        ckpt = CheckpointManager(config.checkpoint_dir)
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(np.asarray(state.step))}")

    step_fn = make_train_step(net, config, n_classes, opt)
    logger = MetricsLogger(log_path)
    key = jax.random.key(seed + 1)
    edges_per_batch = float(np.asarray(jnp.sum(b0.table.mask)))

    start_step = int(np.asarray(state.step))
    total_steps = config.epochs * steps_per_epoch
    order_rng = np.random.default_rng(seed + 2)

    step = start_step
    while step < total_steps:
        order = order_rng.permutation(len(train_batches))
        for bi in order:
            if step >= total_steps:
                break
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, train_batches[bi])
            logger.log({"loss": metrics["loss"]}, edges=edges_per_batch)
            step += 1
            if ckpt and config.checkpoint_every and \
                    step % (config.checkpoint_every * steps_per_epoch) == 0:
                ckpt.save(state)
        if eval_every and test_batches and \
                (step // steps_per_epoch) % eval_every == 0:
            m = evaluate_task(net, state.params, config, test_batches, n_classes)
            print(f"epoch {step // steps_per_epoch}: eval = {m:.4f}", flush=True)

    if ckpt:
        ckpt.save(state)
    final = (
        evaluate_task(net, state.params, config, test_batches, n_classes)
        if test_batches else None
    )
    logger.close()
    return net, state, final


def evaluate_task(net, params, config, test_batches, n_classes):
    if config.task == "classification":
        return evaluate.classification_accuracy(net, params, test_batches)
    if config.task == "segmentation":
        return evaluate.segmentation_accuracy(net, params, test_batches)
    if config.task == "correspondence":
        return evaluate.correspondence_loss(net, params, test_batches, n_classes)
    raise ValueError(f"use matching-specific evaluation for {config.task}")
