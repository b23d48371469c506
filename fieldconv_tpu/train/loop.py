"""Training orchestration: the CLI replacement for the reference notebooks.

Builds compile buckets over the dataset records, stacks same-bucket meshes
into batches, runs the jitted train step with on-device augmentation, logs
metrics, checkpoints, and evaluates with the task's reference metric.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.base import MeshRecord, shared_bucket
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
    TrainState,
    make_optimizer,
    make_train_step,
    stack_batch,
)


def build_model(config: ExperimentConfig, n_classes: int,
                axis_name: Optional[str] = None):
    kw = dict(band_limit=config.band_limit, n_rings=config.n_rings,
              ftype=config.ftype, d_chunk=config.d_chunk,
              lift_impl=config.lift_impl, axis_name=axis_name)
    if config.task == "classification":
        return ClassificationNet(n_classes=n_classes, nf=config.nf, **kw)
    if config.task == "segmentation":
        return SegmentationNet(n_classes=n_classes, nf=config.nf,
                               n_des=config.n_des or config.nf,
                               n_bins=config.n_bins,
                               echo_impl=config.echo_impl, **kw)
    if config.task == "correspondence":
        return CorrespondenceNet(n_classes=n_classes, nf=config.nf,
                                 n_des=config.n_des or 12,
                                 n_bins=config.n_bins,
                                 echo_impl=config.echo_impl, **kw)
    if config.task == "matching":
        return MatchingNet(nf=config.nf, **kw)
    raise ValueError(config.task)


def resolve_layout(config: ExperimentConfig, n_pad: int) -> str:
    """'banded' or 'panel' per config.layout ('auto': panel above the
    threshold — the dense band window is O(N^1.5) memory and cannot exist
    at 100k vertices, docs/KERNEL_NOTES.md)."""
    if config.layout != "auto":
        return config.layout
    return "panel" if n_pad > config.panel_threshold else "banded"


def make_batches(records: List[MeshRecord], config: ExperimentConfig,
                 batch_size: int = 1, banded_tb: Optional[int] = None,
                 n_pad=None, d_slots=None,
                 host_tables: Optional[bool] = None):
    """Group records into same-bucket MeshBatches.

    banded_tb also serves as the panel target-block size when the layout
    resolves to 'panel' (config.layout / panel_threshold).

    host_tables: keep the per-mesh stencil tables on the HOST (CPU
    backend) instead of committing them to the accelerator at build time
    — the jitted step then streams each batch H2D per call.  None (auto)
    switches to host residency when the estimated total exceeds
    FIT_TABLE_BUDGET_GB (default 4)."""
    echo_task = config.task in ("segmentation", "correspondence")
    if config.echo_impl in ("panel", "compact") and echo_task \
            and banded_tb is None:
        # graceful: the panel/compact ECHO kernels need block tables;
        # without a block size the XLA one-hot path is the correct
        # fallback (the presets default to the measured optimum)
        import warnings

        warnings.warn(f"echo_impl={config.echo_impl!r} needs banded_tb; "
                      "falling back to the XLA one-hot ECHO for this run")
        config = dataclasses.replace(config, echo_impl="onehot")
    if config.conv_impl == "compact" and not (
            config.echo_impl == "compact" and echo_task):
        # the all-compact conv rides the ECHO/lift CompactPanelTable; when
        # that table isn't built (non-ECHO task, or echo_impl != 'compact',
        # incl. the onehot fallback above) the flag would silently do
        # nothing — say so instead of quietly running block panels
        import warnings

        warnings.warn(
            "conv_impl='compact' requires echo_impl='compact' on an ECHO "
            f"task (task={config.task!r}, echo_impl={config.echo_impl!r}); "
            "the convs will run on the block-panel/banded layout")
    if config.echo_impl == "banded" and echo_task and banded_tb is None:
        raise ValueError(
            "config.echo_impl='banded' requires banded_tb: the gather-free "
            "ECHO path runs on compressed banded tables built per "
            "target-block size (pass banded_tb=, or use echo_impl='onehot')")
    if n_pad is None or d_slots is None:
        n_pad, d_slots = shared_bucket(records)
    panel = (banded_tb is not None
             and resolve_layout(config, n_pad) == "panel")
    # mixed mode: banded convs + panel/compact ECHO/lift (the
    # measured-optimal routing at production shapes, KERNEL_NOTES.md r4)
    echo_panel = (banded_tb is not None and not panel
                  and config.echo_impl == "panel" and echo_task)
    echo_compact = (banded_tb is not None and not panel
                    and config.echo_impl == "compact" and echo_task)
    # compressed tables feed the banded ECHO path and/or the gather-free lift
    need_comp = (banded_tb is not None and not panel and not echo_panel
                 and not echo_compact and (
                     (config.echo_impl == "banded" and echo_task)
                     or config.lift_impl == "banded"))
    def build_group(group):
        items = []
        for r in group:
            table = r.table(config.band_limit, config.n_rings,
                            n_pad=n_pad, d_slots=d_slots)
            items.append((r.padded_pos(n_pad, center=config.center), table,
                          r.padded_labels(n_pad)))
        if panel:
            # pure-panel layout: echo_impl='compact' pairs the block
            # PanelTables (convs) with per-mesh CompactPanelTables
            # (ECHO + lift) — the measured >=20k-vertex optimum
            return stack_batch(
                items, panel_tb=banded_tb,
                echo_compact=(config.echo_impl == "compact"
                              and echo_task),
                conv_compact=(config.conv_impl == "compact"
                              and config.echo_impl == "compact"
                              and echo_task))
        return stack_batch(items, banded_tb=banded_tb,
                           echo_banded=need_comp,
                           echo_panel=echo_panel,
                           echo_compact=echo_compact)

    groups = [records[lo:lo + batch_size]
              for lo in range(0, len(records), batch_size)]
    first = build_group(groups[0])
    if host_tables is None:
        # residency budget: per-mesh block tables are ~44 MB at the
        # ~600-vertex SHREC11 regime, and committing EVERY mesh's table
        # to the accelerator at build time exhausts a 16 GB chip near
        # ~350 meshes (measured on the full-dress rehearsal).  Above the
        # budget the tables are built on the host CPU backend instead;
        # the jitted step streams each batch's arrays H2D per call.
        import os

        budget = float(os.environ.get("FIT_TABLE_BUDGET_GB", "4")) * 1e9
        per = sum(a.size * a.dtype.itemsize
                  for a in jax.tree.leaves(first)
                  if hasattr(a, "size"))
        host_tables = len(groups) > 1 and per * len(groups) > budget
    if host_tables:
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            return [build_group(g) for g in groups]
    return [first] + [build_group(g) for g in groups[1:]]


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

    # Losses stay on device (the non-finite guard runs inside the jitted
    # step, trainer._guarded_update); the host reads them back in chunks of
    # config.log_every so logging never serialises dispatch.
    import time as _time
    pending: list = []   # (step, issue timestamp, device loss)

    def flush():
        if not pending:
            return
        vals = np.asarray(jnp.stack([l for _, _, l in pending]))
        for (s, t, _), v in zip(pending, vals):
            v = float(v)
            if not np.isfinite(v):
                print(f"WARNING: non-finite loss at step {s}; the update "
                      "was skipped on device", flush=True)
            logger.log({"loss": v}, edges=edges_per_batch, t=t)
        pending.clear()

    step = start_step
    while step < total_steps:
        order = order_rng.permutation(len(train_batches))
        for bi in order:
            if step >= total_steps:
                break
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, train_batches[bi])
            pending.append((step, _time.perf_counter(), metrics["loss"]))
            step += 1
            if len(pending) >= config.log_every:
                flush()
            if ckpt and config.checkpoint_every and \
                    step % (config.checkpoint_every * steps_per_epoch) == 0:
                ckpt.save(state)
        if eval_every and test_batches and \
                (step // steps_per_epoch) % eval_every == 0:
            flush()
            m = evaluate_task(net, state.params, config, test_batches, n_classes)
            print(f"epoch {step // steps_per_epoch}: eval = {m:.4f}", flush=True)
    flush()

    if ckpt:
        ckpt.save(state)
    final = (
        evaluate_task(net, state.params, config, test_batches, n_classes)
        if test_batches else None
    )
    logger.close()
    return net, state, final


def fit_matching(
    config: ExperimentConfig,
    source_records,
    target_records,
    pos_pairs_list,
    batch_size: int = 1,
    banded_tb: Optional[int] = None,
    log_path: Optional[str] = None,
    seed: int = 0,
    test_source_records=None,
    test_target_records=None,
    test_pos_pairs_list=None,
    eval_every: Optional[int] = None,
):
    """Siamese training (feature_matching.ipynb cells 12-13): per step draw
    n_pairs positive and n_pairs null correspondences per mesh pair.

    Supports checkpoint/resume (config.checkpoint_dir) like fit(); the
    per-step pair draws are keyed on (seed, step) so a resumed run replays
    the same stream.  eval_every (epochs) reports FP/FN rates over the test
    pairs (feature_matching.ipynb cell 15) when test records are given.
    """
    from ..data.shrec19 import sample_null_pairs
    from .trainer import make_twin_train_step

    net = build_model(config, n_classes=0)
    all_records = source_records + target_records + \
        (test_source_records or []) + (test_target_records or [])
    n_pad, d_slots = shared_bucket(all_records)

    need_comp = banded_tb is not None and config.lift_impl == "banded"

    def to_batch(rec):
        table = rec.table(config.band_limit, config.n_rings,
                          n_pad=n_pad, d_slots=d_slots)
        return stack_batch(
            [(rec.padded_pos(n_pad, center=config.center), table,
              rec.padded_labels(n_pad))],
            banded_tb=banded_tb, echo_banded=need_comp,
        )

    batches_s = [to_batch(r) for r in source_records]
    batches_t = [to_batch(r) for r in target_records]

    steps_per_epoch = len(batches_s)
    opt = make_optimizer(config, steps_per_epoch)
    b0 = batches_s[0]
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

    step_fn = make_twin_train_step(net, config, opt)
    logger = MetricsLogger(log_path)
    base_key = jax.random.key(seed + 1)

    import time as _time
    pending: list = []

    def flush():
        if not pending:
            return
        vals = np.asarray(jnp.stack([l for _, _, l in pending]))
        for (s, t, _), v in zip(pending, vals):
            v = float(v)
            if not np.isfinite(v):
                print(f"WARNING: non-finite loss at step {s}; the update "
                      "was skipped on device", flush=True)
            logger.log({"loss": v}, t=t)
        pending.clear()

    def eval_rates():
        from . import evaluate
        from ..data.shrec19 import null_pairs as full_null_pairs
        pair_batches = []
        for i in range(len(test_source_records)):
            pp = test_pos_pairs_list[i]
            nulls = full_null_pairs(pp, test_target_records[i].n_samples)
            pair_batches.append((to_batch(test_source_records[i]),
                                 to_batch(test_target_records[i]), pp, nulls))
        return evaluate.matching_rates(net, state.params, pair_batches,
                                       mu=config.twin_mu)

    n_pairs = config.n_pairs
    have_test = (test_source_records and test_target_records
                 and test_pos_pairs_list is not None)
    start_step = int(np.asarray(state.step))
    total_steps = config.epochs * steps_per_epoch
    step = start_step
    while step < total_steps:
        # deterministic-by-step draw streams so resume replays the schedule
        epoch = step // steps_per_epoch
        order = np.random.default_rng((seed + 2, epoch)).permutation(
            steps_per_epoch)
        for k in range(step % steps_per_epoch, steps_per_epoch):
            i = order[k]
            np_rng = np.random.default_rng((seed + 3, step))
            pp_all = pos_pairs_list[i]
            sel = np_rng.permutation(len(pp_all))[:n_pairs]
            pp = pp_all[sel]
            if len(pp) < n_pairs:   # pad by repetition to keep shapes static
                reps = np.resize(np.arange(len(pp)), n_pairs)
                pp = pp[reps]
            n_samples = source_records[i].n_samples
            nulls = sample_null_pairs(np_rng, pp_all, n_samples, n_pairs)
            sub = jax.random.fold_in(base_key, step)
            state, metrics = step_fn(
                state, sub, batches_s[i], batches_t[i],
                jnp.asarray(pp)[None], jnp.asarray(nulls)[None],
            )
            pending.append((step, _time.perf_counter(), metrics["loss"]))
            step += 1
            if len(pending) >= config.log_every:
                flush()
            if ckpt and config.checkpoint_every and \
                    step % (config.checkpoint_every * steps_per_epoch) == 0:
                ckpt.save(state)
        if eval_every and have_test and \
                (step // steps_per_epoch) % eval_every == 0:
            flush()
            fp, fn = eval_rates()
            print(f"epoch {step // steps_per_epoch}: "
                  f"FP={fp:.4f} FN={fn:.4f}", flush=True)
    flush()
    if ckpt:
        ckpt.save(state)
    final = eval_rates() if have_test else None
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
