"""Command-line entry points replacing the reference's four notebooks.

    python -m fieldconv_tpu.train.cli --task classification --root data/SHREC11
    python -m fieldconv_tpu.train.cli --task segmentation  --root data/SHAPESEG
    python -m fieldconv_tpu.train.cli --task correspondence --root data/FAUSTRM
    python -m fieldconv_tpu.train.cli --task synthetic      # no data needed

The synthetic task trains the classification net on generated deformed
spheres — a data-free smoke/regression run.
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True,
                   choices=["classification", "segmentation",
                            "correspondence", "matching", "synthetic"])
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--banded-tb", type=int, default=None,
                   help="enable the banded Pallas conv path with this block size")
    p.add_argument("--layout", default=None,
                   choices=["auto", "banded", "panel"],
                   help="stencil layout (auto: panel above "
                        "--panel-threshold padded vertices)")
    p.add_argument("--panel-threshold", type=int, default=None)
    p.add_argument("--echo-impl", default=None,
                   choices=["onehot", "banded", "panel", "compact"],
                   help="ECHO implementation (presets pick the measured "
                        "optimum; 'compact' is the >=20k-vertex layout)")
    p.add_argument("--conv-impl", default=None,
                   choices=["panel", "compact"],
                   help="conv table in the pure-panel layout: 'compact' "
                        "runs the whole model off ONE CompactPanelTable "
                        "(5.7x less table memory, no block-panel build; "
                        "requires --echo-impl compact)")
    p.add_argument("--sample-n", type=int, default=None,
                   help="FPS sample count override (presets: SHAPESEG "
                        "1024, SHREC19 2048, others full mesh)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--export", default=None, metavar="DIR",
                   help="after training, write a deployable bundle "
                        "(config + params; see fieldconv_tpu.deploy) here")
    p.add_argument("--log", default=None, help="metrics JSONL path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="force jax platform (tpu/cpu)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(or env FIELDCONV_COORDINATOR)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # multi-host bootstrap (must precede any jax device use)
    from ..parallel.distributed import initialize

    initialize(args.coordinator, args.num_processes, args.process_id)

    from .config import PRESETS, ExperimentConfig
    from .loop import fit, fit_matching

    if args.task == "synthetic":
        config = ExperimentConfig(task="classification", band_limit=2,
                                  n_rings=4, nf=8, epochs=args.epochs or 10,
                                  checkpoint_dir=args.checkpoint_dir)
        records, n_classes = synthetic_records()
        # one held-out mesh per class
        test_recs = [records[0], records[-1]]
        train_recs = records[1:-1]
    else:
        config = PRESETS[args.task]
        overrides = {}
        if args.epochs:
            overrides["epochs"] = args.epochs
        if args.checkpoint_dir:
            overrides["checkpoint_dir"] = args.checkpoint_dir
        if args.layout:
            overrides["layout"] = args.layout
        if args.echo_impl:
            overrides["echo_impl"] = args.echo_impl
        if args.conv_impl:
            overrides["conv_impl"] = args.conv_impl
        if args.panel_threshold is not None:
            overrides["panel_threshold"] = args.panel_threshold
        if args.sample_n is not None:
            overrides["sample_n"] = args.sample_n
        if overrides:
            config = dataclasses.replace(config, **overrides)
        if not args.root:
            raise SystemExit("--root required for dataset tasks")
        if args.task == "matching":
            return run_matching(args, config)
        train_recs, test_recs, n_classes = load_dataset(args.task, args.root,
                                                        config)

    net, state, metric = fit(
        config, train_recs, test_recs, n_classes=n_classes,
        batch_size=args.batch_size, banded_tb=args.banded_tb,
        log_path=args.log, seed=args.seed,
    )
    if metric is not None:
        print(f"final eval metric: {metric:.4f}")
    if args.export:
        from ..deploy import export_bundle

        meta = {"task": config.task, "step": int(np.asarray(state.step))}
        if metric is not None:
            meta["final_metric"] = float(metric)
        export_bundle(args.export, config, state.params, n_classes, meta)
        print(f"exported bundle to {args.export}")
    return metric


def run_matching(args, config):
    from ..data import SHREC19
    from .loop import fit_matching

    ds = {w: SHREC19(args.root, which=w, n_samples=config.sample_n,
                     epsilon=config.epsilon) for w in range(4)}
    src = ds[0].records()
    tgt = ds[1].records()
    pps = [ds[1].pos_pairs(i) for i in range(len(ds[1]))]
    te_s, te_t = ds[2].records(), ds[3].records()
    te_pps = [ds[3].pos_pairs(i) for i in range(len(ds[3]))]
    net, state, rates = fit_matching(
        config, src, tgt, pps, banded_tb=args.banded_tb,
        log_path=args.log, seed=args.seed,
        test_source_records=te_s, test_target_records=te_t,
        test_pos_pairs_list=te_pps,
    )
    fp, fn = rates
    print(f"Test split: FP: {fp:.4f}, FN: {fn:.4f}, Err: {fp+fn:.4f}")
    if args.export:
        from ..deploy import export_bundle

        export_bundle(args.export, config, state.params, 1,
                      {"task": "matching", "fp": float(fp),
                       "fn": float(fn),
                       "step": int(np.asarray(state.step))})
        print(f"exported bundle to {args.export}")
    return fp + fn


def load_dataset(task, root, config):
    from ..data import FAUSTRM, SHAPESEG, SHREC11

    if task == "classification":
        tr = SHREC11(root, train=True, epsilon=config.epsilon)
        te = SHREC11(root, train=False, epsilon=config.epsilon)
        return tr.records(), te.records(), SHREC11.n_classes
    if task == "segmentation":
        tr = SHAPESEG(root, train=True, epsilon=config.epsilon,
                      sample_n=config.sample_n)
        te = SHAPESEG(root, train=False, epsilon=config.epsilon,
                      sample_n=config.sample_n)
        return tr.records(), te.records(), SHAPESEG.n_classes
    if task == "correspondence":
        tr = FAUSTRM(root, train=True, epsilon=config.epsilon)
        te = FAUSTRM(root, train=False, epsilon=config.epsilon)
        return tr.records(), te.records(), FAUSTRM.n_classes
    raise ValueError(task)


def synthetic_records(n_per_class=3, n_classes=2):
    from ..data.base import process_mesh
    from ..data.synthetic import icosphere

    rng = np.random.default_rng(0)
    records = []
    for c in range(n_classes):
        for k in range(n_per_class):
            v, f = icosphere(subdiv=2)
            v = v * np.array([1.0, 1.0, 1.0 + 0.6 * c])
            v = v + rng.normal(scale=0.01, size=v.shape)
            records.append(process_mesh(
                v, f, epsilon=0.35, sample_n=None,
                name=f"syn{c}_{k}", labels=np.int64(c),
            ))
    return records, n_classes


def console_main():
    """Console-script entry (pyproject [project.scripts]): main() returns
    the final metric for programmatic callers; an exit code must be 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
