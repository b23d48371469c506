"""Serve an exported bundle from the command line.

    # predict raw mesh files (runs the offline precompute, then inference)
    python -m fieldconv_tpu.deploy.cli --bundle runs/shrec11 \
        --mesh alien1.off --mesh alien2.off --out preds.npz

    # predict a whole precomputed dataset split and report the task metric
    python -m fieldconv_tpu.deploy.cli --bundle runs/shrec11 \
        --root data/SHREC11 --split test

The reference has no equivalent — its inference is a notebook cell that
reuses the training session's in-memory model (classification.ipynb cell
13).  Here a bundle directory is the only input: the net is rebuilt from
the stored config, the forward is AOT-compiled per batch shape (warm-up is
reported), and outputs land in an .npz keyed by record name.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bundle", required=True, help="bundle directory "
                   "(train CLI --export, or deploy.export_bundle)")
    p.add_argument("--mesh", action="append", default=[],
                   help="raw mesh file (.obj/.off/.ply); repeatable")
    p.add_argument("--root", default=None,
                   help="precomputed dataset root (the training dataset "
                        "class inferred from the bundle's task)")
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--out", default=None,
                   help="write predictions to this .npz")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--banded-tb", type=int, default=None,
                   help="enable the Pallas banded/panel layouts with this "
                        "block size (default: XLA path)")
    p.add_argument("--platform", default=None,
                   help="force jax platform (tpu/cpu)")
    return p.parse_args(argv)


def _task_preproc(task, v, f, scale=None):
    """Per-task offline preprocessing, matching the training dataset
    classes exactly (a served mesh must see the same transform chain the
    training meshes did):

    - classification: NormalizeArea inside process_mesh (data/shrec11.py)
    - segmentation: NormalizeArea + trailing NormalizeAxes
      (data/shapeseg.py post_axes=True, segmentation.ipynb cell 6)
    - correspondence: per-mesh sqrt(surface-area) scaling WITHOUT the
      bbox centering — FAUSTRM scales manually and passes normalize=False
      (data/faustrm.py:57-59)
    - matching: like correspondence, except BOTH meshes of a (source,
      target) pair are scaled by the SOURCE's area (data/shrec19.py:
      104-107) — handled pairwise in records_from_meshes; `scale` here
      overrides the per-mesh area when given

    Returns (vertices, process_mesh kwargs)."""
    if task == "classification":
        return v, dict(normalize=True, post_axes=False)
    if task == "segmentation":
        return v, dict(normalize=True, post_axes=True)
    from ..geometry.mesh import TriMesh

    if scale is None:
        scale = np.sqrt(TriMesh(v, f).surface_area())
    return v / scale, dict(normalize=False, post_axes=False)


def records_from_meshes(paths, config):
    from ..data.base import process_mesh
    from ..data.meshio import read_obj, read_off, read_ply
    from ..geometry.mesh import TriMesh

    readers = {".obj": read_obj, ".off": read_off, ".ply": read_ply}
    if config.task == "matching" and len(paths) % 2:
        raise SystemExit(
            "matching serves (source, target) PAIRS: pass an even number "
            "of --mesh files (source1 target1 source2 target2 ...) — both "
            "meshes of a pair are scaled by the source's surface area, as "
            "in training (data/shrec19.py:104-107)")
    meshes = []
    for path in paths:
        ext = os.path.splitext(path)[1].lower()
        if ext not in readers:
            raise SystemExit(f"unsupported mesh format {ext!r}: {path}")
        v, f = readers[ext](path)
        meshes.append((np.asarray(v, np.float64), np.asarray(f, np.int64),
                       os.path.basename(path)))
    recs = []
    for i, (v, f, name) in enumerate(meshes):
        scale = None
        if config.task == "matching":
            vs, fs = meshes[i - i % 2][:2]   # the pair's SOURCE mesh
            scale = np.sqrt(TriMesh(vs, fs).surface_area())
        v, kw = _task_preproc(config.task, v, f, scale=scale)
        recs.append(process_mesh(
            v, f,
            epsilon=config.epsilon, sample_n=config.sample_n,
            name=name,
            labels=np.int64(-1),
            max_neighbors=config.max_neighbors,
            **kw,
        ))
    return recs


def records_from_root(root, split, config):
    from ..data import FAUSTRM, SHAPESEG, SHREC11, SHREC19

    train = split == "train"
    task = config.task
    if task == "classification":
        return SHREC11(root, train=train, epsilon=config.epsilon).records()
    if task == "segmentation":
        return SHAPESEG(root, train=train, epsilon=config.epsilon,
                        sample_n=config.sample_n).records()
    if task == "correspondence":
        return FAUSTRM(root, train=train, epsilon=config.epsilon).records()
    if task == "matching":
        which = 0 if train else 2
        return SHREC19(root, which=which, n_samples=config.sample_n,
                       epsilon=config.epsilon).records()
    raise SystemExit(f"unknown task {task!r} in bundle")


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from .predictor import Predictor

    pred = Predictor(args.bundle, batch_size=args.batch_size,
                     banded_tb=args.banded_tb)
    config = pred.config
    print(f"bundle: task={config.task} n_classes={pred.n_classes} "
          f"meta={pred.bundle.meta}")

    if args.mesh:
        records = records_from_meshes(args.mesh, config)
    elif args.root:
        records = records_from_root(args.root, args.split, config)
    else:
        raise SystemExit("provide --mesh file(s) or a dataset --root")

    batches = pred.make_batches(records)
    n_exe = pred.warmup(batches)
    print(f"warm-up: {n_exe} executable(s) for {len(batches)} batch(es)")
    outs = pred.predict(records, batches=batches)

    # task metric when ground truth is present
    labeled = [(r, o) for r, o in zip(records, outs)
               if np.any(np.asarray(r.labels) >= 0)]
    if labeled and config.task in ("classification", "segmentation",
                                   "correspondence"):
        correct = total = 0
        for r, o in labeled:
            lab = np.asarray(r.labels)
            key = {"classification": "class", "segmentation": "labels",
                   "correspondence": "map"}[config.task]
            p_ = np.asarray(o[key])
            if lab.ndim == 0:
                correct += int(p_ == lab)
                total += 1
            else:
                valid = lab >= 0
                correct += int((p_[valid[:len(p_)]] ==
                                lab[:len(p_)][valid[:len(p_)]]).sum())
                total += int(valid[:len(p_)].sum())
        print(f"accuracy over {len(labeled)} labeled record(s): "
              f"{correct / max(total, 1):.4f}")

    if args.out:
        arrays = {}
        for r, o in zip(records, outs):
            for k, v in o.items():
                arrays[f"{r.name}/{k}"] = np.asarray(v)
            if config.task != "classification":
                # per-vertex outputs are in the record's internal
                # (subsampled + reordered) row order; this maps row i back
                # to the input mesh's vertex id (MeshRecord.vertex_ids).
                # Legacy caches (pre-sample_idx) of SUBSAMPLED datasets
                # cannot provide the mapping — omit rather than emit
                # sample-space indices as if they were vertex ids.
                if r.sample_idx is None and config.sample_n is not None:
                    print(f"WARNING: {r.name}: cached record predates "
                          "sample_idx; vertex_idx omitted (rebuild the "
                          "dataset cache to restore it)")
                else:
                    arrays[f"{r.name}/vertex_idx"] = r.vertex_ids()
        np.savez_compressed(args.out, **arrays)
        print(f"wrote {len(arrays)} arrays to {args.out}")
    return outs


def console_main():
    """Console-script entry (pyproject [project.scripts])."""
    main()
    return 0


if __name__ == "__main__":
    main()
