"""Self-contained model bundles: config + trained params in one directory.

The reference keeps trained weights in notebook memory only (the eval cells
reuse the in-session `model` object — classification.ipynb cell 13,
segmentation.ipynb cell 14); there is no way to ship a trained model to a
serving host.  A bundle is a directory

    bundle/
      bundle.json      format version, ExperimentConfig fields, n_classes,
                       free-form metadata (training metrics, git rev, ...)
      params.msgpack   flax msgpack serialization of the params pytree

that `load_bundle` restores without any training-side state: the net is
rebuilt from the config (train/loop.py::build_model) and the params pytree
is restored structurally (msgpack carries the tree, so no template init —
and therefore no mesh artifact — is needed at load time).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, NamedTuple, Optional

import flax.serialization as fser
import jax

from ..train.config import ExperimentConfig

FORMAT_VERSION = 1

_BUNDLE_JSON = "bundle.json"
_PARAMS_FILE = "params.msgpack"


class Bundle(NamedTuple):
    net: Any                 # rebuilt flax module (train/loop.py::build_model)
    params: Any              # restored params pytree (numpy leaves)
    config: ExperimentConfig
    n_classes: int
    meta: dict


def export_bundle(path: str, config: ExperimentConfig, params,
                  n_classes: int, meta: Optional[dict] = None) -> str:
    """Write a deployable bundle; returns the bundle directory path.

    `params` is the trained pytree as produced by net.init / TrainState
    (device or host arrays).  `meta` is free-form JSON-serializable
    metadata (final metric, step count, dataset name, ...).
    """
    os.makedirs(path, exist_ok=True)
    host_params = jax.tree.map(lambda x: jax.device_get(x), params)
    with open(os.path.join(path, _PARAMS_FILE), "wb") as f:
        f.write(fser.msgpack_serialize(host_params))
    doc = {
        "format": FORMAT_VERSION,
        "config": dataclasses.asdict(config),
        "n_classes": int(n_classes),
        "meta": dict(meta or {}),
    }
    tmp = os.path.join(path, _BUNDLE_JSON + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, _BUNDLE_JSON))
    return path


def _config_from_dict(d: dict) -> ExperimentConfig:
    # JSON round-trips tuples as lists; restore the tuple-typed fields.
    d = dict(d)
    if d.get("random_scale") is not None:
        d["random_scale"] = tuple(d["random_scale"])
    known = {f.name for f in dataclasses.fields(ExperimentConfig)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(
            f"bundle config carries unknown fields {sorted(unknown)} — "
            "written by a newer framework version?")
    return ExperimentConfig(**d)


def load_bundle(path: str) -> Bundle:
    """Restore a bundle written by export_bundle.

    The net is rebuilt from the stored config; params come back as a plain
    dict-of-numpy pytree, which flax apply() accepts directly (leaves are
    device_put lazily on first use).
    """
    from ..train.loop import build_model  # local import: avoid cycle

    with open(os.path.join(path, _BUNDLE_JSON)) as f:
        doc = json.load(f)
    if doc.get("format") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported bundle format {doc.get('format')!r} "
            f"(this build reads format {FORMAT_VERSION})")
    config = _config_from_dict(doc["config"])
    n_classes = int(doc["n_classes"])
    with open(os.path.join(path, _PARAMS_FILE), "rb") as f:
        params = fser.msgpack_restore(f.read())
    net = build_model(config, n_classes)
    return Bundle(net, params, config, n_classes, doc.get("meta", {}))
