"""Fixed-shape, AOT-compiled inference over mesh artifacts.

Serving differs from training: shapes are known up front, there is no
optimizer state, and dispatch latency matters.  The Predictor

  * rebuilds the net from a Bundle (bundle.py) or an in-memory triple,
  * batches precomputed MeshRecords with the SAME bucket/layout machinery
    the trainer uses (train/loop.py::make_batches — so the served compute
    path, banded/panel/compact included, is byte-identical to training),
  * compiles the forward ahead of time per batch shape-signature with
    `jax.jit(...).lower(batch).compile()` — warm-up is an explicit,
    observable step instead of a first-request latency spike, and
  * maps logits to task-level outputs (class ids / per-vertex labels /
    correspondence maps / match descriptors).

The reference's inference is notebook-bound re-use of the training session
(classification.ipynb cell 13, segmentation.ipynb cell 14,
correspondence.ipynb cell 13, feature_matching.ipynb cell 15); this module
is the framework-native replacement with no training-side state.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import numpy as np

from ..train.config import ExperimentConfig
from ..train.trainer import MeshBatch, batched_apply
from .bundle import Bundle, load_bundle


def _shape_key(batch: MeshBatch):
    """Hashable signature of a batch's pytree structure + leaf shapes/dtypes.

    jax.jit keys its cache the same way; we keep an explicit mirror so
    warm-up can report what is compiled and serving can assert no
    recompiles happen (Predictor(strict_shapes=True))."""
    leaves, treedef = jax.tree.flatten(batch)
    return (str(treedef),
            tuple((tuple(l.shape), str(l.dtype)) for l in leaves))


class Predictor:
    """AOT-compiled forward pass for one exported model.

    Parameters
    ----------
    bundle : Bundle | str — a loaded Bundle or a bundle directory path.
    batch_size : meshes per compiled step (bucketed like training).
    banded_tb : target-block size for the Pallas layouts (None = XLA path,
        matching the trainer's default).
    strict_shapes : when True, predicting a batch whose shape signature was
        not warmed up raises instead of silently compiling — the serving
        guard against first-request compile spikes.
    """

    def __init__(self, bundle, batch_size: int = 1,
                 banded_tb: Optional[int] = None,
                 strict_shapes: bool = False):
        if isinstance(bundle, str):
            bundle = load_bundle(bundle)
        if not isinstance(bundle, Bundle):
            raise TypeError(f"expected Bundle or path, got {type(bundle)}")
        self.bundle = bundle
        self.net = bundle.net
        self.params = bundle.params
        self.config: ExperimentConfig = bundle.config
        self.n_classes = bundle.n_classes
        self.batch_size = batch_size
        self.banded_tb = banded_tb
        self.strict_shapes = strict_shapes
        self._compiled = {}

        task = self.config.task
        # correspondence carries dropout; inference is deterministic.
        # Public so external harnesses (scripts/serve_probe.py) can build
        # the exact serving forward.
        self.apply_kw = ({"deterministic": True}
                         if task == "correspondence" else {})

        def forward(params, batch: MeshBatch):
            return batched_apply(self.net, params, batch, **self.apply_kw)

        self._jit_forward = jax.jit(forward)

    # -- batching ----------------------------------------------------------

    def make_batches(self, records: Sequence, n_pad: Optional[int] = None,
                     d_slots: Optional[int] = None) -> List[MeshBatch]:
        """Bucket + stack records exactly as the trainer does.

        Pass the training-time (n_pad, d_slots) — both — to reuse
        training's compiled shapes; default derives a bucket from these
        records."""
        from ..data.base import shared_bucket
        from ..train.loop import make_batches

        if (n_pad is None) != (d_slots is None):
            raise ValueError(
                "pass both n_pad and d_slots (the bucket signature) or "
                "neither — one alone would be silently recomputed")
        if n_pad is None:
            n_pad, d_slots = shared_bucket(list(records))
        return make_batches(list(records), self.config, self.batch_size,
                            self.banded_tb, n_pad, d_slots)

    def place(self, batch: MeshBatch) -> MeshBatch:
        """Commit a batch's arrays to the device once.

        make_batches returns host (numpy) arrays; dispatching those
        re-transfers the stencil tables every call.  Serving a mesh
        repeatedly — the correspondence/segmentation pattern — should
        place it once and reuse the placed batch (scripts/serve_probe.py
        measures the steady-state device latency this enables: 14.8-25.7 /
        8.9-23.5 ms per forward at the seg/corr production shapes across
        runs on the shared chip)."""
        device = jax.devices()[0]
        return jax.tree.map(lambda x: jax.device_put(x, device), batch)

    # -- compilation -------------------------------------------------------

    def warmup(self, batches: Sequence[MeshBatch]) -> int:
        """AOT-compile every distinct batch signature; returns how many
        distinct executables were built."""
        built = 0
        for b in batches:
            key = _shape_key(b)
            if key in self._compiled:
                continue
            self._compiled[key] = (
                self._jit_forward.lower(self.params, b).compile()
            )
            built += 1
        return built

    def compiled_signatures(self) -> int:
        return len(self._compiled)

    # -- inference ---------------------------------------------------------

    def logits(self, batch: MeshBatch):
        """Raw model output for one batch (device array)."""
        key = _shape_key(batch)
        exe = self._compiled.get(key)
        if exe is not None:
            return exe(self.params, batch)
        if self.strict_shapes:
            raise RuntimeError(
                "batch signature was not warmed up and strict_shapes=True; "
                "call warmup() with a batch of this shape first")
        return self._jit_forward(self.params, batch)

    def predict(self, records: Sequence, n_pad: Optional[int] = None,
                d_slots: Optional[int] = None,
                batches: Optional[List[MeshBatch]] = None) -> List[dict]:
        """Task-level predictions, one dict per input record (in order).

        classification: {"class": int, "logits": (n_classes,)}
        segmentation:   {"labels": (N,), "logits": (N, n_classes)}
        correspondence: {"map": (N,) target-vertex ids, "logits": ...}
        matching:       {"descriptors": (N, n_des) soft-abs features}
        N is the record's true (unpadded) sample count.

        batches: pass the output of make_batches(records) to skip
        rebuilding the stencil tables (they can run to ~44 MB per mesh);
        must correspond to `records` in order.
        """
        records = list(records)
        if batches is None:
            batches = self.make_batches(records, n_pad, d_slots)
        outs: List[dict] = []
        i = 0
        for batch in batches:
            y = np.asarray(self.logits(batch))
            for bi in range(y.shape[0]):
                if i >= len(records):
                    break   # trailing pad meshes in the last bucket
                n = records[i].n_samples
                outs.append(self._to_output(y[bi], n))
                i += 1
        if i != len(records):
            raise RuntimeError(
                f"batching produced {i} outputs for {len(records)} records")
        return outs

    def match(self, source_records: Sequence, target_records: Sequence,
              mu: Optional[float] = None, ratio: float = 0.5,
              chunk: int = 1024) -> List[dict]:
        """Dense shape matching with a deployed MatchingNet: each source
        vertex is matched to its nearest-descriptor target vertex
        (deploy/matching.py).  Returns one dict per (source, target) pair:

          {"indices": (S,) target ids, "sq_dist": (S,),
           "accepted": (S,) bool — sq_dist < mu*ratio, the twin_eval
           decision threshold (nn/losses.py::twin_eval)}

        mu defaults to the bundle config's twin_mu."""
        if self.config.task != "matching":
            raise ValueError(
                f"match() needs a matching bundle, got {self.config.task!r}")
        from .matching import descriptor_match

        source_records = list(source_records)
        target_records = list(target_records)
        if len(source_records) != len(target_records):
            raise ValueError(
                f"match() pairs records elementwise: got "
                f"{len(source_records)} sources vs "
                f"{len(target_records)} targets")
        mu = self.config.twin_mu if mu is None else mu
        src = self.predict(source_records)
        tgt = self.predict(target_records)
        outs = []
        for s, t in zip(src, tgt):
            idx, d2 = descriptor_match(s["descriptors"], t["descriptors"],
                                       chunk=chunk)
            outs.append({"indices": idx, "sq_dist": d2,
                         "accepted": d2 < mu * ratio})
        return outs

    def _to_output(self, y: np.ndarray, n: int) -> dict:
        task = self.config.task
        if task == "classification":
            logits = y[0]
            return {"class": int(np.argmax(logits)), "logits": logits}
        if task == "segmentation":
            logits = y[:n]
            return {"labels": np.argmax(logits, axis=-1).astype(np.int32),
                    "logits": logits}
        if task == "correspondence":
            logits = y[:n]
            return {"map": np.argmax(logits, axis=-1).astype(np.int32),
                    "logits": logits}
        if task == "matching":
            return {"descriptors": y[:n]}
        raise ValueError(task)
