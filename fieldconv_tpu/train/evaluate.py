"""Evaluation loops matching the reference notebooks' test() functions."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..nn import losses
from .trainer import batched_apply


def classification_accuracy(net, params, batches) -> float:
    """Fraction of meshes classified correctly (classification.ipynb cell 13)."""
    correct = total = 0
    for batch in batches:
        logits = batched_apply(net, params, batch)[:, 0, :]
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        correct += int((pred == np.asarray(batch.labels)).sum())
        total += len(pred)
    return correct / max(total, 1)


def segmentation_accuracy(net, params, batches) -> float:
    """Per-vertex accuracy over valid vertices (segmentation.ipynb cell 14)."""
    correct = total = 0
    for batch in batches:
        logits = batched_apply(net, params, batch)
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        lab = np.asarray(batch.labels)
        valid = lab >= 0
        correct += int((pred[valid] == lab[valid]).sum())
        total += int(valid.sum())
    return correct / max(total, 1)


def correspondence_loss(net, params, batches, n_classes) -> float:
    """Mean test CE (correspondence.ipynb cell 13)."""
    tot, n = 0.0, 0
    for batch in batches:
        logits = batched_apply(net, params, batch, deterministic=True)
        l = losses.cross_entropy(
            logits.reshape(-1, n_classes), batch.labels.reshape(-1)
        )
        tot += float(l)
        n += 1
    return tot / max(n, 1)


def matching_rates(net, params, pair_batches, mu=5.0, ratio=0.5,
                   chunk=200_000):
    """FP/FN rates over positive pairs and the full null complement
    (feature_matching.ipynb cell 15), chunked over the O(S²) nulls."""
    n_fp = n_fn = n_p = n_n = 0
    for batch_s, batch_t, pos_pairs, nulls in pair_batches:
        fs = batched_apply(net, params, batch_s)[0]
        ft = batched_apply(net, params, batch_t)[0]
        fn_, fp_ = losses.twin_eval(fs, ft, jnp.asarray(pos_pairs),
                                    jnp.asarray(pos_pairs[:0]), mu, ratio)
        n_fn += int(fn_)
        n_p += len(pos_pairs)
        for lo in range(0, len(nulls), chunk):
            sub = jnp.asarray(nulls[lo:lo + chunk])
            _, fp_ = losses.twin_eval(fs, ft, sub[:0], sub, mu, ratio)
            n_fp += int(fp_)
        n_n += len(nulls)
    return n_fp / max(n_n, 1), n_fn / max(n_p, 1)
