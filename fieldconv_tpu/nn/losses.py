"""Losses and evaluation metrics (reference nn/label_smoothing_loss.py,
nn/twin_loss.py, nn/twin_eval.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """Mean cross entropy over valid rows; labels < 0 are masked (padding)."""
    valid = labels >= 0
    labels_safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def label_smoothing_loss(logits, labels, n_classes, smoothing=0.0, weight=None):
    """Label-smoothed CE (reference nn/label_smoothing_loss.py:9-32).

    true_dist = smoothing/(C-1) everywhere, confidence at the target; mean
    over valid rows of sum(-true_dist * log_softmax).  labels < 0 masked.
    """
    valid = labels >= 0
    labels_safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    if weight is not None:
        logp = logp * weight[None, :]
    confidence = 1.0 - smoothing
    off = smoothing / (n_classes - 1)
    onehot = jax.nn.one_hot(labels_safe, n_classes)
    true_dist = onehot * (confidence - off) + off
    per_row = jnp.sum(-true_dist * logp, axis=-1)
    per_row = jnp.where(valid, per_row, 0.0)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(valid), 1)


def twin_loss(key, x_s, x_t, pos_pairs, null_pairs, mu=5.0):
    """Siamese descriptor loss (reference nn/twin_loss.py:16-37).

    Positive pairs pulled together (mean squared distance); negative pairs
    mix a pull term and a hinge past margin mu with random per-pair weights
    yN = 0.2·U[0,1) (twin_loss.py:26-34).

    pos_pairs / null_pairs: (P, 2) and (Q, 2) int arrays of
    (target_idx, source_idx) rows, matching xT[p[:,0]] - xS[p[:,1]].
    """
    num_p, num_n = pos_pairs.shape[0], null_pairs.shape[0]
    dp = x_t[pos_pairs[:, 0]] - x_s[pos_pairs[:, 1]]
    lp = jnp.sum(dp * dp) / num_p

    yn = 0.2 * jax.random.uniform(key, (num_n,))
    dn = x_t[null_pairs[:, 0]] - x_s[null_pairs[:, 1]]
    ln = jnp.sum(dn * dn, axis=1)
    ln1 = jnp.sum(ln * yn)
    ln2 = jnp.sum(jax.nn.relu(mu - ln) * (1.0 - yn))
    return lp + (ln1 + ln2) / num_n


def twin_eval(x_s, x_t, pos_pairs, null_pairs, mu=5.0, ratio=0.5):
    """Counts of false negatives / false positives (reference nn/twin_eval.py:5-27)."""
    thresh = mu * ratio
    dp = x_t[pos_pairs[:, 0]] - x_s[pos_pairs[:, 1]]
    dn = x_t[null_pairs[:, 0]] - x_s[null_pairs[:, 1]]
    p2 = jnp.sum(dp * dp, axis=1)
    n2 = jnp.sum(dn * dn, axis=1)
    n_fn = jnp.sum(p2 > thresh)
    n_fp = jnp.sum(n2 < thresh)
    return n_fn, n_fp
