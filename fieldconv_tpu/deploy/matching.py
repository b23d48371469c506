"""Dense descriptor matching for deployed MatchingNet models.

The reference only *evaluates* descriptors (FP/FN against labeled pairs,
feature_matching.ipynb cell 15 / nn/twin_eval.py); actually matching two
shapes — each source vertex to its nearest-descriptor target vertex — is
left to the reader.  This module provides it as a fixed-shape, jitted
nearest-neighbor search: sources are processed in chunks so the distance
tile stays (chunk, N_t) regardless of mesh size, and the chunk loop is a
`lax.map` over a static grid (no data-dependent shapes under jit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("chunk",))
def _match_padded(fs, ft, chunk: int):
    """fs: (S_pad, D) source descriptors (rows past the true count are
    arbitrary), ft: (T, D) targets.  Returns (S_pad,) argmin indices and
    squared distances.  ||a-b||² expanded as a GEMM: a·a - 2 a·b + b·b —
    the (chunk, T) tile rides the MXU instead of a broadcast subtract."""
    t2 = jnp.sum(ft * ft, axis=1)                      # (T,)

    def one(chunk_fs):
        s2 = jnp.sum(chunk_fs * chunk_fs, axis=1)      # (chunk,)
        # full f32 GEMM: the TPU's default bf16 matmul precision flips
        # argmins on near-tied descriptor distances (measured: 17/2050)
        prod = jnp.dot(chunk_fs, ft.T, precision=jax.lax.Precision.HIGHEST)
        d2 = (s2[:, None] - 2.0 * prod) + t2[None, :]
        return jnp.argmin(d2, axis=1), jnp.min(d2, axis=1)

    s_pad = fs.shape[0]
    n_chunks = s_pad // chunk
    idx, d2 = jax.lax.map(one, fs.reshape(n_chunks, chunk, -1))
    return idx.reshape(s_pad), d2.reshape(s_pad)


def descriptor_match(fs, ft, chunk: int = 1024):
    """Nearest-descriptor match, source → target.

    fs: (S, D) source descriptors, ft: (T, D) target descriptors (numpy or
    jax arrays).  Returns (indices (S,) int32, sq_dist (S,) float32) as
    numpy arrays.  Squared L2, the twin-loss metric (nn/losses.py)."""
    fs = jnp.asarray(fs, jnp.float32)
    ft = jnp.asarray(ft, jnp.float32)
    s = fs.shape[0]
    s_pad = -(-s // chunk) * chunk
    if s_pad != s:
        fs = jnp.pad(fs, ((0, s_pad - s), (0, 0)))
    idx, d2 = _match_padded(fs, ft, chunk)
    return (np.asarray(idx[:s], np.int32), np.asarray(d2[:s], np.float32))
