"""Device-ready padded-CSR edge tables.

The reference stores support edges as a ragged COO list and re-derives the
dense per-edge stencil every forward pass (transforms/fc_precomp.py:30-97).
On TPU we want static shapes and MXU-shaped contractions, so the offline
precompute emits a *padded CSR by target*: each target vertex owns a fixed
number of neighbor slots D (bucketed), and the edge-dependent factors are
stored factored — the (E, R, 2B+1) complex stencil of the reference is the
rank-1 product ``rsten[e, r] * fwxp[e, k]`` and is never materialised.

All arrays are float32/int32, complex values planar (..., 2).  Padded slots
have rsten == 0 and fwxp == 0 so the runtime needs no explicit edge mask in
the convolution inner loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class EdgeTable:
    """Padded-CSR support graph + factored convolution stencil for one mesh.

    Attributes:
      src:   (N, D) int32  — source vertex index per neighbor slot (0 if pad)
      mask:  (N, D) f32    — 1.0 for a real edge, 0.0 for padding
      rsten: (N, D, R) f32 — radial linear-interpolation weights (0 at pads)
      fwxp:  (N, D, K, 2) f32 — e^{i k θ} ⊙ (w_norm · xp); K = 2B+1, k=-B..B
                               (0 at pads)
      ln:    (N, D, 2) f32 — log_j(i)/ε as planar complex (r normalised to 1)
      wxp:   (N, D, 2) f32 — w_norm · xp (for ECHO votes); 0 at pads
      vmask: (N,) f32      — 1.0 for real vertices, 0.0 for padded rows
      n_valid: number of real (sampled) vertices
      band_limit, n_rings: stencil hyperparameters (K = 2*band_limit+1)
      axis_name: when set, the table rows (targets) are a LOCAL shard of a
        shard_map graph axis of that name, while ``src`` indices stay GLOBAL;
        the ops all_gather source features over the axis before gathering
        (parallel/gp.py builds these tables).  None = single-device table.
    """

    src: jnp.ndarray
    mask: jnp.ndarray
    rsten: jnp.ndarray
    fwxp: jnp.ndarray
    ln: jnp.ndarray
    wxp: jnp.ndarray
    vmask: jnp.ndarray
    n_valid: int
    band_limit: int
    n_rings: int
    axis_name: str = None

    @property
    def n_pad(self) -> int:
        return self.src.shape[0]

    @property
    def d_slots(self) -> int:
        return self.src.shape[1]

    @property
    def k_width(self) -> int:
        return 2 * self.band_limit + 1

    def num_edges(self) -> float:
        return float(np.asarray(jnp.sum(self.mask)))


jax.tree_util.register_dataclass(
    EdgeTable,
    data_fields=["src", "mask", "rsten", "fwxp", "ln", "wxp", "vmask"],
    meta_fields=["n_valid", "band_limit", "n_rings", "axis_name"],
)
