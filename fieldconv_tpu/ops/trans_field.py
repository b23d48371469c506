"""TransField — learned "gradient" lifting scalar features to tangent fields.

Reference: nn/trans_field.py:27-113 (supplement Eqs. (2)-(3)).

Two aggregations over the support edges, using two columns of the stencil
(frequency 0 and +1 in the correct usage; see the parity note on
``lift_cols`` in models/*):

  contribAng[i,c,r] = -Σ_e (x[j]-x[i]) · sten1[e,r]        (:104-106)
  contribMag[i,c,r] =  Σ_e  x[j]       · |sten0[e,r]|      (:110)

then per-(out,in) zonal banks turn these into an angle and a magnitude that
are recombined as ρ·e^{iφ} and summed over input channels (:9-24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..precomp.edge_table import EdgeTable
from ..utils.complexops import (
    cpolar,
    soft_abs,
    soft_absolute,
    soft_angle,
)


def _sten_col(table: EdgeTable, k_index: int):
    """Per-edge stencil column sten_k[n,d,r] = rsten[n,d,r]·fwxp[n,d,k] (planar)."""
    return table.rsten[..., None] * table.fwxp[:, :, None, k_index, :]


def trans_field_contrib(x, table: EdgeTable, lift_cols=(0, 1), d_chunk: int = 128):
    """Aggregate the angular (complex) and magnitude (real) contributions.

    x: (N, C) real scalar features.
    lift_cols: indices into the K axis of fwxp selecting the two stencil
      columns; (B, B+1) = frequencies (0, +1) is the correct choice, while
      (0, 1) replicates the classification notebook's use of the unsliced
      stencil (SURVEY.md §6c.1).

    Returns contribAng (N, C, R, 2), contribMag (N, C, R).
    """
    N, C = x.shape
    R, D = table.n_rings, table.d_slots
    k0, k1 = lift_cols

    def chunk(src_c, rsten_c, fw0_c, fw1_c):
        xs = x[src_c]                                       # (N, DB, C)
        xdiff = xs - x[:, None, :]                          # x_j - x_i
        sten1 = rsten_c[..., None] * fw1_c[:, :, None, :]   # (N, DB, R, 2)
        sten0 = rsten_c[..., None] * fw0_c[:, :, None, :]
        # The reference takes softAbs of the (complex) freq-0 stencil column
        # (trans_field.py:110); padded slots are exactly 0 -> stay 0.
        sten0_abs = soft_abs(sten0)                          # (N, DB, R)
        ang = -jnp.einsum(
            "ndc,ndrp->ncrp", xdiff, sten1, preferred_element_type=jnp.float32
        )
        mag = jnp.einsum(
            "ndc,ndr->ncr", xs, sten0_abs, preferred_element_type=jnp.float32
        )
        return ang, mag

    if d_chunk >= D:
        return chunk(
            table.src, table.rsten, table.fwxp[..., k0, :], table.fwxp[..., k1, :]
        )

    if D % d_chunk:
        raise ValueError(f"d_slots={D} not a multiple of d_chunk={d_chunk}")
    n_chunks = D // d_chunk
    split = lambda a: jnp.moveaxis(a.reshape(N, n_chunks, d_chunk, *a.shape[2:]), 1, 0)

    def body(carry, inputs):
        acc_a, acc_m = carry
        ang, mag = chunk(*inputs)
        return (acc_a + ang, acc_m + mag), None

    init = (
        jnp.zeros((N, C, R, 2), dtype=x.dtype),
        jnp.zeros((N, C, R), dtype=x.dtype),
    )
    (ang, mag), _ = jax.lax.scan(
        body,
        init,
        (
            split(table.src),
            split(table.rsten),
            split(table.fwxp[..., k0, :]),
            split(table.fwxp[..., k1, :]),
        ),
    )
    return ang, mag


def trans_field_weight(contrib_ang, contrib_mag, zonal_ang, zonal_mag, phase, ftype):
    """Contract with zonal banks and recombine (trans_field.py:9-24).

    contrib_ang: (N, C, R, 2); contrib_mag: (N, C, R)
    zonal_ang, zonal_mag: (O, C, R); phase: (O, C)
    Returns (N, O, 2).
    """
    A = jnp.einsum(
        "ncrp,ocr->nocp", contrib_ang, zonal_ang, preferred_element_type=jnp.float32
    )
    phi = soft_angle(A)                                    # (N, O, C)
    if ftype == 1:
        phi = phi + phase[None, :, :]
    M = jnp.einsum(
        "ncr,ocr->noc", contrib_mag, zonal_mag, preferred_element_type=jnp.float32
    )
    rho = soft_absolute(M)
    return jnp.sum(cpolar(rho, phi), axis=2)               # sum over in-channels


def trans_field(x, table, zonal_ang, zonal_mag, phase, ftype, lift_cols=(0, 1),
                d_chunk: int = 128):
    ang, mag = trans_field_contrib(x, table, lift_cols=lift_cols, d_chunk=d_chunk)
    return trans_field_weight(ang, mag, zonal_ang, zonal_mag, phase, ftype)
