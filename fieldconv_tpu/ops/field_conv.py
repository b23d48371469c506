"""Field convolution — the hot op, formulated for the MXU.

Reference semantics (nn/field_conv.py:104-137): for target i, channel c,
ring r, frequency k:

    contrib[i, c, r, k] = Σ_{e: j→i}  x[j,c] · e^{-i k φ_j,c} · sten[e, r, k]

with φ = softAngle(x) and sten[e,r,k] = rsten[e,r]·fwxp[e,k], followed by a
filter contraction over (c, r, k).

TPU-first design: instead of materialising the (E, C, R, K) per-edge tensor
and scatter_add-ing it (the reference's torch_scatter hot loop,
field_conv.py:130-134), we use the padded CSR table: gather the per-source
tensor G[j,c,k] = x·e^{-ikφ} into (N, D, C, K) neighbor slots and contract
the slot axis D against the radial weights with a *batched matmul*

    contrib[n, r, (c,k)] = Σ_d rsten[n, d, r] · (fwxp[n,d,k] ⊙ G[src[n,d],c,k])

which XLA tiles onto the MXU.  The D axis is processed in chunks via
lax.scan so the gathered operand never exceeds a fixed VMEM/HBM budget.
The filter contraction is one complex matmul (N, R·C·K) × (R·C·K, O).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from ..precomp.edge_table import EdgeTable
from ..utils.complexops import cexpi, cmul, soft_angle  # noqa: F401 (cexpi/soft_angle used by other modules' imports)


def resolve_d_chunk(D: int, d_chunk: int) -> int:
    """Largest divisor of D that is <= d_chunk (slot buckets need not divide
    the configured chunk).  Warns when the fallback degrades badly: a
    near-prime bucket (e.g. D=254) silently drops the chunk to 1-2, turning
    one batched matmul into a ~D-step scan.  Re-bucket the table
    (EdgeTable n_multiple) rather than living with the warning."""
    if d_chunk >= D:
        return D
    if D % d_chunk == 0:
        return d_chunk
    best = next(c for c in range(d_chunk, 0, -1) if D % c == 0)
    if best < max(d_chunk // 4, 2):
        warnings.warn(
            f"d_chunk={d_chunk} fell back to {best} (largest divisor of the "
            f"{D}-slot bucket) — the scan now runs {D // best} steps; pad "
            f"the slot bucket to a multiple of a power of two (EdgeTable "
            f"n_multiple) to restore the batched contraction",
            stacklevel=3,
        )
    return best


def cmatmul(a, b):
    """Complex matmul on planar pairs: (..., M, L, 2) x (L, P, 2) -> (..., M, P, 2)."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    f32 = jnp.float32
    re = jnp.matmul(ar, br, preferred_element_type=f32) - jnp.matmul(
        ai, bi, preferred_element_type=f32
    )
    im = jnp.matmul(ar, bi, preferred_element_type=f32) + jnp.matmul(
        ai, br, preferred_element_type=f32
    )
    return jnp.stack([re, im], axis=-1)


def rotated_source_tensor(x, band_limit):
    """G[n, c, k] = x[n,c] · e^{-i k φ_{n,c}}, k = -B..B  (field_conv.py:128-129).

    Transcendental-free: e^{-iφ} = conj(x)/|x| (the unit phasor; set to 1 at
    origin entries, matching softAngle → 0 there), and the k powers built by
    repeated complex multiplication — ~3x cheaper fwd+bwd than the
    atan2 + sin/cos formulation on the VPU, with identical values.

    x: (N, C, 2) planar.  Returns (N, C, K, 2).
    """
    from ..utils.complexops import cconj, is_origin

    B = band_limit
    mask = is_origin(x)[..., None]
    safe = jnp.where(mask, jnp.ones_like(x), x)
    mag = jnp.sqrt(safe[..., 0] ** 2 + safe[..., 1] ** 2)[..., None]
    unit = jnp.concatenate(
        [jnp.ones_like(mag), jnp.zeros_like(mag)], axis=-1)
    u = jnp.where(mask, unit, cconj(safe) / mag)           # e^{-iφ}
    uc = cconj(u)
    pos, neg = [x], [x]
    for _ in range(B):
        pos.append(cmul(pos[-1], u))                       # x·e^{-ikφ}, k>0
        neg.append(cmul(neg[-1], uc))                      # k<0
    terms = neg[1:][::-1] + [x] + pos[1:]                  # k = -B..B
    return jnp.stack(terms, axis=2)                        # (N, C, K, 2)


def field_conv_contrib(x, table: EdgeTable, d_chunk: int = 128):
    """Aggregate neighbor contributions.

    x: (N, C, 2).  Returns contrib (N, R, C, K, 2).

    Padded slots contribute nothing because rsten and fwxp are zero there —
    no runtime masking needed in the inner loop.
    """
    N, C = x.shape[0], x.shape[1]
    B, R, K = table.band_limit, table.n_rings, table.k_width
    D = table.d_slots

    G = rotated_source_tensor(x, B)                        # (N, C, K, 2)

    def chunk_contrib(src_c, fwxp_c, rsten_c):
        # src_c (N, DB); fwxp_c (N, DB, K, 2); rsten_c (N, DB, R)
        Gs = G[src_c]                                      # (N, DB, C, K, 2)
        H = cmul(Gs, fwxp_c[:, :, None, :, :])             # (N, DB, C, K, 2)
        # (N, R, DB) x (N, DB, C*K*2) batched matmul -> MXU
        DB = src_c.shape[1]
        Hf = H.reshape(N, DB, C * K * 2)
        part = jnp.einsum(
            "ndr,ndm->nrm", rsten_c, Hf, preferred_element_type=jnp.float32
        )
        return part.reshape(N, R, C, K, 2)

    if d_chunk >= D:
        return chunk_contrib(table.src, table.fwxp, table.rsten)

    d_chunk = resolve_d_chunk(D, d_chunk)
    n_chunks = D // d_chunk

    def body(acc, inputs):
        src_c, fwxp_c, rsten_c = inputs
        return acc + chunk_contrib(src_c, fwxp_c, rsten_c), None

    split = lambda a: jnp.moveaxis(
        a.reshape(N, n_chunks, d_chunk, *a.shape[2:]), 1, 0
    )
    init = jnp.zeros((N, R, C, K, 2), dtype=x.dtype)
    acc, _ = jax.lax.scan(
        body, init, (split(table.src), split(table.fwxp), split(table.rsten))
    )
    return acc


def filter_coefficients(zonal, spherical, phase, ftype, band_limit):
    """Assemble the (O, C, R, K, 2) planar filter bank.

    Reproduces the three parameterisations of nn/field_conv.py:10-33:
      ftype 0: real zonal (O,I,R), spherical (O,I,R,B,2); K-axis =
               [flip(conj(spherical)), zonal, spherical]
      ftype 1: ftype 0 + per-(o,i,|k|) phase offsets e^{i·phase}
               (folded into the coefficients here — the reference applies
               them after the ring sum, but they are r-independent so the
               contraction is identical)
      ftype 2: complex zonal (O,I,R,2), spherical (O,I,R,2B,2); K-axis =
               [spherical[..B], zonal, spherical[B..]]
    """
    B = band_limit
    if ftype in (0, 1):
        # spherical: (O, I, R, B, 2) — planar complex over positive freqs
        neg = jnp.flip(spherical, axis=3) * jnp.array([1.0, -1.0])  # conj + flip
        zon = jnp.stack([zonal, jnp.zeros_like(zonal)], axis=-1)[..., None, :]
        coeff = jnp.concatenate([neg, zon, spherical], axis=3)      # (O,I,R,K,2)
        if ftype == 1:
            # phase: (O, I, B+1) for k=0..B; |k| applied to both signs
            phases = jnp.concatenate([jnp.flip(phase[..., 1:], axis=-1), phase], axis=-1)
            coeff = cmul(coeff, cexpi(phases)[:, :, None, :, :])
        return coeff
    elif ftype == 2:
        # zonal: (O, I, R, 2); spherical: (O, I, R, 2B, 2)
        coeff = jnp.concatenate(
            [spherical[..., :B, :], zonal[..., None, :], spherical[..., B:, :]],
            axis=3,
        )
        return coeff
    raise ValueError(f"unknown ftype {ftype}")


def apply_filters(contrib, coeff):
    """y[n, o] = (1/K) Σ_{c,r,k} contrib[n,r,c,k] · coeff[o,c,r,k].

    The 1/(2B+1) division matches field_conv.py:14,25,33.
    contrib: (N, R, C, K, 2); coeff: (O, C, R, K, 2).  Returns (N, O, 2).
    """
    N, R, C, K = contrib.shape[:4]
    O = coeff.shape[0]
    lhs = contrib.reshape(N, R * C * K, 2)
    rhs = jnp.transpose(coeff, (2, 1, 3, 0, 4)).reshape(R * C * K, O, 2)
    y = cmatmul(lhs, rhs)
    return y / K


def field_conv(x, table: EdgeTable, zonal, spherical, phase, ftype, d_chunk=128):
    """Full field convolution: (N, C, 2) -> (N, O, 2)."""
    contrib = field_conv_contrib(x, table, d_chunk=d_chunk)
    coeff = filter_coefficients(zonal, spherical, phase, ftype, table.band_limit)
    return apply_filters(contrib, coeff)
