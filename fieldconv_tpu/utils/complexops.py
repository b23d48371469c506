"""Planar-complex helpers and gradient-safe "soft" math.

TPU-native representation of complex tensors: a trailing axis of size 2
holding (real, imag) as float32 (bfloat16-capable).  XLA's complex64 support
on TPU is second class, so every op in the compute path works on planar
pairs and hand-writes the complex arithmetic; this also keeps the door open
for mixed-precision and Pallas kernels.

The "soft" functions reproduce the gradient-safe-at-zero semantics of the
reference implementation (/root/reference/utils/field.py:10-58): values at
(near-)origin entries are masked out with |re|<EPS and |im|<EPS cutoffs, and
gradients are finite there (the reference achieves this with nonzero()
indexing; we use the standard double-where trick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches reference EPS (utils/field.py:8).
EPS = 1e-7


# ---------------------------------------------------------------------------
# Planar complex construction / destruction
# ---------------------------------------------------------------------------

def cplx(re, im):
    """Stack real and imaginary parts into a planar complex array (..., 2)."""
    return jnp.stack([re, im], axis=-1)


def creal(z):
    return z[..., 0]


def cimag(z):
    return z[..., 1]


def to_numpy_complex(z):
    """Planar (..., 2) -> numpy/jnp complex (for tests & interop only)."""
    return creal(z) + 1j * cimag(z)


def from_complex(zc):
    """jnp/np complex array -> planar (..., 2) float array."""
    return jnp.stack([jnp.real(zc), jnp.imag(zc)], axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Complex arithmetic on planar pairs
# ---------------------------------------------------------------------------

def cmul(a, b):
    """(a.re + i a.im) * (b.re + i b.im), broadcasting leading dims."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def cconj(a):
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def cscale(a, s):
    """Multiply planar complex a by real array s (broadcast over last axis)."""
    return a * s[..., None]


def cabs2(a):
    return a[..., 0] * a[..., 0] + a[..., 1] * a[..., 1]


def cpolar(r, theta):
    """r * e^{i theta} as planar pair; r, theta real arrays."""
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def cexpi(theta):
    """e^{i theta} as planar pair."""
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


# ---------------------------------------------------------------------------
# Soft (origin-masked) functions — reference parity (utils/field.py)
# ---------------------------------------------------------------------------

def is_zero(x, eps=EPS):
    """|x| < eps elementwise on a real array (field.py:10-12)."""
    return jnp.logical_and(x < eps, x > -eps)


def is_origin(z, eps=EPS):
    """Both components within eps of zero (field.py:14-16). z: (..., 2)."""
    return jnp.logical_and(is_zero(z[..., 0], eps), is_zero(z[..., 1], eps))


def soft_abs(z, eps=EPS):
    """|z| at non-origin entries, exactly 0 at origin entries (field.py:28-36).

    Gradient at origin entries is 0 (output constant there), matching the
    reference where masked entries never enter the autograd graph.
    """
    mask = is_origin(z, eps)
    # double-where: keep sqrt argument away from 0 so the backward pass is finite
    safe = jnp.where(mask[..., None], jnp.ones_like(z), z)
    mag = jnp.sqrt(safe[..., 0] ** 2 + safe[..., 1] ** 2)
    return jnp.where(mask, 0.0, mag)


def soft_angle(z, eps=EPS):
    """arg(z) at non-origin entries, exactly 0 at origin (field.py:39-46)."""
    mask = is_origin(z, eps)
    safe_re = jnp.where(mask, 1.0, z[..., 0])
    safe_im = jnp.where(mask, 0.0, z[..., 1])
    ang = jnp.arctan2(safe_im, safe_re)
    return jnp.where(mask, 0.0, ang)


def soft_sqrt(x, eps=EPS):
    """sqrt at non-zero entries, 0 at zero entries (field.py:50-57)."""
    mask = is_zero(x, eps)
    safe = jnp.where(mask, 1.0, x)
    return jnp.where(mask, 0.0, jnp.sqrt(safe))


def soft_absolute(x):
    """Elementwise |x| on a real array (field.py:18-26).

    The reference flips the sign of strictly-negative entries in place; the
    subgradient at exactly 0 is +1 (identity branch), which jnp.where with a
    `x < 0` predicate reproduces.
    """
    return jnp.where(x < 0, -x, x)


def soft_unit(z, eps=EPS):
    """z/|z| at non-origin entries, (0,0) at origin. Safe gradients."""
    mask = is_origin(z, eps)
    safe = jnp.where(mask[..., None], jnp.ones_like(z), z)
    mag = jnp.sqrt(safe[..., 0] ** 2 + safe[..., 1] ** 2)
    unit = safe / mag[..., None]
    return jnp.where(mask[..., None], 0.0, unit)


def modrelu(z, bias, eps=EPS):
    """modReLU: ReLU(|z| + b) * e^{i arg z} at non-origin entries; identity at
    origin entries (reference nn/tangent_nonlin.py:24-35 clones the input and
    only overwrites non-origin positions, so origin entries pass through).

    z: (..., C, 2); bias: broadcastable to (..., C).
    """
    mask = is_origin(z, eps)
    safe = jnp.where(mask[..., None], jnp.ones_like(z), z)
    mag = jnp.sqrt(safe[..., 0] ** 2 + safe[..., 1] ** 2)
    scale = jax.nn.relu(mag + bias) / mag
    out = safe * scale[..., None]
    return jnp.where(mask[..., None], z, out)
