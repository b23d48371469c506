"""Tangent-feature pointwise ops: complex linear layer and modReLU.

Reference: nn/tangent_lin.py:4-29 and nn/tangent_nonlin.py:8-35.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.complexops import modrelu  # noqa: F401  (re-export)
from .field_conv import cmatmul

__all__ = ["tangent_lin", "modrelu"]


def tangent_lin(x, w_re, w_im):
    """Complex linear map without bias (equivariance-preserving).

    y[n, o] = Σ_i x[n, i] · (w_re + i·w_im)[o, i]   (tangent_lin.py:27-29)

    x: (N, C, 2); w_re, w_im: (O, C).  Returns (N, O, 2).
    """
    w = jnp.stack([w_re.T, w_im.T], axis=-1)  # (C, O, 2)
    return cmatmul(x, w)
