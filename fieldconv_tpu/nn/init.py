"""Torch-compatible parameter initialisers.

The reference initialises every filter bank with
``torch.nn.init.xavier_uniform_`` (nn/field_conv.py:85,97-98 etc.) and its
dense heads with torch's default ``nn.Linear`` scheme.  Torch's fan
computation for rank>2 tensors is fan_in = d1·prod(rest), fan_out =
d0·prod(rest); we reproduce it so ported weights and from-scratch training
behave identically.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _torch_fans(shape):
    if len(shape) < 2:
        raise ValueError("xavier init needs >= 2 dims")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def xavier_uniform(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _torch_fans(shape)
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    shape: (out, in).
    """
    bound = 1.0 / math.sqrt(shape[1])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
