"""Rounding ops: straight-through round and soft rounding.

JAX counterparts of the reference's python/ops/round_ops.py:28-130
(Agustsson & Theis 2020, "Universally Quantized Neural Compression" §4.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "round_st",
    "soft_round",
    "soft_round_inverse",
    "soft_round_conditional_mean",
]


@jax.custom_vjp
def _round_st_no_offset(inputs):
    return jnp.round(inputs)


_round_st_no_offset.defvjp(
    lambda inputs: (jnp.round(inputs), None),
    lambda _, grad: (grad,),
)


@jax.custom_vjp
def _round_st_offset(inputs, offset):
    return jnp.round(inputs - offset) + offset


_round_st_offset.defvjp(
    lambda inputs, offset: (jnp.round(inputs - offset) + offset, offset),
    lambda offset, grad: (grad, jnp.zeros_like(offset)),
)


def round_st(inputs, offset=None):
    """Straight-through round with optional quantization offset."""
    if offset is None:
        return _round_st_no_offset(inputs)
    return _round_st_offset(inputs, offset)


def soft_round(x, alpha, eps=1e-3):
    """Differentiable approximation to round; identity for alpha < eps."""
    alpha = jnp.asarray(alpha, jnp.result_type(x))
    alpha_bounded = jnp.maximum(alpha, eps)
    m = jnp.floor(x) + 0.5
    r = x - m
    z = jnp.tanh(alpha_bounded / 2.0) * 2.0
    y = m + jnp.tanh(alpha_bounded * r) / z
    return jnp.where(alpha < eps, x, y)


def soft_round_inverse(y, alpha, eps=1e-3):
    """Inverse of soft_round; identity for alpha < eps."""
    alpha = jnp.asarray(alpha, jnp.result_type(y))
    alpha_bounded = jnp.maximum(alpha, eps)
    m = jnp.floor(y) + 0.5
    s = (y - m) * (jnp.tanh(alpha_bounded / 2.0) * 2.0)
    r = jnp.arctanh(s) / alpha_bounded
    r = jnp.clip(r, -0.5, 0.5)
    return jnp.where(alpha < eps, y, m + r)


def soft_round_conditional_mean(y, alpha):
    """E[Y | s(Y) + U = y] for the soft-rounding quantizer."""
    return soft_round_inverse(y - 0.5, alpha) + 0.5
