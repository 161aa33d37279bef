"""Stochastic rounding (reference cc/kernels/quantization_kernels.cc:48-108).

TPU-native: the random stream comes from JAX's counter-based PRNG (seedable,
reproducible, vectorized) instead of the reference's sequential xoshiro256+;
for a given seed the sample sequence differs from the CPU op, but the
distributional contract is identical:

    output = floor(x/step) + Bernoulli(frac(x/step))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["stochastic_round"]


def stochastic_round(inputs, step_size, key):
    """Rounds inputs/step_size stochastically to int32.

    Args:
      inputs: floating point tensor (f32/bf16/f16).
      step_size: scalar step.
      key: jax PRNG key (the explicit analog of the op's `seed` input).

    Returns:
      int32 tensor of the same shape.
    """
    x = jnp.asarray(inputs, jnp.float32) / jnp.float32(step_size)
    integral = jnp.floor(x)
    fractional = x - integral
    # 24-bit uniform in [0, 1), matching the reference's resolution.
    bits = jax.random.bits(key, x.shape, jnp.uint32) >> 8
    random = bits.astype(jnp.float32) * jnp.float32(2.0**-24)
    return (integral + (random < fractional)).astype(jnp.int32)
