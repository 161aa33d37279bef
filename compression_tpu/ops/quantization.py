"""Stochastic rounding (reference cc/kernels/quantization_kernels.cc:48-108).

Two seeding modes:
  * `stochastic_round(..., key=...)` — TPU-native: JAX's counter-based
    PRNG (seedable, reproducible, vectorized).  Same distributional
    contract as the reference (`floor(x/step) + Bernoulli(frac)`), but a
    different sample sequence for a given seed.
  * `stochastic_round_reference(..., seed=[...])` — bit-exact replica of
    the reference CPU op: std::seed_seq-seeded xoshiro256+ stream
    (util/xoshiro.py), one 24-bit uniform per element in C-flat order,
    float32 comparison semantics.  Host-side (the stream is sequential
    by construction), golden-tested against the compiled reference
    kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.util import xoshiro

__all__ = ["stochastic_round", "stochastic_round_reference"]


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


def stochastic_round_reference(inputs, step_size, seed):
    """Bit-exact replica of the reference StochasticRound CPU kernel.

    Reference cc/kernels/quantization_kernels.cc:53-95: inputs are
    promoted to float32, divided by `step_size`, floored; the fraction is
    compared against a seeded xoshiro256+ 24-bit uniform drawn per
    element in flat order.

    Args:
      inputs: float array (f32/bf16/f16 — promoted to f32 like the op).
      step_size: scalar step.
      seed: sequence of int32 seed values (must be non-empty; the
        reference's unseeded mode draws from the system clock and is not
        reproducible by design).

    Returns:
      int32 numpy array of the same shape.
    """
    seed = list(np.asarray(seed, np.int32).ravel())
    if not seed:
        raise ValueError(
            "Empty seed selects the reference's wall-clock mode, which is "
            "not reproducible; provide at least one int32 seed value.")
    x = np.asarray(inputs, np.float32) / np.float32(step_size)
    integral = np.floor(x)
    fractional = x - integral
    random = xoshiro.uniform24_stream(seed, x.size).reshape(x.shape)
    return (integral + (random < fractional)).astype(np.int32)
