"""Parameter reparameterizations (RDFT kernels, nonnegative GDN params).

Functional JAX counterparts of the reference's python/layers/parameters.py:
  * RDFT: a convolution kernel stored as real+imaginary parts of its
    real-input DFT with 1/sqrt(N) normalization (decorrelates kernel
    coefficients for optimization).
  * GDN: nonnegative values stored as their square roots (plus a small
    pedestal offset), read back through a lower_bound custom gradient.

These are plain functions over arrays; flax modules own the underlying
variables and call these to materialize parameter values.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from compression_tpu.ops import math_ops

__all__ = [
    "rdft_init",
    "rdft_to_kernel",
    "gdn_param_init",
    "gdn_param_value",
]


def _spatial_last(kernel_rank):
    """Permutation moving (spatial..., in, out) -> (in, out, spatial...)."""
    spatial = kernel_rank - 2
    return (spatial, spatial + 1) + tuple(range(spatial))


def _spatial_first(kernel_rank):
    spatial = kernel_rank - 2
    return tuple(range(2, kernel_rank)) + (0, 1)


def rdft_init(kernel):
    """Transforms an initial kernel into (real, imag) RDFT variables.

    kernel shape: (spatial..., in_channels, out_channels), rank 3..5.
    """
    kernel = jnp.asarray(kernel)
    rank = kernel.ndim
    if rank not in (3, 4, 5):
        raise ValueError(f"Kernel must have rank 3..5, got {rank}.")
    spatial_shape = kernel.shape[:-2]
    moved = jnp.transpose(kernel, _spatial_last(rank))
    rdft = jnp.fft.rfftn(moved, axes=tuple(range(2, rank)))
    norm = float(np.prod(spatial_shape)) ** 0.5
    rdft = rdft / norm
    return jnp.real(rdft), jnp.imag(rdft)


def rdft_to_kernel(real, imag, spatial_shape):
    """Inverse RDFT back to a (spatial..., in, out) kernel."""
    spatial_shape = tuple(int(s) for s in spatial_shape)
    rank = len(spatial_shape) + 2
    compute_dtype = real.dtype
    if compute_dtype in (jnp.bfloat16, jnp.float16):
        real = real.astype(jnp.float32)
        imag = imag.astype(jnp.float32)
    rdft = real + 1j * imag
    norm = float(np.prod(spatial_shape)) ** 0.5
    rdft = rdft * norm
    kernel = jnp.fft.irfftn(
        rdft, s=spatial_shape, axes=tuple(range(2, rank)))
    kernel = jnp.transpose(kernel, _spatial_first(rank))
    return kernel.astype(compute_dtype)


def gdn_param_init(initial_value, offset=2**-18):
    """Maps an initial nonnegative value to its stored square-root form."""
    initial_value = jnp.asarray(initial_value)
    pedestal = jnp.asarray(offset**2, initial_value.dtype)
    return jnp.sqrt(jnp.maximum(initial_value + pedestal, pedestal))


def gdn_param_value(variable, minimum=0.0, offset=2**-18):
    """Reads back the nonnegative value: max(var, bound)^2 - offset^2.

    The lower_bound custom gradient keeps training from getting stuck at
    the bound (reference parameters.py:240-250).
    """
    pedestal = jnp.asarray(offset**2, variable.dtype)
    bound = jnp.asarray((minimum + offset**2) ** 0.5, variable.dtype)
    return jnp.square(math_ops.lower_bound(variable, bound)) - pedestal
