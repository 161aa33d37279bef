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

import functools

import jax
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


# The (i)RDFT is applied to tiny kernel supports (at most 9x9x9 taps), so
# it runs as a dense basis matmul instead of an FFT: that is how the
# reference implements it too (spectral_ops.irdft_matrix), it maps onto
# the MXU, and XLA's FFT lowering is not available on all TPU runtimes.
# The bases are probed once per spatial shape with numpy in float64.
@functools.lru_cache(maxsize=None)
def _rdft_bases(spatial_shape):
    """Returns (fwd_r [N, K], fwd_i [N, K], inv_r [K, N], inv_i [K, N]).

    K = prod(rfft shape); N = prod(spatial_shape).  fwd maps a flattened
    kernel to its (real, imag) rfftn coefficients; inv maps (real, imag)
    coefficients back to the flattened kernel (both linear).
    """
    n = int(np.prod(spatial_shape))
    rfft_shape = tuple(spatial_shape[:-1]) + (spatial_shape[-1] // 2 + 1,)
    k = int(np.prod(rfft_shape))

    eye = np.eye(n, dtype=np.float64).reshape((n,) + tuple(spatial_shape))
    fwd = np.fft.rfftn(eye, axes=tuple(range(1, len(spatial_shape) + 1)))
    fwd = fwd.reshape(n, k)
    fwd_r = np.ascontiguousarray(fwd.real, np.float32)
    fwd_i = np.ascontiguousarray(fwd.imag, np.float32)

    eye_k = np.eye(k, dtype=np.complex128).reshape(
        (k,) + rfft_shape)
    inv_r = np.fft.irfftn(
        eye_k.real, s=spatial_shape,
        axes=tuple(range(1, len(spatial_shape) + 1))).reshape(k, n)
    inv_i = np.fft.irfftn(
        eye_k.real * 1j, s=spatial_shape,
        axes=tuple(range(1, len(spatial_shape) + 1))).reshape(k, n)
    return (fwd_r, fwd_i, np.ascontiguousarray(inv_r, np.float32),
            np.ascontiguousarray(inv_i, np.float32))


def rdft_init(kernel):
    """Transforms an initial kernel into (real, imag) RDFT variables.

    kernel shape: (spatial..., in_channels, out_channels), rank 3..5.
    """
    kernel = jnp.asarray(kernel)
    rank = kernel.ndim
    if rank not in (3, 4, 5):
        raise ValueError(f"Kernel must have rank 3..5, got {rank}.")
    spatial_shape = kernel.shape[:-2]
    rfft_shape = tuple(spatial_shape[:-1]) + (spatial_shape[-1] // 2 + 1,)
    moved = jnp.transpose(kernel, _spatial_last(rank))  # (in, out, sp...)
    flat = moved.reshape(moved.shape[:2] + (-1,))
    fwd_r, fwd_i, _, _ = _rdft_bases(tuple(int(s) for s in spatial_shape))
    norm = float(np.prod(spatial_shape)) ** 0.5
    dot = functools.partial(
        jnp.dot, precision=jax.lax.Precision.HIGHEST)
    real = dot(flat, jnp.asarray(fwd_r)) / norm
    imag = dot(flat, jnp.asarray(fwd_i)) / norm
    return (real.reshape(moved.shape[:2] + rfft_shape),
            imag.reshape(moved.shape[:2] + rfft_shape))


def rdft_to_kernel(real, imag, spatial_shape):
    """Inverse RDFT back to a (spatial..., in, out) kernel."""
    spatial_shape = tuple(int(s) for s in spatial_shape)
    rank = len(spatial_shape) + 2
    compute_dtype = real.dtype
    if compute_dtype in (jnp.bfloat16, jnp.float16):
        real = real.astype(jnp.float32)
        imag = imag.astype(jnp.float32)
    _, _, inv_r, inv_i = _rdft_bases(spatial_shape)
    norm = float(np.prod(spatial_shape)) ** 0.5
    flat_r = real.reshape(real.shape[:2] + (-1,))
    flat_i = imag.reshape(imag.shape[:2] + (-1,))
    dot = functools.partial(
        jnp.dot, precision=jax.lax.Precision.HIGHEST)
    kernel = (dot(flat_r, jnp.asarray(inv_r))
              + dot(flat_i, jnp.asarray(inv_i))) * norm
    kernel = kernel.reshape(kernel.shape[:2] + spatial_shape)
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
