"""Laplace entropy model (L1 penalty + run-length Rice/gamma code).

JAX counterpart of the reference's laplace.py: the penalty
``l1 * sum(|x|)`` encourages a symmetric Laplace distribution, which the
run-length code with Rice-coded magnitudes compresses well.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from compression_tpu.ops import round_ops
from compression_tpu.ops import run_length

__all__ = ["LaplaceEntropyModel"]


class LaplaceEntropyModel:
    """Entropy model for Laplace distributed random variables."""

    def __init__(self, coding_rank, l1=0.01, run_length_code=-1,
                 magnitude_code=0, use_run_length_for_non_zeros=False,
                 bottleneck_dtype=jnp.float32):
        self._coding_rank = int(coding_rank)
        if self.coding_rank < 0:
            raise ValueError("`coding_rank` must be at least 0.")
        self._l1 = float(l1)
        if self._l1 <= 0:
            raise ValueError("`l1` must be greater than 0.")
        self._run_length_code = int(run_length_code)
        self._magnitude_code = int(magnitude_code)
        self._use_run_length_for_non_zeros = bool(use_run_length_for_non_zeros)
        self._bottleneck_dtype = bottleneck_dtype

    @property
    def l1(self):
        return self._l1

    @property
    def run_length_code(self):
        return self._run_length_code

    @property
    def magnitude_code(self):
        return self._magnitude_code

    @property
    def use_run_length_for_non_zeros(self):
        return self._use_run_length_for_non_zeros

    @property
    def bottleneck_dtype(self):
        return self._bottleneck_dtype

    @property
    def coding_rank(self):
        return self._coding_rank

    def __call__(self, bottleneck):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        return self.quantize(bottleneck), self.penalty(bottleneck)

    def penalty(self, bottleneck):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        axes = tuple(range(-self.coding_rank, 0)) if self.coding_rank else ()
        return self.l1 * jnp.sum(jnp.abs(bottleneck), axis=axes)

    def quantize(self, bottleneck):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        return round_ops.round_st(bottleneck)

    def compress(self, bottleneck) -> list[bytes]:
        bottleneck = np.asarray(bottleneck)
        shape = bottleneck.shape
        if self.coding_rank == 0:
            flat = np.round(bottleneck).astype(np.int32).reshape(-1, 1)
        else:
            unit = int(np.prod(shape[len(shape) - self.coding_rank:]))
            flat = np.round(bottleneck).astype(np.int32).reshape(-1, unit)
        return [
            run_length.run_length_encode(
                row, self.run_length_code, self.magnitude_code,
                self.use_run_length_for_non_zeros)
            for row in flat]

    def decompress(self, strings, code_shape):
        code_shape = tuple(int(s) for s in code_shape)
        out = np.stack([
            run_length.run_length_decode(
                s, code_shape, self.run_length_code, self.magnitude_code,
                self.use_run_length_for_non_zeros)
            for s in strings])
        return jnp.asarray(out, self.bottleneck_dtype)
