"""Power-law entropy model (table-free, run-length gamma coded).

JAX counterpart of the reference's power_law.py: the training penalty is
``log((|x| + alpha) / alpha)`` (the code length of an Elias gamma code up to
a constant), and compression applies the run-length gamma code per coding
unit.  No range-coding tables are involved.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from compression_tpu.ops import round_ops
from compression_tpu.ops import run_length

__all__ = ["PowerLawEntropyModel"]


class PowerLawEntropyModel:
    """Entropy model for power-law distributed random variables."""

    def __init__(self, coding_rank, alpha=1e-2, bottleneck_dtype=jnp.float32):
        self._coding_rank = int(coding_rank)
        if self.coding_rank < 0:
            raise ValueError("`coding_rank` must be at least 0.")
        self._alpha = float(alpha)
        if self._alpha <= 0:
            raise ValueError("`alpha` must be greater than 0.")
        self._bottleneck_dtype = bottleneck_dtype

    @property
    def alpha(self):
        return self._alpha

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
        penalty = jnp.log((jnp.abs(bottleneck) + self.alpha) / self.alpha)
        axes = tuple(range(-self.coding_rank, 0)) if self.coding_rank else ()
        return jnp.sum(penalty, axis=axes)

    def quantize(self, bottleneck):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        return round_ops.round_st(bottleneck)

    def compress(self, bottleneck) -> list[bytes]:
        """Returns one run-length-gamma string per coding unit."""
        bottleneck = np.asarray(bottleneck)
        shape = bottleneck.shape
        if self.coding_rank == 0:
            flat = np.round(bottleneck).astype(np.int32).reshape(-1, 1)
        else:
            unit = int(np.prod(shape[len(shape) - self.coding_rank:]))
            flat = np.round(bottleneck).astype(np.int32).reshape(-1, unit)
        return [run_length.run_length_gamma_encode(row) for row in flat]

    def decompress(self, strings, code_shape):
        """Inverse of compress; returns float tensor [len(strings), *shape]."""
        code_shape = tuple(int(s) for s in code_shape)
        out = np.stack([
            run_length.run_length_gamma_decode(s, code_shape)
            for s in strings])
        return jnp.asarray(out, self.bottleneck_dtype)
