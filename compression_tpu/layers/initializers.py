"""Kernel initializers (reference python/layers/initializers.py:25-55)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["identity_initializer"]


def identity_initializer(gain=1.0):
    """n-D Dirac kernel initializer for SignalConv.

    Produces a kernel that (away from boundaries) passes its input through
    unchanged: a spatial delta at the kernel center times the channel
    identity.
    """

    def init(key, shape, dtype=jnp.float32):
        del key
        if len(shape) <= 2:
            raise ValueError(f"shape must be at least rank 3, got {shape}.")
        support = shape[:-2]
        spatial = jnp.zeros(support + (1, 1), dtype)
        center = tuple(s // 2 for s in support) + (0, 0)
        spatial = spatial.at[center].set(gain)
        return spatial * jnp.eye(shape[-2], shape[-1], dtype=dtype)

    return init
