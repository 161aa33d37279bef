"""Soft-round layers (reference python/layers/soft_round.py:27-56)."""

from __future__ import annotations

import flax.linen as nn

from compression_tpu.ops import round_ops

__all__ = ["SoftRound", "SoftRoundConditionalMean"]


class SoftRound(nn.Module):
    """Differentiable approximation of rounding (or its inverse)."""

    alpha: float = 5.0
    inverse: bool = False

    def __call__(self, inputs):
        fn = (round_ops.soft_round_inverse if self.inverse
              else round_ops.soft_round)
        return fn(inputs, self.alpha)


class SoftRoundConditionalMean(nn.Module):
    """Conditional mean of inputs given noisy soft-rounded values."""

    alpha: float = 5.0

    def __call__(self, inputs):
        return round_ops.soft_round_conditional_mean(inputs, self.alpha)
