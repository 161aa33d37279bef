"""Entropy models (reference L4 layer)."""

from compression_tpu.entropy_models.continuous_base import ContinuousEntropyModelBase
from compression_tpu.entropy_models.continuous_batched import ContinuousBatchedEntropyModel
from compression_tpu.entropy_models.continuous_indexed import (
    ContinuousIndexedEntropyModel,
    LocationScaleIndexedEntropyModel,
)
