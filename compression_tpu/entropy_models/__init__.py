"""Entropy models (reference L4 layer)."""

from compression_tpu.entropy_models.continuous_base import ContinuousEntropyModelBase
from compression_tpu.entropy_models.continuous_batched import ContinuousBatchedEntropyModel
from compression_tpu.entropy_models.continuous_indexed import (
    ContinuousIndexedEntropyModel,
    LocationScaleIndexedEntropyModel,
)
from compression_tpu.entropy_models.laplace import LaplaceEntropyModel
from compression_tpu.entropy_models.power_law import PowerLawEntropyModel
from compression_tpu.entropy_models.universal import (
    UniversalBatchedEntropyModel,
    UniversalIndexedEntropyModel,
)
