"""Probability distributions for entropy modeling (reference L3 layer)."""

from compression_tpu.distributions.base import (
    Categorical,
    Distribution,
    Laplace,
    Logistic,
    MixtureSameFamily,
    Normal,
)
from compression_tpu.distributions.deep_factorized import (
    DeepFactorized,
    NoisyDeepFactorized,
)
from compression_tpu.distributions.helpers import (
    estimate_tails,
    lower_tail,
    quantization_offset,
    upper_tail,
)
from compression_tpu.distributions.round_adapters import (
    MonotonicAdapter,
    NoisyRoundAdapter,
    NoisyRoundedDeepFactorized,
    NoisyRoundedNormal,
    NoisySoftRoundAdapter,
    NoisySoftRoundedDeepFactorized,
    NoisySoftRoundedNormal,
    RoundAdapter,
    SoftRoundAdapter,
)
from compression_tpu.distributions.uniform_noise import (
    NoisyLaplace,
    NoisyLogistic,
    NoisyLogisticMixture,
    NoisyMixtureSameFamily,
    NoisyNormal,
    NoisyNormalMixture,
    UniformNoiseAdapter,
)
