"""compression_tpu: TPU-native learned data compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
tensorflow/compression: bit-exact range coding (vectorized multi-stream on
TPU), entropy models, compression-specific NN layers, and end-to-end neural
image codecs (bls2017, bmshj2018, ms2020, HiFiC).

Top-level namespace mirrors the reference's `tfc` package surface.
"""

# Codec core.
from compression_tpu.codec import jax_coder, legacy, reference, stream, tables
from compression_tpu.codec.jax_coder import (
    DeviceCdfTable,
    decode_streams,
    encode_streams,
)
from compression_tpu.codec.tables import CdfTable, pmf_to_quantized_cdf

# Distributions.
from compression_tpu.distributions import (
    Categorical,
    DeepFactorized,
    Distribution,
    Laplace,
    Logistic,
    MixtureSameFamily,
    MonotonicAdapter,
    NoisyDeepFactorized,
    NoisyLaplace,
    NoisyLogistic,
    NoisyLogisticMixture,
    NoisyMixtureSameFamily,
    NoisyNormal,
    NoisyNormalMixture,
    NoisyRoundAdapter,
    NoisyRoundedDeepFactorized,
    NoisyRoundedNormal,
    NoisySoftRoundAdapter,
    NoisySoftRoundedDeepFactorized,
    NoisySoftRoundedNormal,
    Normal,
    RoundAdapter,
    SoftRoundAdapter,
    UniformNoiseAdapter,
    estimate_tails,
    lower_tail,
    quantization_offset,
    upper_tail,
)

# Entropy models.
from compression_tpu.entropy_models import (
    ContinuousBatchedEntropyModel,
    ContinuousEntropyModelBase,
    ContinuousIndexedEntropyModel,
    LaplaceEntropyModel,
    LocationScaleIndexedEntropyModel,
    PowerLawEntropyModel,
    UniversalBatchedEntropyModel,
    UniversalIndexedEntropyModel,
)

# Layers.
from compression_tpu.layers import (
    GDN,
    SignalConv1D,
    SignalConv2D,
    SignalConv3D,
    SoftRound,
    SoftRoundConditionalMean,
    identity_initializer,
    signal_conv,
)

# Ops.
from compression_tpu.ops import (
    lower_bound,
    perturb_and_apply,
    round_st,
    same_padding_for_kernel,
    soft_round,
    soft_round_conditional_mean,
    soft_round_inverse,
    upper_bound,
)
from compression_tpu.ops.quantization import stochastic_round
from compression_tpu.ops.run_length import (
    run_length_decode,
    run_length_encode,
    run_length_gamma_decode,
    run_length_gamma_encode,
)

# Util.
from compression_tpu.util.packed_tensors import PackedTensors

__version__ = "0.1.0"
