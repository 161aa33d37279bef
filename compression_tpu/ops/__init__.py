"""Low-level ops (reference L2 layer): math, rounding, padding."""

from compression_tpu.ops.math_ops import lower_bound, perturb_and_apply, upper_bound
from compression_tpu.ops.padding_ops import same_padding_for_kernel
from compression_tpu.ops.round_ops import (
    round_st,
    soft_round,
    soft_round_conditional_mean,
    soft_round_inverse,
)
