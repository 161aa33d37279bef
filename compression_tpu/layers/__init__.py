"""NN building blocks (reference L5 layer)."""

from compression_tpu.layers.gdn import GDN
from compression_tpu.layers.initializers import identity_initializer
from compression_tpu.layers.signal_conv import (
    SignalConv1D,
    SignalConv2D,
    SignalConv3D,
    signal_conv,
)
from compression_tpu.layers.soft_round import SoftRound, SoftRoundConditionalMean
