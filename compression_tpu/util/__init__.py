"""Utilities: container format, checkpointing, metrics, profiling, data."""

from compression_tpu.util.packed_tensors import PackedTensors
