"""Universal quantization entropy models (Agustsson & Theis 2020, §3.2).

JAX counterpart of the reference's universal.py: quantization offsets are
replaced by per-element pseudo-random dither levels drawn from a fixed-seed
RNG shared bit-exactly between encoder and decoder (the shared source of
randomness; reference universal.py:30-41 uses a stateless seed (1234,1234)).
The dither level becomes an extra leading index dimension of the CDF table
(num_noise_levels rows per prior row).

Note: the dither stream is deterministic given the element positions, so
compress/decompress stay in sync without transmitting it.  The stream is
the EXACT Philox4x32-10 sequence of ``tf.random.stateless_uniform`` with
seed (1234, 1234) (util/philox.py, verified bit-exact against TF), so
dither levels — and therefore compressed bytes — agree with the reference
implementation for identical call shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import jax_coder
from compression_tpu.entropy_models import continuous_base
from compression_tpu.ops import math_ops
from compression_tpu.util import philox

__all__ = [
    "UniversalBatchedEntropyModel",
    "UniversalIndexedEntropyModel",
]

_DITHER_KEY = (1234, 1234)


@functools.lru_cache(maxsize=64)
def _offset_indexes_np(shape, num_noise_levels):
    return philox.stateless_uniform_int32(
        shape, _DITHER_KEY, 0, num_noise_levels)


def _offset_indexes(shape, num_noise_levels):
    """Deterministic pseudo-random dither level per element position.

    Counter-based (Philox), so the whole array is generated in one
    vectorized host pass and becomes a compile-time constant under jit.
    """
    shape = tuple(int(s) for s in shape)
    return jnp.asarray(_offset_indexes_np(shape, num_noise_levels))


def _offset_indexes_to_offset(offset_indexes, num_noise_levels, dtype):
    return ((offset_indexes.astype(dtype) + 1)
            / (num_noise_levels + 1) - 0.5)


def _range_coding_offsets(num_noise_levels, prior_shape, dtype):
    """Leading dither-level axis of quantization offsets for table build."""
    offset_indexes = jnp.arange(num_noise_levels, dtype=dtype)
    offset_indexes = offset_indexes.reshape(
        (-1,) + (1,) * len(prior_shape))
    return _offset_indexes_to_offset(offset_indexes, num_noise_levels, dtype)


class UniversalBatchedEntropyModel(continuous_base.ContinuousEntropyModelBase):
    """Batched entropy model with universal (dithered) quantization."""

    def __init__(self,
                 prior,
                 coding_rank,
                 compression=False,
                 stateless=False,
                 expected_grads=False,
                 tail_mass=2**-8,
                 range_coder_precision=12,
                 bottleneck_dtype=None,
                 num_noise_levels=15,
                 decode_sanity_check=True,
                 laplace_tail_mass=0.0):
        super().__init__(
            coding_rank=coding_rank,
            compression=compression,
            stateless=stateless,
            expected_grads=expected_grads,
            tail_mass=tail_mass,
            bottleneck_dtype=bottleneck_dtype,
            laplace_tail_mass=laplace_tail_mass,
        )
        self._prior = prior
        self._num_noise_levels = int(num_noise_levels)
        self._prior_shape = tuple(int(s) for s in prior.batch_shape)
        if self.coding_rank < len(self.prior_shape):
            raise ValueError(
                "`coding_rank` can't be smaller than prior rank.")
        self.decode_sanity_check = decode_sanity_check

        if self.compression:
            offset = _range_coding_offsets(
                self._num_noise_levels, self.prior_shape,
                self.bottleneck_dtype)
            cdf, cdf_offset = self._build_tables(
                self.prior, range_coder_precision, offset=offset)
            self._init_compression(cdf, cdf_offset, None)

    @property
    def prior_shape(self):
        return self._prior_shape

    def _compute_indexes_and_offset(self, broadcast_shape):
        """Flat CDF row ids + dither offsets for a full bottleneck shape."""
        prior_size = int(np.prod(self.prior_shape)) if self.prior_shape else 1
        full_shape = tuple(broadcast_shape) + (prior_size,)
        prior_idx = jnp.broadcast_to(
            jnp.arange(prior_size, dtype=jnp.int32), full_shape)
        offset_idx = _offset_indexes(full_shape, self._num_noise_levels)
        indexes = offset_idx * prior_size + prior_idx
        offset = _offset_indexes_to_offset(
            offset_idx, self._num_noise_levels, self.bottleneck_dtype)
        out_shape = tuple(broadcast_shape) + self.prior_shape
        return indexes.reshape(out_shape), offset.reshape(out_shape)

    def __call__(self, bottleneck, training=True, key=None, u=None):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        log_prob_fn = functools.partial(self._log_prob, self.prior)
        if training:
            if u is None and key is None:
                raise ValueError("Training mode needs `key` or `u`.")
            log_probs, bottleneck_perturbed = math_ops.perturb_and_apply(
                log_prob_fn, bottleneck, key=key, u=u,
                expected_grads=self.expected_grads)
        else:
            input_shape = bottleneck.shape
            coding_shape = input_shape[len(input_shape) - self.coding_rank:]
            broadcast_shape = coding_shape[
                : self.coding_rank - len(self.prior_shape)]
            _, offset = self._compute_indexes_and_offset(broadcast_shape)
            symbols = jnp.round(bottleneck - offset)
            bottleneck_perturbed = symbols + offset
            log_probs = log_prob_fn(bottleneck_perturbed)
        axes = tuple(range(-self.coding_rank, 0)) if self.coding_rank else ()
        bits = jnp.sum(log_probs, axis=axes) / (
            -jnp.log(jnp.asarray(2.0, log_probs.dtype)))
        return bottleneck_perturbed, bits

    def compress(self, bottleneck):
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        input_shape = bottleneck.shape
        batch_rank = len(input_shape) - self.coding_rank
        batch_shape = input_shape[:batch_rank]
        broadcast_shape = input_shape[
            batch_rank: len(input_shape) - len(self.prior_shape)]
        indexes, offset = self._compute_indexes_and_offset(broadcast_shape)
        symbols = jnp.round(bottleneck - offset).astype(jnp.int32)
        symbols = symbols - jnp.asarray(self.cdf_offset)[indexes]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        sym2 = np.asarray(symbols.reshape(num_streams, -1))
        idx2 = np.broadcast_to(
            np.asarray(indexes).reshape(1, -1), sym2.shape)
        buf, lengths = jax_coder.encode_streams(
            sym2, self.device_table, idx2)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape))

    def compress_to_strings(self, bottleneck):
        buf, lengths = self.compress(bottleneck)
        return jax_coder.to_bytes_list(
            buf.reshape(-1, buf.shape[-1]), lengths.reshape(-1))

    def decompress(self, strings_or_buf, broadcast_shape, lengths=None):
        self._check_compression()
        broadcast_shape = tuple(int(s) for s in broadcast_shape)
        if lengths is None:
            buf, lens = jax_coder.from_bytes_list(list(strings_or_buf))
            batch_shape = (len(lens),)
        else:
            buf = np.asarray(strings_or_buf, np.uint8)
            lens = np.asarray(lengths, np.int32)
            batch_shape = lens.shape
            buf = buf.reshape(-1, buf.shape[-1])
            lens = lens.reshape(-1)
        indexes, offset = self._compute_indexes_and_offset(broadcast_shape)
        n = int(np.prod(indexes.shape))
        idx2 = np.broadcast_to(
            np.asarray(indexes).reshape(1, n), (len(lens), n))
        symbols, sanity = jax_coder.decode_streams(
            buf, lens, n, self.device_table, idx2)
        if self.decode_sanity_check and not np.all(sanity):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        symbols = symbols + np.asarray(self.cdf_offset)[idx2]
        out_shape = batch_shape + broadcast_shape + self.prior_shape
        outputs = jnp.asarray(
            symbols.reshape(out_shape), self.bottleneck_dtype)
        return outputs + offset[None]


class UniversalIndexedEntropyModel(continuous_base.ContinuousEntropyModelBase):
    """Indexed entropy model with universal (dithered) quantization."""

    def __init__(self,
                 prior_fn,
                 index_ranges,
                 parameter_fns,
                 coding_rank,
                 compression=False,
                 stateless=False,
                 expected_grads=False,
                 tail_mass=2**-8,
                 range_coder_precision=12,
                 bottleneck_dtype=None,
                 prior_dtype=jnp.float32,
                 num_noise_levels=15,
                 decode_sanity_check=True,
                 laplace_tail_mass=0.0):
        if coding_rank <= 0:
            raise ValueError("`coding_rank` must be larger than 0.")
        super().__init__(
            coding_rank=coding_rank,
            compression=compression,
            stateless=stateless,
            expected_grads=expected_grads,
            tail_mass=tail_mass,
            bottleneck_dtype=bottleneck_dtype,
            laplace_tail_mass=laplace_tail_mass,
        )
        # Leading index range is the dither level.
        self._index_ranges = tuple(
            [int(num_noise_levels)] + [int(r) for r in index_ranges])
        self._prior_fn = prior_fn
        self._parameter_fns = dict(parameter_fns)
        self._prior_dtype = prior_dtype
        self._num_noise_levels = int(num_noise_levels)
        self.decode_sanity_check = decode_sanity_check

        if self.compression:
            ranges = [jnp.arange(r, dtype=jnp.int32)
                      for r in self.index_ranges_without_offsets]
            mesh = jnp.meshgrid(*ranges, indexing="ij")
            indexes = jnp.stack(mesh, axis=-1)
            self._prior = self._make_prior(indexes)
            offset = _range_coding_offsets(
                self._num_noise_levels, self.prior.batch_shape,
                self.bottleneck_dtype)
            cdf, cdf_offset = self._build_tables(
                self.prior, range_coder_precision, offset=offset)
            self._init_compression(cdf, cdf_offset, None)

    @property
    def index_ranges(self):
        return self._index_ranges

    @property
    def index_ranges_without_offsets(self):
        return self._index_ranges[1:]

    def _make_prior(self, indexes):
        indexes = jnp.asarray(indexes, self._prior_dtype)
        parameters = {k: f(indexes) for k, f in self._parameter_fns.items()}
        return self._prior_fn(**parameters)

    def _add_offset_indexes(self, indexes):
        shape = indexes.shape[:-1]
        offset_idx = _offset_indexes(shape, self._num_noise_levels)
        return jnp.concatenate(
            [offset_idx[..., None].astype(indexes.dtype), indexes], axis=-1)

    def _normalize_indexes(self, indexes):
        indexes = math_ops.lower_bound(indexes, 0)
        axes = [1] * indexes.ndim
        axes[-1] = len(self.index_ranges)
        bounds = jnp.reshape(
            jnp.asarray([r - 1 for r in self.index_ranges], indexes.dtype),
            axes)
        return math_ops.upper_bound(indexes, bounds)

    def _flatten_indexes(self, indexes):
        indexes = indexes.astype(jnp.int32)
        strides = np.concatenate(
            [np.cumprod(np.asarray(self.index_ranges)[:0:-1])[::-1],
             [1]]).astype(np.int32)
        return jnp.tensordot(indexes, jnp.asarray(strides), [[-1], [0]])

    def __call__(self, bottleneck, indexes, training=True, key=None, u=None):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = jnp.asarray(indexes, self._prior_dtype)
        if training:
            if u is None and key is None:
                raise ValueError("Training mode needs `key` or `u`.")

            def log_prob_fn(bottleneck_perturbed, idx):
                prior = self._make_prior(idx)
                return self._log_prob(prior, bottleneck_perturbed)

            log_probs, bottleneck_perturbed = math_ops.perturb_and_apply(
                log_prob_fn, bottleneck, indexes, key=key, u=u,
                expected_grads=self.expected_grads)
        else:
            prior = self._make_prior(indexes)
            offset_idx = _offset_indexes(
                bottleneck.shape, self._num_noise_levels)
            offset = _offset_indexes_to_offset(
                offset_idx, self._num_noise_levels, self.bottleneck_dtype)
            symbols = jnp.round(bottleneck - offset)
            bottleneck_perturbed = symbols + offset
            log_probs = self._log_prob(prior, bottleneck_perturbed)
        axes = tuple(range(-self.coding_rank, 0))
        bits = jnp.sum(log_probs, axis=axes) / (
            -jnp.log(jnp.asarray(2.0, log_probs.dtype)))
        return bottleneck_perturbed, bits

    def compress(self, bottleneck, indexes):
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = self._add_offset_indexes(
            jnp.asarray(indexes, self._prior_dtype))
        indexes = self._normalize_indexes(indexes)
        flat_indexes = self._flatten_indexes(indexes)
        offset = _offset_indexes_to_offset(
            indexes[..., 0], self._num_noise_levels, self.bottleneck_dtype)
        batch_shape = flat_indexes.shape[
            : flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        symbols = jnp.round(bottleneck - offset).astype(jnp.int32)
        symbols = symbols - jnp.asarray(self.cdf_offset)[flat_indexes]
        buf, lengths = jax_coder.encode_streams(
            np.asarray(symbols.reshape(num_streams, -1)),
            self.device_table,
            np.asarray(flat_indexes.reshape(num_streams, -1)))
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape))

    def compress_to_strings(self, bottleneck, indexes):
        buf, lengths = self.compress(bottleneck, indexes)
        return jax_coder.to_bytes_list(
            buf.reshape(-1, buf.shape[-1]), lengths.reshape(-1))

    def decompress(self, strings_or_buf, indexes, lengths=None):
        self._check_compression()
        indexes = self._add_offset_indexes(
            jnp.asarray(indexes, self._prior_dtype))
        indexes = self._normalize_indexes(indexes)
        flat_indexes = self._flatten_indexes(indexes)
        offset = _offset_indexes_to_offset(
            indexes[..., 0], self._num_noise_levels, self.bottleneck_dtype)
        out_shape = flat_indexes.shape
        batch_shape = out_shape[: flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        n = int(np.prod(out_shape[len(batch_shape):]))
        if lengths is None:
            buf, lens = jax_coder.from_bytes_list(list(strings_or_buf))
        else:
            buf = np.asarray(strings_or_buf, np.uint8).reshape(
                num_streams, -1)
            lens = np.asarray(lengths, np.int32).reshape(num_streams)
        idx2 = np.asarray(flat_indexes.reshape(num_streams, n))
        symbols, sanity = jax_coder.decode_streams(
            buf, lens, n, self.device_table, idx2)
        if self.decode_sanity_check and not np.all(sanity):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        symbols = symbols + np.asarray(self.cdf_offset)[idx2]
        return (jnp.asarray(symbols.reshape(out_shape),
                            self.bottleneck_dtype) + offset)
