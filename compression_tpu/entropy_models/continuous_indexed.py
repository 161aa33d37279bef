"""Indexed entropy models: data-dependent priors selected per element.

JAX counterpart of the reference's continuous_indexed.py: a parameterized
family of priors is sampled over a meshgrid of `index_ranges` at init to
build one CDF row per parameter combination; at runtime an `indexes` tensor
picks the row per element (hyperprior-conditioned coding, Ballé et al. 2018).
`LocationScaleIndexedEntropyModel` is the scale-table special case with the
location parameter subtracted before coding (Minnen et al., "Nonlinear
Transform Coding" Fig. 10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import jax_coder
from compression_tpu.entropy_models import continuous_base
from compression_tpu.ops import math_ops
from compression_tpu.ops import round_ops

__all__ = [
    "ContinuousIndexedEntropyModel",
    "LocationScaleIndexedEntropyModel",
]


class ContinuousIndexedEntropyModel(continuous_base.ContinuousEntropyModelBase):
    """Indexed entropy model for continuous random variables."""

    def __init__(self,
                 prior_fn,
                 index_ranges,
                 parameter_fns,
                 coding_rank,
                 channel_axis=-1,
                 compression=False,
                 stateless=False,
                 expected_grads=False,
                 tail_mass=2**-8,
                 range_coder_precision=12,
                 bottleneck_dtype=None,
                 prior_dtype=jnp.float32,
                 decode_sanity_check=True,
                 laplace_tail_mass=0.0):
        if not callable(prior_fn):
            raise TypeError("`prior_fn` must be a class or factory function.")
        for name, fn in parameter_fns.items():
            if not isinstance(name, str):
                raise TypeError("`parameter_fns` must have string keys.")
            if not callable(fn):
                raise TypeError(f"`parameter_fns['{name}']` must be callable.")

        super().__init__(
            coding_rank=coding_rank,
            compression=compression,
            stateless=stateless,
            expected_grads=expected_grads,
            tail_mass=tail_mass,
            bottleneck_dtype=bottleneck_dtype,
            laplace_tail_mass=laplace_tail_mass,
        )
        self._index_ranges = tuple(int(r) for r in index_ranges)
        if not self.index_ranges:
            raise ValueError("`index_ranges` must have at least one element.")
        self._channel_axis = (
            None if channel_axis is None else int(channel_axis))
        if self.channel_axis is None and len(self.index_ranges) > 1:
            raise ValueError(
                "`channel_axis` can't be None for len(index_ranges) > 1.")
        self._prior_fn = prior_fn
        self._parameter_fns = dict(parameter_fns)
        self._prior_dtype = prior_dtype
        self.decode_sanity_check = decode_sanity_check

        if self.compression:
            if self.channel_axis is None:
                (index_range,) = self.index_ranges
                indexes = jnp.arange(index_range, dtype=jnp.int32)
            else:
                ranges = [jnp.arange(r, dtype=jnp.int32)
                          for r in self.index_ranges]
                mesh = jnp.meshgrid(*ranges, indexing="ij")
                indexes = jnp.stack(mesh, axis=self.channel_axis)
            self._prior = self._make_prior(indexes)
            cdf, cdf_offset = self._build_tables(
                self.prior, range_coder_precision)
            self._init_compression(cdf, cdf_offset, None)

    @property
    def index_ranges(self):
        return self._index_ranges

    @property
    def parameter_fns(self):
        return self._parameter_fns

    @property
    def prior_fn(self):
        return self._prior_fn

    @property
    def prior_dtype(self):
        return self._prior_dtype

    @property
    def channel_axis(self):
        return self._channel_axis

    def _make_prior(self, indexes):
        indexes = jnp.asarray(indexes, self.prior_dtype)
        parameters = {k: f(indexes) for k, f in self.parameter_fns.items()}
        return self.prior_fn(**parameters)

    def _normalize_indexes(self, indexes):
        """Clips indexes into the valid ranges (with useful gradients)."""
        indexes = math_ops.lower_bound(indexes, 0)
        if self.channel_axis is None:
            (index_range,) = self.index_ranges
            bounds = jnp.asarray(index_range - 1, indexes.dtype)
        else:
            axes = [1] * indexes.ndim
            axes[self.channel_axis] = len(self.index_ranges)
            bounds = jnp.reshape(
                jnp.asarray([r - 1 for r in self.index_ranges],
                            indexes.dtype), axes)
        return math_ops.upper_bound(indexes, bounds)

    def _flatten_indexes(self, indexes):
        """Row-major strides over the index channels -> flat CDF row id."""
        indexes = indexes.astype(jnp.int32)
        if self.channel_axis is None:
            return indexes
        strides = np.concatenate(
            [np.cumprod(self.index_ranges[:0:-1])[::-1], [1]]).astype(
                np.int32)
        return jnp.tensordot(
            indexes, jnp.asarray(strides), [[self.channel_axis], [0]])

    def __call__(self, bottleneck, indexes, training=True, key=None, u=None):
        """Perturbs the bottleneck and estimates the bitrate."""
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
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
            bottleneck_perturbed = self.quantize(bottleneck)
            log_probs = self._log_prob(prior, bottleneck_perturbed)
        axes = tuple(range(-self.coding_rank, 0)) if self.coding_rank else ()
        bits = jnp.sum(log_probs, axis=axes) / (
            -jnp.log(jnp.asarray(2.0, log_probs.dtype)))
        return bottleneck_perturbed, bits

    def quantize(self, bottleneck):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        return round_ops.round_st(bottleneck)

    def compress(self, bottleneck, indexes):
        """Compresses with per-element CDF rows selected by indexes."""
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        batch_shape = flat_indexes.shape[
            : flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        symbols = jnp.round(bottleneck).astype(jnp.int32)
        symbols = symbols - jnp.asarray(self.cdf_offset)[flat_indexes]
        symbols2 = np.asarray(symbols.reshape(num_streams, -1))
        indexes2 = np.asarray(flat_indexes.reshape(num_streams, -1))
        buf, lengths = jax_coder.encode_streams(
            symbols2, self.device_table, indexes2)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape))

    def compress_to_strings(self, bottleneck, indexes):
        buf, lengths = self.compress(bottleneck, indexes)
        return jax_coder.to_bytes_list(
            buf.reshape(-1, buf.shape[-1]), lengths.reshape(-1))

    def decompress(self, strings_or_buf, indexes, lengths=None):
        """Decompresses using the same index tensor as compress."""
        self._check_compression()
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
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
        indexes2 = np.asarray(flat_indexes.reshape(num_streams, n))
        symbols, sanity = jax_coder.decode_streams(
            buf, lens, n, self.device_table, indexes2)
        if self.decode_sanity_check and not np.all(sanity):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        symbols = symbols + np.asarray(self.cdf_offset)[indexes2]
        return jnp.asarray(
            symbols.reshape(out_shape), self.bottleneck_dtype)


    def compress_sidecar(self, bottleneck, indexes):
        """Compresses in sidecar escape mode (TPU-native container).

        See ContinuousBatchedEntropyModel.compress_sidecar.
        """
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        batch_shape = flat_indexes.shape[
            : flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        symbols = jnp.round(bottleneck).astype(jnp.int32)
        symbols = symbols - jnp.asarray(self.cdf_offset)[flat_indexes]
        symbols2 = np.asarray(symbols.reshape(num_streams, -1))
        indexes2 = np.asarray(flat_indexes.reshape(num_streams, -1))
        buf, lengths, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
            symbols2, self.device_table, indexes2)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape), esc_pos, esc_val)

    def decompress_sidecar(self, buf, lengths, indexes, esc_pos, esc_val):
        """Decompresses sidecar-mode streams (see compress_sidecar)."""
        self._check_compression()
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        out_shape = flat_indexes.shape
        batch_shape = out_shape[: flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        n = int(np.prod(out_shape[len(batch_shape):]))
        buf = np.asarray(buf, np.uint8).reshape(num_streams, -1)
        lens = np.asarray(lengths, np.int32).reshape(num_streams)
        indexes2 = np.asarray(flat_indexes.reshape(num_streams, n))
        symbols, sanity = jax_coder.decode_streams_sidecar(
            buf, lens, n, self.device_table, esc_pos, esc_val, indexes2)
        if self.decode_sanity_check and not np.all(sanity):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        symbols = symbols + np.asarray(self.cdf_offset)[indexes2]
        return jnp.asarray(
            symbols.reshape(out_shape), self.bottleneck_dtype)

    def compress_device(self, bottleneck, indexes, max_gamma_bits=16,
                        escape_budget=64):
        """Fully traced indexed compress: runs inside jit, end to end.

        Same static escape budget contract as
        ContinuousBatchedEntropyModel.compress_device: up to
        ``escape_budget`` escaping symbols per stream, each within
        ``+-2**max_gamma_bits`` of the table range; the returned ``ok``
        reports whether the data fit.

        Returns:
          (bytes [batch..., L] uint8, lengths [batch...] int32, ok bool).
        """
        self._check_compression()
        from compression_tpu.codec.jax_coder import (
            _encode_streams_jit,
            _round_up,
        )

        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        batch_shape = flat_indexes.shape[
            : flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        symbols = jnp.round(bottleneck).astype(jnp.int32)
        symbols = symbols - jnp.asarray(self.cdf_offset)[flat_indexes]
        symbols = symbols.reshape(num_streams, -1)
        idx2 = flat_indexes.reshape(num_streams, -1)
        n = symbols.shape[1]
        table = self.device_table
        if table.any_overflow:
            slots = 2 * int(max_gamma_bits) + 3
            num_steps = _round_up(n + int(escape_budget) * slots, 64)
            len_r = table.length[idx2]
            mv = len_r - 2
            ovf_r = table.overflow[idx2]
            sign = ovf_r & (symbols < 0)
            over = ovf_r & ~sign & (symbols >= mv)
            escape = sign | over
            gamma = jnp.where(
                sign, -symbols,
                jnp.where(over, symbols - mv + 1, 1)).astype(jnp.uint32)
            count = jnp.where(
                escape,
                3 + 2 * jnp.ceil(
                    jnp.log2(gamma.astype(jnp.float32) + 1)).astype(
                        jnp.int32),
                1)
            ok = (jnp.max(jnp.sum(count, axis=1)) <= num_steps) & (
                jnp.max(jnp.where(escape, gamma, 0))
                < jnp.uint32(1 << max_gamma_bits))
        else:
            slots = 1
            num_steps = _round_up(max(n, 1), 64)
            ok = jnp.asarray(True)
        out_size = _round_up(2 * num_steps + 2, 4)
        buf, lengths = _encode_streams_jit(
            symbols, idx2, table, slots, num_steps, out_size)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape), ok)

    def decompress_device(self, src16, byte_lens, indexes):
        """Fully traced indexed decompress (runs inside jit on device)."""
        self._check_compression()
        table = self.device_table
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        out_shape = flat_indexes.shape
        batch_shape = out_shape[: flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        n = int(np.prod(out_shape[len(batch_shape):]))
        idx2 = flat_indexes.reshape(num_streams, n)
        symbols, sanity = jax_coder.decode_dispatch(
            src16, byte_lens, n, table, idx2)
        symbols = symbols + jnp.asarray(self.cdf_offset)[idx2]
        return (symbols.reshape(out_shape).astype(self.bottleneck_dtype),
                sanity)

    def compress_sidecar_device(self, bottleneck, indexes,
                                escape_budget=None):
        """Fully traced indexed sidecar compress (runs inside jit).

        See ContinuousBatchedEntropyModel.compress_sidecar_device; byte-
        identical streams to compress_sidecar.
        """
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        batch_shape = flat_indexes.shape[
            : flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        symbols = jnp.round(bottleneck).astype(jnp.int32)
        symbols = symbols - jnp.asarray(self.cdf_offset)[flat_indexes]
        symbols = symbols.reshape(num_streams, -1)
        idx2 = flat_indexes.reshape(num_streams, -1)
        n = symbols.shape[1]
        table = self.device_table
        if table.any_overflow:
            len_r = table.length[idx2]
            escape = table.overflow[idx2] & (
                (symbols < 0) | (symbols >= len_r - 2))
        else:
            escape = jnp.zeros(symbols.shape, bool)
        if escape_budget is None:
            escape_budget = jax_coder.sidecar_budget(num_streams * n)
        esc_idx, esc_val, count, ok = jax_coder.sidecar_extract(
            symbols, escape, int(escape_budget))
        num_steps = max(jax_coder._round_up(max(n, 1), 64), 64)
        out_size = jax_coder._round_up(2 * num_steps + 2, 4)
        buf, lengths = jax_coder.encode_dispatch(
            symbols, table, num_steps, out_size, indexes=idx2)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape), esc_idx, esc_val, count, ok)

    def decompress_sidecar_device(self, src16, byte_lens, indexes, esc_idx,
                                  esc_val):
        """Fully traced indexed sidecar decompress (runs inside jit)."""
        self._check_compression()
        table = self.device_table
        indexes = self._normalize_indexes(
            jnp.asarray(indexes, self.prior_dtype))
        flat_indexes = self._flatten_indexes(indexes)
        out_shape = flat_indexes.shape
        batch_shape = out_shape[: flat_indexes.ndim - self.coding_rank]
        num_streams = int(np.prod(batch_shape)) if batch_shape else 1
        n = int(np.prod(out_shape[len(batch_shape):]))
        idx2 = flat_indexes.reshape(num_streams, n)
        symbols, sanity = jax_coder.decode_dispatch(
            src16, byte_lens, n, table, idx2, in_stream_gamma=False)
        symbols = jax_coder.sidecar_apply(symbols, esc_idx, esc_val)
        symbols = symbols + jnp.asarray(self.cdf_offset)[idx2]
        return (symbols.reshape(out_shape).astype(self.bottleneck_dtype),
                sanity)


class LocationScaleIndexedEntropyModel(ContinuousIndexedEntropyModel):
    """Indexed entropy model over a table of scales, with loc shifted out."""

    def __init__(self,
                 prior_fn,
                 num_scales,
                 scale_fn,
                 coding_rank,
                 compression=False,
                 stateless=False,
                 expected_grads=False,
                 tail_mass=2**-8,
                 range_coder_precision=12,
                 bottleneck_dtype=None,
                 prior_dtype=jnp.float32,
                 laplace_tail_mass=0.0):
        num_scales = int(num_scales)
        super().__init__(
            prior_fn=prior_fn,
            index_ranges=(num_scales,),
            parameter_fns=dict(
                loc=lambda _: 0.0,
                scale=scale_fn,
            ),
            coding_rank=coding_rank,
            channel_axis=None,
            compression=compression,
            stateless=stateless,
            expected_grads=expected_grads,
            tail_mass=tail_mass,
            range_coder_precision=range_coder_precision,
            bottleneck_dtype=bottleneck_dtype,
            prior_dtype=prior_dtype,
            laplace_tail_mass=laplace_tail_mass,
        )

    def __call__(self, bottleneck, scale_indexes, loc=None, training=True,
                 key=None, u=None):
        if loc is None:
            return super().__call__(
                bottleneck, scale_indexes, training=training, key=key, u=u)
        bottleneck, bits = super().__call__(
            bottleneck - loc, scale_indexes, training=training, key=key, u=u)
        return bottleneck + loc, bits

    def quantize(self, bottleneck, loc=None):
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        return round_ops.round_st(bottleneck, loc)

    def compress(self, bottleneck, scale_indexes, loc=None):
        if loc is not None:
            bottleneck = bottleneck - loc
        return super().compress(bottleneck, scale_indexes)

    def compress_to_strings(self, bottleneck, scale_indexes, loc=None):
        buf, lengths = self.compress(bottleneck, scale_indexes, loc)
        return jax_coder.to_bytes_list(
            buf.reshape(-1, buf.shape[-1]), lengths.reshape(-1))

    def decompress(self, strings_or_buf, scale_indexes, loc=None,
                   lengths=None):
        values = super().decompress(strings_or_buf, scale_indexes,
                                    lengths=lengths)
        if loc is not None:
            values = values + loc
        return values

    def compress_sidecar(self, bottleneck, scale_indexes, loc=None):
        if loc is not None:
            bottleneck = bottleneck - loc
        return super().compress_sidecar(bottleneck, scale_indexes)

    def decompress_sidecar(self, buf, lengths, scale_indexes, esc_pos,
                           esc_val, loc=None):
        values = super().decompress_sidecar(
            buf, lengths, scale_indexes, esc_pos, esc_val)
        if loc is not None:
            values = values + loc
        return values

    def compress_device(self, bottleneck, scale_indexes, loc=None,
                        max_gamma_bits=16, escape_budget=64):
        """Fully traced loc/scale compress (runs inside jit on device)."""
        if loc is not None:
            bottleneck = bottleneck - loc
        return super().compress_device(
            bottleneck, scale_indexes, max_gamma_bits=max_gamma_bits,
            escape_budget=escape_budget)

    def decompress_device(self, src16, byte_lens, scale_indexes, loc=None):
        """Fully traced loc/scale decompress (runs inside jit on device)."""
        values, sanity = super().decompress_device(
            src16, byte_lens, scale_indexes)
        if loc is not None:
            values = values + loc
        return values, sanity

    def compress_sidecar_device(self, bottleneck, scale_indexes, loc=None,
                                escape_budget=None):
        """Fully traced loc/scale sidecar compress (runs inside jit)."""
        if loc is not None:
            bottleneck = bottleneck - loc
        return super().compress_sidecar_device(
            bottleneck, scale_indexes, escape_budget=escape_budget)

    def decompress_sidecar_device(self, src16, byte_lens, scale_indexes,
                                  esc_idx, esc_val, loc=None):
        """Fully traced loc/scale sidecar decompress (runs inside jit)."""
        values, sanity = super().decompress_sidecar_device(
            src16, byte_lens, scale_indexes, esc_idx, esc_val)
        if loc is not None:
            values = values + loc
        return values, sanity
