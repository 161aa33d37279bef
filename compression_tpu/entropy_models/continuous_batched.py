"""Batched entropy model for continuous random variables.

JAX counterpart of the reference's continuous_batched.py (Ballé et al. 2017,
"End-to-end Optimized Image Compression"): data-independent prior, one CDF
row per prior batch element, innermost ``coding_rank`` dimensions compressed
into one bit string each.

Differences from the reference API (TPU/JAX-native):
  * `__call__` takes an explicit PRNG `key` for the training noise.
  * `compress` returns a padded (bytes, lengths) pair from the vectorized
    TPU coder; `compress_to_strings` gives Python bytes objects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import jax_coder
from compression_tpu.distributions import helpers
from compression_tpu.entropy_models import continuous_base
from compression_tpu.ops import math_ops
from compression_tpu.ops import round_ops

__all__ = ["ContinuousBatchedEntropyModel"]


class ContinuousBatchedEntropyModel(continuous_base.ContinuousEntropyModelBase):
    """Batched entropy model: shared prior, data-independent CDF rows."""

    def __init__(self,
                 prior=None,
                 coding_rank=None,
                 compression=False,
                 stateless=False,
                 expected_grads=False,
                 tail_mass=2**-8,
                 range_coder_precision=12,
                 bottleneck_dtype=None,
                 prior_shape=None,
                 cdf=None,
                 cdf_offset=None,
                 cdf_shapes=None,
                 offset_heuristic=True,
                 quantization_offset=None,
                 decode_sanity_check=True,
                 laplace_tail_mass=0.0):
        if (prior is None) == (prior_shape is None):
            raise ValueError("Either `prior` or `prior_shape` must be provided.")
        if (prior is None) + (cdf_shapes is None) + (cdf is None) != 2:
            raise ValueError(
                "Must provide exactly one of `prior`, `cdf`, or `cdf_shapes`.")
        if not compression and not (
                cdf is None and cdf_offset is None and cdf_shapes is None):
            raise ValueError("CDFs can't be provided with `compression=False`")

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
        self._offset_heuristic = bool(offset_heuristic)
        self._prior_shape = tuple(
            int(s) for s in
            (prior_shape if prior is None else prior.batch_shape))
        if self.coding_rank < len(self.prior_shape):
            raise ValueError("`coding_rank` can't be smaller than prior rank.")
        self.decode_sanity_check = decode_sanity_check

        if cdf_shapes is not None:
            # Deserialization path: placeholder offset depending on a bool.
            assert isinstance(quantization_offset, bool)
            assert self.compression
            if quantization_offset:
                quantization_offset = jnp.zeros(
                    self.prior_shape, self.bottleneck_dtype)
            else:
                quantization_offset = None
        elif quantization_offset is not None:
            pass  # provided manually
        elif self.offset_heuristic and self.compression:
            if self._prior is None:
                raise ValueError(
                    "To use the offset heuristic, a `prior` must be provided.")
            quantization_offset = helpers.quantization_offset(self.prior)
            if np.all(np.asarray(quantization_offset) == 0.0):
                quantization_offset = None
            else:
                quantization_offset = jnp.broadcast_to(
                    quantization_offset, self.prior_shape)
        else:
            quantization_offset = None

        if quantization_offset is None:
            self._quantization_offset = None
        else:
            self._quantization_offset = jnp.asarray(
                quantization_offset, self.bottleneck_dtype)

        if self.compression:
            if cdf is None and cdf_shapes is None:
                cdf, cdf_offset = self._build_tables(
                    self.prior, range_coder_precision,
                    offset=quantization_offset)
            self._init_compression(cdf, cdf_offset, cdf_shapes)

    @property
    def prior_shape(self):
        return self._prior_shape

    @property
    def offset_heuristic(self):
        return self._offset_heuristic

    @property
    def quantization_offset(self):
        if self._quantization_offset is not None:
            return self._quantization_offset
        if self.offset_heuristic and not self.compression:
            if self._prior is None:
                raise RuntimeError(
                    "To use the offset heuristic, a `prior` must be provided.")
            return jnp.asarray(
                helpers.quantization_offset(self.prior),
                self.bottleneck_dtype)
        return None

    def __call__(self, bottleneck, training=True, key=None, u=None):
        """Perturbs the bottleneck and estimates the bitrate.

        Args:
          bottleneck: data to compress; innermost dims broadcastable to
            prior_shape, at least coding_rank dims.
          training: True gives the differentiable noisy upper bound; False
            gives the Shannon information of the quantized tensor.
          key: PRNG key for the additive noise (training only).
          u: optional explicit noise (alternative to key).

        Returns:
          (bottleneck_perturbed, bits); bits sums over the coding_rank
          innermost dimensions.
        """
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        log_prob_fn = functools.partial(self._log_prob, self.prior)
        if training:
            if u is None and key is None:
                raise ValueError("Training mode needs `key` or `u`.")
            log_probs, bottleneck_perturbed = math_ops.perturb_and_apply(
                log_prob_fn, bottleneck, key=key, u=u,
                expected_grads=self.expected_grads)
        else:
            bottleneck_perturbed = self.quantize(bottleneck)
            log_probs = log_prob_fn(bottleneck_perturbed)
        axes = tuple(range(-self.coding_rank, 0)) if self.coding_rank else ()
        bits = jnp.sum(log_probs, axis=axes) / (
            -jnp.log(jnp.asarray(2.0, log_probs.dtype)))
        return bottleneck_perturbed, bits

    def quantize(self, bottleneck):
        """Rounds to integers (shifted by the quantization offset);
        straight-through gradient."""
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        return round_ops.round_st(bottleneck, self.quantization_offset)

    def _symbols_from_bottleneck(self, bottleneck):
        input_shape = bottleneck.shape
        batch_rank = len(input_shape) - self.coding_rank
        batch_shape = input_shape[:batch_rank]
        offset = self.quantization_offset
        if offset is not None:
            bottleneck = bottleneck - offset
        symbols = jnp.round(bottleneck).astype(jnp.int32)
        # [num_streams, elements/stream]; element index cycles through the
        # flattened prior shape, matching channel-mode CDF row addressing.
        symbols = symbols.reshape(
            int(np.prod(batch_shape) if batch_shape else 1), -1)
        cdf_offset = jnp.asarray(self.cdf_offset)
        num_rows = cdf_offset.shape[0]
        n = symbols.shape[1]
        row_ids = jnp.arange(n, dtype=jnp.int32) % num_rows
        symbols = symbols - cdf_offset[row_ids][None, :]
        return symbols, batch_shape

    def compress(self, bottleneck):
        """Compresses to (padded byte buffer [S, L], lengths [S]).

        The innermost coding_rank dims become one range-coded string per
        coding unit; leading dims are batch (stream) dims.
        """
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        symbols, batch_shape = self._symbols_from_bottleneck(bottleneck)
        buf, lengths = jax_coder.encode_streams(
            np.asarray(symbols), self.device_table)
        return buf.reshape(batch_shape + buf.shape[-1:]), lengths.reshape(
            batch_shape)

    def compress_to_strings(self, bottleneck):
        """Compresses to a flat list of bytes objects (one per coding unit)."""
        buf, lengths = self.compress(bottleneck)
        flat_buf = buf.reshape(-1, buf.shape[-1])
        flat_len = lengths.reshape(-1)
        return jax_coder.to_bytes_list(flat_buf, flat_len)

    def decompress(self, strings_or_buf, broadcast_shape, lengths=None):
        """Decompresses bit strings back to the quantized bottleneck.

        Args:
          strings_or_buf: list of bytes, or padded uint8 buffer [S..., L]
            (with `lengths`).
          broadcast_shape: shape between the batch dims and prior_shape.

        Returns:
          Dequantized tensor of shape batch + broadcast + prior_shape.
        """
        self._check_compression()
        broadcast_shape = tuple(int(s) for s in broadcast_shape)
        if lengths is None:
            strings = list(strings_or_buf)
            buf, lens = jax_coder.from_bytes_list(strings)
            batch_shape = (len(strings),)
        else:
            buf = np.asarray(strings_or_buf, np.uint8)
            lens = np.asarray(lengths, np.int32)
            batch_shape = lens.shape
            buf = buf.reshape(-1, buf.shape[-1])
            lens = lens.reshape(-1)
        num_rows = int(self.cdf_offset.shape[0])
        n = int(np.prod(broadcast_shape)) * int(np.prod(self.prior_shape))
        symbols, sanity = jax_coder.decode_streams(
            buf, lens, n, self.device_table)
        if self.decode_sanity_check and not np.all(sanity):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        row_ids = np.arange(n, dtype=np.int32) % num_rows
        symbols = symbols + np.asarray(self.cdf_offset)[row_ids][None, :]
        outputs = symbols.reshape(
            batch_shape + broadcast_shape + self.prior_shape).astype(
                np.dtype(jnp.dtype(self.bottleneck_dtype).name))
        outputs = jnp.asarray(outputs)
        offset = self.quantization_offset
        if offset is not None:
            outputs = outputs + offset
        return outputs

    def compress_sidecar(self, bottleneck):
        """Compresses in sidecar escape mode (TPU-native container).

        Escaped (out-of-table-range) values are coded in the stream only
        as the escape marker; their actual values travel out of band.
        Decode then runs the fast cond-free Pallas kernel (see
        jax_coder.encode_streams_sidecar).

        Returns:
          (bytes [batch..., L] uint8, lengths [batch...] int32,
           esc_pos int32 [K, 2] (flat stream, element), esc_val int32 [K]).
        """
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        symbols, batch_shape = self._symbols_from_bottleneck(bottleneck)
        buf, lengths, esc_pos, esc_val = jax_coder.encode_streams_sidecar(
            np.asarray(symbols), self.device_table)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape), esc_pos, esc_val)

    def decompress_sidecar(self, buf, lengths, broadcast_shape, esc_pos,
                           esc_val):
        """Decompresses sidecar-mode streams (see compress_sidecar)."""
        self._check_compression()
        broadcast_shape = tuple(int(s) for s in broadcast_shape)
        buf = np.asarray(buf, np.uint8)
        lens = np.asarray(lengths, np.int32)
        batch_shape = lens.shape
        buf = buf.reshape(-1, buf.shape[-1])
        lens = lens.reshape(-1)
        num_rows = int(self.cdf_offset.shape[0])
        n = int(np.prod(broadcast_shape)) * int(np.prod(self.prior_shape))
        symbols, sanity = jax_coder.decode_streams_sidecar(
            buf, lens, n, self.device_table, esc_pos, esc_val)
        if self.decode_sanity_check and not np.all(sanity):
            raise ValueError("Sanity check failed (corrupt bit streams).")
        row_ids = np.arange(n, dtype=np.int32) % num_rows
        symbols = symbols + np.asarray(self.cdf_offset)[row_ids][None, :]
        outputs = symbols.reshape(
            batch_shape + broadcast_shape + self.prior_shape).astype(
                np.dtype(jnp.dtype(self.bottleneck_dtype).name))
        outputs = jnp.asarray(outputs)
        offset = self.quantization_offset
        if offset is not None:
            outputs = outputs + offset
        return outputs

    def compress_device(self, bottleneck, max_gamma_bits=16,
                        escape_budget=64):
        """Fully traced compress: runs inside jit, end to end on device.

        Unlike `compress` (which sizes the micro-op budget from the data on
        the host), the traced path reserves a static budget of
        ``2*max_gamma_bits + 3`` micro-ops for every symbol that escapes to
        Elias-gamma coding; values beyond ``+-2**max_gamma_bits`` of the
        table range would be coded incorrectly (the host path has no such
        limit).  With the default 16, escapes cover the entire int16-ish
        overflow range used in practice.

        Args:
          bottleneck: data to compress.
          max_gamma_bits: per-escape magnitude cap (2**bits).
          escape_budget: static per-stream budget of escaping symbols the
            traced program reserves micro-ops for.  ``ok=False`` in the
            result means the data exceeded it (caller falls back to the
            untraced path or re-traces with a larger budget; each budget
            value is a separate compiled program).

        Returns:
          (bytes [S, L] uint8, lengths [S] int32, ok bool) device arrays.
        """
        self._check_compression()
        from compression_tpu.codec.jax_coder import (
            _encode_streams_jit,
            _round_up,
        )

        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        symbols, batch_shape = self._symbols_from_bottleneck(bottleneck)
        num_streams, n = symbols.shape
        num_rows = int(self.cdf_offset.shape[0])
        indexes = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32) % num_rows, (num_streams, n))
        table = self.device_table
        if table.any_overflow:
            slots = 2 * int(max_gamma_bits) + 3
            # Static budget of escaping symbols per stream (plus the base
            # ops).  `ok` reports whether the data actually fit.
            num_steps = _round_up(n + int(escape_budget) * slots, 64)
            len_r = table.length[indexes]
            mv = len_r - 2
            ovf_r = table.overflow[indexes]
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
            symbols, indexes, table, slots, num_steps, out_size)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape), ok)

    def decompress_device(self, src16, byte_lens, broadcast_shape):
        """Fully traced decompress: runs inside jit, end to end on device.

        Args:
          src16: uint32 [S, C] chunk buffers (see jax_coder.bytes_to_chunks).
          byte_lens: int32 [S].
          broadcast_shape: static shape between batch and prior dims.

        Returns:
          (outputs [S, *broadcast, *prior_shape], sanity [S] bool).
        """
        self._check_compression()
        import jax.numpy as jnp_

        table = self.device_table
        broadcast_shape = tuple(int(s) for s in broadcast_shape)
        num_rows = int(self.cdf_offset.shape[0])
        n = int(np.prod(broadcast_shape)) * int(np.prod(self.prior_shape))
        row_ids = jnp_.arange(n, dtype=jnp_.int32) % num_rows
        symbols, sanity = jax_coder.decode_dispatch(
            src16, byte_lens, n, table, None)
        symbols = symbols + jnp_.asarray(self.cdf_offset)[row_ids][None]
        outputs = symbols.reshape(
            (src16.shape[0],) + broadcast_shape + self.prior_shape
        ).astype(self.bottleneck_dtype)
        offset = self.quantization_offset
        if offset is not None:
            outputs = outputs + offset
        return outputs, sanity

    def compress_sidecar_device(self, bottleneck, escape_budget=None):
        """Fully traced sidecar compress: runs inside jit, end to end.

        The sidecar variant of compress_device: escaping values are coded
        in-stream only as the escape marker (slots=1, so the static
        micro-op budget is exactly one op per symbol — no gamma
        machinery), and the (position, value) pairs are compacted on
        device into fixed-budget arrays (jax_coder.sidecar_extract).
        Byte-identical streams to compress_sidecar.

        Returns:
          (bytes [batch..., L] uint8, lengths [batch...] int32,
           esc_idx int32 [K] flat positions (pad = S*N), esc_val int32
           [K], count int32, ok bool — False when escapes exceeded K).
        """
        self._check_compression()
        bottleneck = jnp.asarray(bottleneck, self.bottleneck_dtype)
        symbols, batch_shape = self._symbols_from_bottleneck(bottleneck)
        num_streams, n = symbols.shape
        num_rows = int(self.cdf_offset.shape[0])
        indexes = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32) % num_rows, (num_streams, n))
        table = self.device_table
        if table.any_overflow:
            len_r = table.length[indexes]
            escape = table.overflow[indexes] & (
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
            symbols, table, num_steps, out_size, indexes=indexes)
        return (buf.reshape(batch_shape + buf.shape[-1:]),
                lengths.reshape(batch_shape), esc_idx, esc_val, count, ok)

    def decompress_sidecar_device(self, src16, byte_lens, broadcast_shape,
                                  esc_idx, esc_val):
        """Fully traced sidecar decompress: runs inside jit, end to end.

        Args:
          src16: uint32 [S, C] chunk buffers (jax_coder.bytes_to_chunks).
          byte_lens: int32 [S].
          broadcast_shape: static shape between batch and prior dims.
          esc_idx / esc_val: flat escape sidecar (jax_coder.sidecar_pad
            layout; pad entries = S*N are dropped).

        Returns:
          (outputs [S, *broadcast, *prior_shape], sanity [S] bool).
        """
        self._check_compression()
        table = self.device_table
        broadcast_shape = tuple(int(s) for s in broadcast_shape)
        num_rows = int(self.cdf_offset.shape[0])
        n = int(np.prod(broadcast_shape)) * int(np.prod(self.prior_shape))
        symbols, sanity = jax_coder.decode_dispatch(
            src16, byte_lens, n, table, None, in_stream_gamma=False)
        symbols = jax_coder.sidecar_apply(symbols, esc_idx, esc_val)
        row_ids = jnp.arange(n, dtype=jnp.int32) % num_rows
        symbols = symbols + jnp.asarray(self.cdf_offset)[row_ids][None]
        outputs = symbols.reshape(
            (src16.shape[0],) + broadcast_shape + self.prior_shape
        ).astype(self.bottleneck_dtype)
        offset = self.quantization_offset
        if offset is not None:
            outputs = outputs + offset
        return outputs, sanity

    def get_config(self):
        config = super().get_config()
        config.update(
            prior_shape=self.prior_shape,
            offset_heuristic=self.offset_heuristic,
            quantization_offset=self._quantization_offset is not None,
        )
        return config

    @classmethod
    def from_config(cls, config):
        """Recreates an entropy model from get_config (call set_weights after)."""
        config = dict(config)
        cdf_shapes = config.pop("cdf_shapes")
        return cls(cdf_shapes=cdf_shapes, **config)

    def get_weights(self):
        weights = super().get_weights()
        if self._quantization_offset is not None:
            weights.append(np.asarray(self._quantization_offset))
        return weights

    def set_weights(self, weights):
        if self._quantization_offset is not None:
            if len(weights) != 3:
                raise ValueError("Expected [cdf, cdf_offset, offset].")
            super().set_weights(weights[:2])
            self._quantization_offset = jnp.asarray(
                weights[2], self.bottleneck_dtype)
        else:
            super().set_weights(weights)
