"""Pod-scale batch compression pipeline.

Scales the codec across chips/hosts along the stream axis (SURVEY.md §2.13):
images (or latent blocks) are sharded data-parallel over the mesh, the CDF
tables are replicated once, every device runs its shard of interleaved
coder lanes, and the per-stream byte buffers gather back in deterministic
stream order so the container bytes are identical for any device count.

Multi-host: under `jax.distributed`, the same code runs SPMD; the final
`np.asarray` gather pulls the globally-ordered buffers to each host (use
`multihost_utils.process_allgather` on addressable shards for very large
batches).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from compression_tpu.codec import jax_coder
from compression_tpu.util import profiling

__all__ = ["BatchCodec"]


class BatchCodec:
    """Sharded multi-stream encode/decode over a device mesh."""

    def __init__(self, table, mesh: Optional[Mesh] = None,
                 max_symbols_per_stream: int = 4096):
        if not isinstance(table, jax_coder.DeviceCdfTable):
            table = jax_coder.DeviceCdfTable(table)
        self.table = table
        if mesh is None:
            devices = np.asarray(jax.devices()).reshape(-1, 1)
            mesh = Mesh(devices, axis_names=("data", "model"))
        self.mesh = mesh
        self.timer = profiling.PhaseTimer()
        self._encode_jit = {}
        self._decode_jit = {}

    def _get_encode(self, num_steps, out_size):
        key = (num_steps, out_size)
        if key not in self._encode_jit:
            table = self.table
            data = NamedSharding(self.mesh, P("data"))

            def encode(symbols, indexes):
                return jax_coder.encode_dispatch(
                    symbols, table, num_steps, out_size, indexes=indexes)

            self._encode_jit[key] = jax.jit(
                encode, in_shardings=(data, data),
                out_shardings=(data, data))
        return self._encode_jit[key]

    def _get_decode(self, num_elements):
        if num_elements not in self._decode_jit:
            table = self.table
            data = NamedSharding(self.mesh, P("data"))

            def decode(buf, lens, indexes):
                if buf.shape[1] % 2:
                    buf = jnp.pad(buf, ((0, 0), (0, 1)))
                src16 = ((buf[:, 0::2].astype(jnp.uint32) << 8)
                         | buf[:, 1::2].astype(jnp.uint32))
                return jax_coder.decode_core(
                    src16, lens, indexes, num_elements, table.cdf,
                    table.length, table.precision, table.overflow, None,
                    table.any_overflow)

            self._decode_jit[num_elements] = jax.jit(
                decode, in_shardings=(data, data, data),
                out_shardings=(data, data))
        return self._decode_jit[num_elements]

    def _pad_streams(self, arr, fill=0):
        """Pads the stream axis to a multiple of the data-mesh size."""
        n_data = self.mesh.devices.shape[0]
        s = arr.shape[0]
        pad = (-s) % n_data
        if pad:
            arr = np.concatenate(
                [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)])
        return arr, s

    def encode(self, symbols, indexes=None):
        """Encodes int32 [S, N] symbols sharded across the mesh.

        Returns (bytes [S, L] uint8, lengths [S] int32), in stream order.
        """
        symbols = np.asarray(symbols, np.int32)
        s_orig, n = symbols.shape
        if indexes is None:
            indexes = np.broadcast_to(
                np.arange(n, dtype=np.int32) % self.table.num_rows,
                symbols.shape).copy()
        indexes = np.asarray(indexes, np.int32)
        symbols, _ = self._pad_streams(symbols)
        indexes, _ = self._pad_streams(indexes)

        num_steps = max(64, -(-n // 64) * 64)
        out_size = 2 * num_steps + 4
        encode = self._get_encode(num_steps, out_size)
        data = NamedSharding(self.mesh, P("data"))
        # Phase decomposition (SCALING.json interpretability): "put" is
        # the host->device scatter, "compute" the per-device coder work
        # on sharded outputs, "gather" the device->host byte pull.  On a
        # real pod, compute is the part that scales with chips; put and
        # gather ride PCIe/DCN and bound the efficiency ceiling.
        with self.timer("encode"):
            with self.timer("encode_put"):
                sym_d = jax.device_put(jnp.asarray(symbols), data)
                idx_d = jax.device_put(jnp.asarray(indexes), data)
                jax.block_until_ready((sym_d, idx_d))
            with self.timer("encode_compute"):
                buf, lengths = jax.block_until_ready(encode(sym_d, idx_d))
            with self.timer("encode_gather"):
                buf = np.asarray(buf)
                lengths = np.asarray(lengths)
        return buf[:s_orig], lengths[:s_orig]

    def decode(self, buf, lengths, num_elements, indexes=None):
        """Decodes padded byte buffers sharded across the mesh."""
        buf = np.asarray(buf, np.uint8)
        lengths = np.asarray(lengths, np.int32)
        s_orig = buf.shape[0]
        if indexes is None:
            indexes = np.broadcast_to(
                np.arange(num_elements, dtype=np.int32)
                % self.table.num_rows,
                (s_orig, num_elements)).copy()
        indexes = np.asarray(indexes, np.int32)
        buf, _ = self._pad_streams(buf)
        lengths, _ = self._pad_streams(lengths)
        indexes, _ = self._pad_streams(indexes)

        decode = self._get_decode(num_elements)
        data = NamedSharding(self.mesh, P("data"))
        with self.timer("decode"):
            with self.timer("decode_put"):
                buf_d = jax.device_put(jnp.asarray(buf), data)
                len_d = jax.device_put(jnp.asarray(lengths), data)
                idx_d = jax.device_put(jnp.asarray(indexes), data)
                jax.block_until_ready((buf_d, len_d, idx_d))
            with self.timer("decode_compute"):
                out, sanity = jax.block_until_ready(
                    decode(buf_d, len_d, idx_d))
            with self.timer("decode_gather"):
                out = np.asarray(out)
                sanity = np.asarray(sanity)
        return out[:s_orig], sanity[:s_orig]
