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

__all__ = ["BatchCodec", "SidecarBatchCodec"]


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


class SidecarBatchCodec:
    """Sharded native-container coder: the round-4 sidecar stack.

    Runs the SAME traced entropy-model methods the flagship native
    containers use (`compress_sidecar_device` / `decompress_sidecar_
    device` — escape sidecar compacted on device, wide cond-free coder
    lanes) data-parallel over the stream axis of a device mesh, via
    `shard_map`: every device codes its own streams AND compacts its own
    escapes locally, so the hot path has ZERO collectives (a global
    escape compaction was measured to wreck scaling — the cumsum +
    scatter over the sharded flat axis forces all-to-all traffic).  The
    per-shard sidecars merge into the global flat layout on the host.
    Streams are independent, so container bytes are identical for any
    device count (SURVEY.md §2.13 DP row); tables are closed-over
    constants, i.e. replicated once.
    """

    ESC_BUCKET = 1024  # per-shard sidecar width rounds up to this

    def __init__(self, em, mesh: Optional[Mesh] = None):
        self.em = em
        if mesh is None:
            devices = np.asarray(jax.devices()).reshape(-1, 1)
            mesh = Mesh(devices, axis_names=("data", "model"))
        self.mesh = mesh
        self.timer = profiling.PhaseTimer()
        self._enc = {}
        self._dec = {}

    @property
    def _ndata(self):
        return int(self.mesh.devices.shape[0])

    def _data(self, ndim):
        return NamedSharding(self.mesh, P(*(("data",) + (None,) * (ndim - 1))))

    def _pad_streams(self, arr, fill=0):
        pad = (-arr.shape[0]) % self._ndata
        if pad:
            arr = np.concatenate(
                [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)])
        return arr

    def encode(self, rows, escape_budget=None):
        """Encodes bottleneck rows [S, *broadcast, *prior] sharded over
        the mesh through the EM's traced sidecar compress.

        Returns (bytes [S, L] uint8, lengths [S] int32, esc_idx, esc_val,
        count, ok) in the same global flat sidecar layout as
        compress_sidecar_device (positions over the padded stream count,
        pad sentinel dropped by the decoder's scatter), trimmed back to
        the original stream count.
        """
        from jax.experimental.shard_map import shard_map

        rows = np.asarray(rows)
        s_orig = rows.shape[0]
        rows = self._pad_streams(rows)
        n = int(np.prod(rows.shape[1:]))
        nd = self._ndata
        s_local = rows.shape[0] // nd
        key = (rows.shape, escape_budget)
        if key not in self._enc:
            em = self.em

            def local_enc(rr):
                buf, lens, ei, ev, cnt, ok = em.compress_sidecar_device(
                    rr, escape_budget=escape_budget)
                return (buf, lens, ei[None], ev[None],
                        cnt.reshape(1), ok.reshape(1))

            self._enc[key] = jax.jit(shard_map(
                local_enc, mesh=self.mesh,
                in_specs=P("data"),
                out_specs=(P("data"), P("data"), P("data"), P("data"),
                           P("data"), P("data")),
                check_rep=False))
        fn = self._enc[key]
        with self.timer("encode"):
            with self.timer("encode_put"):
                rows_d = jax.device_put(
                    jnp.asarray(rows), self._data(rows.ndim))
                jax.block_until_ready(rows_d)
            with self.timer("encode_compute"):
                out = jax.block_until_ready(fn(rows_d))
            with self.timer("encode_gather"):
                buf, lengths, ei, ev, cnt, ok = map(np.asarray, out)
        # Host merge: local shard positions -> global flat layout.
        parts_i, parts_v = [], []
        for i in range(nd):
            c = int(cnt[i])
            parts_i.append(ei[i, :c].astype(np.int64) + i * s_local * n)
            parts_v.append(ev[i, :c])
        count = int(cnt.sum())
        width = max(self.ESC_BUCKET,
                    -(-max(count, 1) // self.ESC_BUCKET) * self.ESC_BUCKET)
        esc_idx = np.full((width,), rows.shape[0] * n, np.int32)
        esc_val = np.zeros((width,), np.int32)
        if count:
            esc_idx[:count] = np.concatenate(parts_i).astype(np.int32)
            esc_val[:count] = np.concatenate(parts_v)
        return (buf[:s_orig], lengths[:s_orig], esc_idx, esc_val,
                np.int32(count), bool(ok.all()))

    def decode(self, buf, lengths, broadcast_shape, esc_idx, esc_val):
        """Decodes per-stream byte buffers sharded over the mesh through
        the EM's traced sidecar decompress.

        Escape positions are global flat indices (encode's output
        layout); the host splits them per shard so each device applies
        only its own escapes — no collectives.
        """
        from jax.experimental.shard_map import shard_map

        buf = np.asarray(buf, np.uint8)
        lengths = np.asarray(lengths, np.int32)
        s_orig = buf.shape[0]
        src16 = jax_coder.bytes_to_chunks(buf, lengths)
        src16 = self._pad_streams(src16)
        lengths = self._pad_streams(lengths)
        broadcast_shape = tuple(int(s) for s in broadcast_shape)
        nd = self._ndata
        s_pad = src16.shape[0]
        s_local = s_pad // nd
        n = int(np.prod(broadcast_shape)) * int(
            np.prod(self.em.prior_shape))
        # Split the global sidecar per shard (escapes only ever point at
        # real streams, which precede the padding).
        esc_idx = np.asarray(esc_idx, np.int64)
        esc_val = np.asarray(esc_val, np.int32)
        valid = esc_idx < s_orig * n
        pos, val = esc_idx[valid], esc_val[valid]
        shard = (pos // (s_local * n)).astype(np.int64)
        local = (pos - shard * s_local * n).astype(np.int32)
        k = max(self.ESC_BUCKET, -(-max(
            int(np.bincount(shard, minlength=nd).max(initial=1)), 1)
            // self.ESC_BUCKET) * self.ESC_BUCKET)
        ei = np.full((nd, k), s_local * n, np.int32)
        ev = np.zeros((nd, k), np.int32)
        for i in range(nd):
            m = shard == i
            ei[i, : int(m.sum())] = local[m]
            ev[i, : int(m.sum())] = val[m]
        key = (src16.shape, broadcast_shape, k)
        if key not in self._dec:
            em = self.em

            def local_dec(s16, lens, eii, evv):
                return em.decompress_sidecar_device(
                    s16, lens, broadcast_shape, eii[0], evv[0])

            self._dec[key] = jax.jit(shard_map(
                local_dec, mesh=self.mesh,
                in_specs=(P("data"), P("data"), P("data"), P("data")),
                out_specs=(P("data"), P("data")),
                check_rep=False))
        fn = self._dec[key]
        with self.timer("decode"):
            with self.timer("decode_put"):
                args = (jax.device_put(jnp.asarray(src16), self._data(2)),
                        jax.device_put(jnp.asarray(lengths), self._data(1)),
                        jax.device_put(jnp.asarray(ei), self._data(2)),
                        jax.device_put(jnp.asarray(ev), self._data(2)))
                jax.block_until_ready(args)
            with self.timer("decode_compute"):
                out, sanity = jax.block_until_ready(fn(*args))
            with self.timer("decode_gather"):
                out = np.asarray(out)
                sanity = np.asarray(sanity)
        return out[:s_orig], sanity[:s_orig]
