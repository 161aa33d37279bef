"""Vectorized multi-stream range coder in JAX (TPU-native formulation).

The reference implementation (cc/kernels/range_coder_kernels.cc) runs one
sequential C++ coder per stream on CPU threads.  Here *streams are the vector
axis*: all coder states — ``(base, size-1, delayed-carry)`` for the encoder,
``(base, size-1, value, read-pos)`` for the decoder — live in u32 vectors of
shape [num_streams], and one `lax.scan` over micro-op steps advances every
stream in lockstep on the VPU.  Bit-exactness with the reference recurrence
(cc/lib/range_coder.cc:37-307) is maintained by doing all interval arithmetic
in split 32-bit integer pieces (48-bit products are represented as hi/lo
pairs, see `_mul_size`).

Encoder output-side trick: a sequential coder appends a *variable* number of
bytes per step (delayed-carry flushes can emit long 0x00/0xFF runs), which
does not vectorize.  Instead, every 16-bit renormalization reserves exactly
one 2-byte slot in the output buffer, tagged FINAL (value known), PEND_START
(start of an ambiguous carry group) or PEND_FILL (carry-run continuation).
Carry resolutions are recorded as (group, direction) events.  After the scan,
a single vectorized post-pass resolves every pending slot:

    PEND_START -> delay    (carry resolved up)   or  delay - 1  (down)
    PEND_FILL  -> 0x0000                         or  0xFFFF

which reproduces the reference's byte output exactly, including the
finalization rules (trailing zeros of an unresolved group are dropped by
truncating the stream length).

Elias-gamma overflow coding of unbounded alphabets
(range_coder_kernels.cc:290-322) is handled on the encode side by expanding
each symbol into a vectorized sequence of (lower, upper, precision) micro-ops
before the scan, and on the decode side by masked `lax.while_loop`s that only
iterate while some lane is still consuming gamma bits.
"""

from __future__ import annotations

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.codec import tables

__all__ = [
    "encode_streams",
    "decode_streams",
    "encode_core",
    "encode_dispatch",
    "decode_core",
    "micro_ops_from_symbols",
    "DeviceCdfTable",
]

_U16 = jnp.uint32(0xFFFF)
_MASK32 = (1 << 32) - 1


class _HostTableMeta:
    """Static host copy of the CDF table for trace-time decisions.

    Rides in the pytree AUX data of DeviceCdfTable, so kernel dispatch
    (applicability checks, packed-table construction) stays concrete even
    when the device arrays are jit-traced arguments.  Hashable (jit cache
    keys hash the treedef aux); kernel-specific packed tables are cached
    on this object, surviving pytree flatten/unflatten round trips.
    """

    def __init__(self, cdf, length, precision, overflow):
        self.cdf = np.ascontiguousarray(cdf)
        self.length = np.ascontiguousarray(length)
        self.precision = np.ascontiguousarray(precision)
        self.overflow = np.ascontiguousarray(overflow)
        for a in (self.cdf, self.length, self.precision, self.overflow):
            a.setflags(write=False)
        self.kernel_tables = {}  # per-kernel packed-table cache
        self._hash = None

    def _key(self):
        return (self.cdf.shape, self.cdf.tobytes(), self.length.tobytes(),
                self.precision.tobytes(), self.overflow.tobytes())

    def __hash__(self):
        if self._hash is None:
            self._hash = hash(self._key())
        return self._hash

    def __eq__(self, other):
        if self is other:
            return True
        return (isinstance(other, _HostTableMeta)
                and self._key() == other._key())


class DeviceCdfTable:
    """Dense CDF table as device arrays (rows padded to a rectangle).

    Registered as a jax pytree (arrays are leaves; the static row counts
    and a host copy of the table are aux data) so it can cross jit
    boundaries as an argument while kernel dispatch stays concrete.
    """

    def __init__(self, table: tables.CdfTable = None, *, _arrays=None,
                 _aux=None):
        if table is not None:
            self.cdf = jnp.asarray(table.cdf.astype(np.uint32))
            self.length = jnp.asarray(table.length.astype(np.int32))
            self.precision = jnp.asarray(table.precision.astype(np.uint32))
            self.overflow = jnp.asarray(table.overflow)
            self.num_rows = int(table.num_rows)
            self.max_len = int(table.max_len)
            self.any_overflow = bool(np.any(table.overflow))
            self.host = _HostTableMeta(
                table.cdf, table.length, table.precision, table.overflow)
        else:
            self.cdf, self.length, self.precision, self.overflow = _arrays
            self.num_rows, self.max_len, self.any_overflow, self.host = _aux


def _dct_flatten(t):
    return ((t.cdf, t.length, t.precision, t.overflow),
            (t.num_rows, t.max_len, t.any_overflow, t.host))


def _dct_unflatten(aux, arrays):
    return DeviceCdfTable(_arrays=arrays, _aux=aux)


jax.tree_util.register_pytree_node(
    DeviceCdfTable, _dct_flatten, _dct_unflatten)


def _mul_size(size_minus1, v):
    """(hi, lo) of (size_minus1 + 1) * v for v <= 2**16, all uint32 pieces."""
    h = size_minus1 >> 16
    l = size_minus1 & _U16
    p1 = h * v  # < 2**32
    p2a = l * v  # < 2**32
    p2 = p2a + v
    c2 = (p2 < p2a).astype(jnp.uint32)
    lo1 = p1 << 16
    lo = lo1 + p2
    c1 = (lo < lo1).astype(jnp.uint32)
    hi = (p1 >> 16) + c2 + c1
    return hi, lo


def _mul_shift(size_minus1, v, precision):
    """((size_minus1 + 1) * v) >> precision, mod 2**32 (exact for v<=2**p)."""
    hi, lo = _mul_size(size_minus1, v)
    return (hi << (32 - precision)) | (lo >> precision)


# -----------------------------------------------------------------------------
# Encoder
# -----------------------------------------------------------------------------
def _encode_step(carry, op):
    """One micro-op for all streams; mirrors RangeEncoder::Encode exactly."""
    base, sm1, delay, ptr, pend_start, group = carry
    lower, upper, prec, mask = op

    a = _mul_shift(sm1, lower, prec)
    b = _mul_shift(sm1, upper, prec) - 1
    nb = base + a
    overflow = nb < a  # base wrapped past 2**32
    ns = b - a
    straddle = (nb + ns) < nb  # interval still straddles 2**32 (state 1)
    renorm = (ns >> 16) == 0

    # Carry resolution (flush of the deferred chunk) happens iff we are in
    # state 1 (delay != 0) and the straddle has resolved.
    res_event = (delay != 0) & ~straddle & mask
    res_dir = overflow  # True: resolves up (keep value, 0x00 fill)

    shifted_base = nb << 16
    shifted_sm1 = (ns << 16) | _U16
    new_base = jnp.where(renorm, shifted_base, nb)
    new_sm1 = jnp.where(renorm, shifted_sm1, ns)

    top = nb >> 16
    ambiguous = (shifted_base + shifted_sm1) < shifted_base

    # Write tag for the reserved 2-byte slot:
    # 0 none / 1 FINAL(top) / 2 PEND_START(top+1) / 3 PEND_FILL.
    tag = jnp.where(
        ~mask | ~renorm,
        0,
        jnp.where(straddle, 3, jnp.where(ambiguous, 2, 1)),
    ).astype(jnp.int32)

    new_delay = jnp.where(
        straddle, delay, jnp.where(tag == 2, top + 1, 0))
    w_val = jnp.where(tag == 2, top + 1, jnp.where(tag == 1, top, 0))
    new_group = group + (tag == 2)
    new_pend_start = jnp.where(tag == 2, ptr, pend_start)
    new_ptr = ptr + 2 * (tag != 0)

    keep = lambda new, old: jnp.where(mask, new, old)
    carry = (
        keep(new_base, base),
        keep(new_sm1, sm1),
        keep(new_delay, delay),
        keep(new_ptr, ptr),
        keep(new_pend_start, pend_start),
        keep(new_group, group),
    )
    # Packed record: val(17b) | tag(2b) | res_event(1b) | res_dir(1b) — one
    # i32 per step instead of four arrays (4x less scan-output HBM traffic).
    rec = (jnp.where(tag > 0, w_val, 0).astype(jnp.int32)
           | (tag << 17)
           | (res_event.astype(jnp.int32) << 19)
           | (res_dir.astype(jnp.int32) << 20))
    return carry, rec


@functools.partial(jax.jit, static_argnums=(4,))
def encode_core(lower, upper, prec, mask, out_size):
    """Runs the encoder over micro-ops.

    TPU-friendly output materialization: no large scatters.  The
    delayed-carry resolution direction for each pending chunk is "the first
    resolution event strictly after its step", computed with a reverse
    associative scan; the emitted 16-bit chunks are then compacted to the
    front of each stream with one key-sort along the step axis and
    interleaved into bytes with pure reshapes.

    Args:
      lower, upper, prec: uint32 [T, S] micro-op streams.
      mask: bool [T, S]; False steps are no-ops.
      out_size: static output buffer length per stream (>= 2*T + 2).

    Returns:
      (bytes [S, out_size] uint8, lengths [S] int32).
    """
    num_steps, num_streams = lower.shape
    use_pallas = (
        jax.default_backend() not in ("cpu",) and num_streams % 256 == 0)
    if use_pallas:
        from compression_tpu.codec import pallas_coder
        rec, state = pallas_coder.encode_scan_pallas(lower, upper, prec, mask)
    else:
        init = (
            jnp.zeros(num_streams, jnp.uint32),  # base
            jnp.full(num_streams, _MASK32, jnp.uint32),  # size_minus1
            jnp.zeros(num_streams, jnp.uint32),  # delay (16-bit value or 0)
            jnp.zeros(num_streams, jnp.int32),  # ptr
            jnp.zeros(num_streams, jnp.int32),  # pend_start
            jnp.zeros(num_streams, jnp.int32),  # open group count
        )
        (base, sm1, delay, ptr, pend_start, _), rec = jax.lax.scan(
            _encode_step, init, (lower, upper, prec, mask))
        state = (base, sm1, delay, ptr, pend_start)

    return _encode_postpass(rec, state, out_size)


def _encode_postpass(rec, state, out_size):
    """Turns packed scan records into (bytes [S, out_size], lengths [S]).

    Shared by the XLA scan, the v1 Pallas scan and the fused v2 kernel.
    ``rec`` packs val(17b) | tag(2b) | res_event(1b) | res_dir(1b) per step.
    """
    base, sm1, delay, ptr, pend_start = state
    num_steps, num_streams = rec.shape

    tag = (rec >> 17) & 3
    w_val = (rec & 0x1FFFF).astype(jnp.uint32)

    # Resolution direction for each pending chunk = direction of the first
    # resolution event strictly after its step (unresolved -> "up"/True).
    # Single-array reverse cumulative min over code = (t<<1 | dir), BIG when
    # the step has no event: the min over t'>t is the nearest event, and its
    # direction rides in the low bit.
    big = jnp.int32(0x7FFFFFFF)
    iota = jax.lax.broadcasted_iota(jnp.int32, (num_steps, num_streams), 0)
    code = jnp.where(
        (rec & (1 << 19)) != 0, (iota << 1) | ((rec >> 20) & 1), big)
    m = jax.lax.associative_scan(jnp.minimum, code, reverse=True, axis=0)
    m_next = jnp.concatenate(
        [m[1:], jnp.full((1, num_streams), big, jnp.int32)], axis=0)
    up = jnp.where(m_next != big, (m_next & 1) != 0, True)

    value16 = jnp.where(
        tag == 1,
        w_val,
        jnp.where(
            tag == 2,
            jnp.where(up, w_val, w_val - 1),
            jnp.where(up, jnp.uint32(0), jnp.uint32(0xFFFF)),
        ),
    )
    value16 = jnp.where(tag > 0, value16, 0)

    # Compact chunks to the front of each stream.
    if num_steps <= 8192:
        # Binary-shift compaction: element at step t moves up by
        # dist = t - rank(t) (rank = # valid chunks at steps <= t).  The
        # dist sequence is non-decreasing with distinct targets, so moving
        # every element whose dist has bit b set by 2^b, LSB-first, is
        # collision-free (two landing on one slot would force
        # dist_j - dist_i ≡ 2^b (mod 2^{b+1}) AND < 2^b).  ~log2(T) fused
        # elementwise passes over ONE packed i32 array
        # [valid(1) | dist(13) | value16(17)] — several times cheaper
        # than a bitonic sort's ~log^2(T) stages.
        valid = tag > 0
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=0) - 1
        dist = jnp.where(valid, iota - rank, 0)
        packed = jnp.where(
            valid,
            (1 << 30) | (dist << 17) | value16.astype(jnp.int32),
            0)
        b = 0
        while (1 << b) < num_steps:
            sh = 1 << b
            src = jnp.concatenate(
                [packed[sh:], jnp.zeros((sh, num_streams), jnp.int32)],
                axis=0)
            take = (src & ((1 << 30) | (sh << 17))) == (
                (1 << 30) | (sh << 17))
            stay = (packed & ((1 << 30) | (sh << 17))) == (1 << 30)
            packed = jnp.where(
                take, src - (sh << 17), jnp.where(stay, packed, 0))
            b += 1
        chunks = (packed & 0x1FFFF).astype(jnp.uint32)
    elif num_steps <= 16382:
        # Fused (key, value) packed sort: values are <= 0x10000 (17 bits),
        # so (t << 17 | value16) sorts by step with the payload in the low
        # bits — one single-operand sort instead of a variadic keyed sort.
        packed = jnp.where(
            tag > 0, (iota << 17) | value16.astype(jnp.int32), big)
        packed = jax.lax.sort(packed, dimension=0)
        chunks = (packed & 0x1FFFF).astype(jnp.uint32)
        chunks = jnp.where(packed == big, 0, chunks)
    else:
        key = jnp.where(tag > 0, iota, big)
        _, chunks = jax.lax.sort(
            (key, value16), dimension=0, num_keys=1)
    chunks = chunks.T  # [S, T], valid prefix per stream
    return _finalize_chunks(chunks, state, out_size)


def _finalize_chunks(chunks, state, out_size):
    """Bytes + lengths from compacted 16-bit chunks [S, T] + coder state.

    Shared tail of the XLA post-pass and the fused kernels with in-kernel
    compaction: byte interleave, RangeEncoder::Finalize, and trailing
    truncation of unresolved carry groups.
    """
    base, sm1, delay, ptr, pend_start = state
    num_streams, num_steps = chunks.shape

    # Interleave hi/lo bytes: [S, T] u16-in-u32 -> [S, 2T] u8.  (A u16
    # byteswap + bitcast formulation is algebraically cheaper but wedges
    # the XLA TPU compiler at [32k, 512]-scale shapes; the u8 stack
    # compiles reliably everywhere.)
    hi = (chunks >> 8).astype(jnp.uint8)
    lo = (chunks & 0xFF).astype(jnp.uint8)
    byte_pairs = jnp.stack([hi, lo], axis=-1).reshape(
        num_streams, 2 * num_steps)
    pad_cols = out_size - 2 * num_steps
    buf = jnp.pad(byte_pairs, ((0, 0), (0, pad_cols)))

    # Finalization (RangeEncoder::Finalize).
    in_delay = delay != 0
    upper_end = base + sm1
    mid24 = ((base - 1) >> 24) + 1
    use24 = mid24 <= (upper_end >> 24)
    mid16 = ((base - 1) >> 16) + 1
    f_b0 = jnp.where(use24, mid24, mid16 >> 8).astype(jnp.uint8)
    f_b1 = (mid16 & 0xFF).astype(jnp.uint8)
    f_count = jnp.where(
        base == 0, 0, jnp.where(use24, 1, jnp.where((mid16 & 0xFF) != 0, 2, 1))
    ).astype(jnp.int32)

    sid = jnp.arange(num_streams)
    pos0 = jnp.where(~in_delay & (f_count >= 1), ptr, out_size)
    pos1 = jnp.where(~in_delay & (f_count == 2), ptr + 1, out_size)
    buf = buf.at[sid, pos0].set(f_b0, mode="drop", unique_indices=True)
    buf = buf.at[sid, pos1].set(f_b1, mode="drop", unique_indices=True)

    lengths = jnp.where(
        in_delay,
        pend_start + jnp.where((delay & 0xFF) != 0, 2, 1),
        ptr + f_count,
    ).astype(jnp.int32)
    # Zero any bytes past each stream's length (trailing-zero truncation of
    # an unresolved carry group must not leave stale chunk bytes).
    col = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)
    buf = jnp.where(col < lengths[:, None], buf, 0)
    return buf, lengths


def _floor_log2(x):
    """Exact floor(log2(x)) for uint32 x >= 1, via comparison counting."""
    k = jnp.arange(1, 32, dtype=jnp.uint32)
    return jnp.sum(
        x[..., None] >= (jnp.uint32(1) << k), axis=-1).astype(jnp.uint32)


def _cdf_pair_lookup(table: "DeviceCdfTable", rows, vq):
    """(cdf[row, vq], cdf[row, vq+1]) for every element, without gathers.

    TPU has no per-lane vector gather, so dynamic indexing lowers to a
    serialized loop; instead the lookup is a two-level one-hot matmul on
    the MXU (CDF values <= 2**16 are exact in f32, but only with
    Precision.HIGHEST — the default bf16 matmul truncates them):

      1. the flat table is pre-tiled into 17-wide overlapping windows
         ``win17[b] = flat[16b : 16b+17]``, and each lane pulls its window
         with a one-hot over the ~K/16 buckets (16x fewer compares than a
         one-hot over all K entries);
      2. positions ``vq & 15`` and ``(vq & 15) + 1`` of the 17-window give
         the pair via two masked sums (the +1 never leaves the window).

    Falls back to a plain gather for very large tables where even the
    bucketed one-hot would not pay off.
    """
    shape = rows.shape
    k_size = table.num_rows * table.max_len
    flat_cdf = table.cdf.reshape(-1)
    flat_idx = (rows * table.max_len + vq).reshape(-1)
    if k_size > 65536:
        return (flat_cdf[flat_idx].reshape(shape),
                flat_cdf[flat_idx + 1].reshape(shape))

    nb = -(-k_size // 16)

    def windows(vals_u32):
        padded = jnp.pad(vals_u32, (0, 16 * nb + 1 - k_size))
        return jnp.concatenate(
            [padded[: 16 * nb].reshape(nb, 16), padded[16::16][:, None]],
            axis=1)  # [nb, 17]

    m = flat_idx.shape[0]
    # (A Mosaic kernel variant exists — pallas_coder.pair_lookup_pallas,
    # correctness-verified on TPU — but measured no faster than this XLA
    # formulation: the prep stage is not lookup-compute-bound.)

    # hi/lo byte planes: each <= 256 is EXACT in bf16, so two
    # default-precision (single-pass) MXU dots replace one 6-pass
    # HIGHEST f32 dot.  A one-hot row selects a single product, and the
    # f32 accumulation of one exact product is exact.
    win_hi = windows(flat_cdf >> 8).astype(jnp.bfloat16)
    win_lo = windows(flat_cdf & 0xFF).astype(jnp.bfloat16)

    # Block the lane axis so the transient one-hot and window stay in
    # VMEM (an unblocked whole-array formulation was measured 1.5x
    # slower: the [m, nb] one-hot and [m, 17] window transit HBM).
    block = min(131072, max(8192, (1 << 22) // nb))
    pad = (-m) % block
    idx_p = jnp.pad(flat_idx, (0, pad)).reshape(-1, block)
    j17 = jnp.arange(17, dtype=jnp.int32)

    def chunk(ic):
        b = ic >> 4
        r = (ic & 15)[:, None]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (ic.shape[0], nb), 1)
                  == b[:, None]).astype(jnp.bfloat16)
        hi = jnp.dot(onehot, win_hi, preferred_element_type=jnp.float32)
        lo = jnp.dot(onehot, win_lo, preferred_element_type=jnp.float32)
        win = hi * 256.0 + lo  # [block, 17], exact (<= 2**16)
        c_lo = jnp.sum(jnp.where(j17[None, :] == r, win, 0.0), axis=1)
        c_hi = jnp.sum(jnp.where(j17[None, :] == r + 1, win, 0.0), axis=1)
        return c_lo, c_hi

    lo, hi = jax.lax.map(chunk, idx_p)
    c_lo = lo.reshape(-1)[:m].astype(jnp.uint32).reshape(shape)
    c_hi = hi.reshape(-1)[:m].astype(jnp.uint32).reshape(shape)
    return c_lo, c_hi


def micro_ops_from_symbols(symbols, indexes, table: DeviceCdfTable,
                           slots_per_symbol: int, num_steps: int):
    """Expands symbols into compacted (lower, upper, prec, mask) micro-ops.

    Overflow rows (escape + Elias gamma) expand into up to
    ``slots_per_symbol`` micro-ops; the result is compacted per stream so the
    scan length is ``num_steps`` (the caller guarantees it is sufficient).
    All shapes are static; runs fully vectorized before the scan.

    Args:
      symbols: int32 [S, N] (possibly out of range for overflow rows).
      indexes: int32 [S, N] CDF row per element.
      table: DeviceCdfTable.
      slots_per_symbol: static int K.
      num_steps: static int T >= max stream micro-op total.

    Returns:
      (lower, upper, prec, mask) each [T, S] ready for encode_core.
    """
    num_streams, n = symbols.shape
    rows = indexes

    if slots_per_symbol == 1 and not table.any_overflow:
        # No overflow rows at all: skip the escape/gamma machinery.  Work
        # directly in the scan's [N, S] layout (transpose the two inputs
        # instead of the four outputs) and, for single-row tables, read
        # the row metadata as broadcast scalars instead of [S, N] gathers
        # (XLA serializes per-lane gathers on TPU even from tiny tables).
        vT = symbols.T  # [N, S]
        rowsT = rows.T
        if table.num_rows == 1:
            len_rT = jnp.broadcast_to(table.length[0], vT.shape)
            prec_rT = jnp.broadcast_to(table.precision[0], vT.shape)
        else:
            len_rT = table.length[rowsT]
            prec_rT = table.precision[rowsT]
        vq = jnp.clip(vT, 0, len_rT - 2)
        c_lo, c_hi = _cdf_pair_lookup(table, rowsT, vq)
        pad = num_steps - n
        def pad_t(x, fill):
            x = jnp.asarray(x, jnp.uint32)
            return jnp.pad(x, ((0, pad), (0, 0)), constant_values=fill)
        mask_c = jnp.concatenate(
            [jnp.ones((n, num_streams), bool),
             jnp.zeros((pad, num_streams), bool)], axis=0)
        return (pad_t(c_lo, 0), pad_t(c_hi, 1), pad_t(prec_rT, 1), mask_c)

    prec_r = table.precision[rows]  # [S, N] uint32
    len_r = table.length[rows]  # [S, N] int32
    v = symbols

    ovf_r = table.overflow[rows]
    mv = len_r - 2  # escape symbol index for overflow rows
    sign = ovf_r & (v < 0)
    over = ovf_r & ~sign & (v >= mv)
    escape = sign | over
    vq = jnp.where(
        escape, mv, jnp.where(ovf_r, v, jnp.clip(v, 0, len_r - 2)))
    gamma = jnp.where(
        sign, -v, jnp.where(over, v - mv + 1, 1)).astype(jnp.uint32)
    nbits = _floor_log2(jnp.maximum(gamma, 1))  # n_top
    c_lo, c_hi = _cdf_pair_lookup(table, rows, vq)

    if slots_per_symbol == 1:
        # Fast path: no escapes anywhere -> one op per symbol, identity
        # compaction (no scatter).
        pad = num_steps - n
        def pad_t(x, fill):
            x = x.astype(jnp.uint32) if x.dtype != jnp.bool_ else x
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        lower_c = pad_t(c_lo, 0)
        upper_c = pad_t(c_hi, 1)
        prec_c = pad_t(prec_r, 1)
        mask_c = jnp.pad(
            jnp.ones((num_streams, n), bool), ((0, 0), (0, pad)),
            constant_values=False)
        return lower_c.T, upper_c.T, prec_c.T, mask_c.T

    count = jnp.where(escape, 3 + 2 * nbits.astype(jnp.int32), 1)

    k = jnp.arange(slots_per_symbol, dtype=jnp.int32)  # [K]
    kb = k[None, None, :]
    nb = nbits.astype(jnp.int32)[..., None]
    active = kb < count[..., None]

    is_main = kb == 0
    is_unary = (kb >= 1) & (kb <= nb)
    is_bit = (kb > nb) & (kb <= 2 * nb + 1)
    is_sign = kb == 2 * nb + 2
    bit_shift = jnp.clip(2 * nb + 1 - kb, 0, 31).astype(jnp.uint32)
    bit = (gamma[..., None] >> bit_shift) & 1
    sgn = sign[..., None].astype(jnp.uint32)

    lower = jnp.where(
        is_main, c_lo[..., None],
        jnp.where(is_unary, 0, jnp.where(is_bit, bit, sgn))
    ).astype(jnp.uint32)
    upper = jnp.where(
        is_main, c_hi[..., None],
        jnp.where(is_unary, 1, jnp.where(is_bit, bit + 1, sgn + 1))
    ).astype(jnp.uint32)
    prec = jnp.where(is_main, prec_r[..., None], 1).astype(jnp.uint32)

    # Compact: position of slot k of element j in the stream's op sequence.
    offsets = jnp.cumsum(count, axis=1) - count  # exclusive
    pos = offsets[..., None] + kb  # [S, N, K]
    pos = jnp.where(active, pos, num_steps)  # park inactive

    s_ids = jnp.broadcast_to(
        jnp.arange(num_streams)[:, None, None], pos.shape)
    out_shape = (num_streams, num_steps)

    def scatter(vals, fill):
        out = jnp.full(out_shape, fill, vals.dtype)
        return out.at[s_ids, pos].set(vals, mode="drop")

    lower_c = scatter(lower, jnp.uint32(0))
    upper_c = scatter(upper, jnp.uint32(1))
    prec_c = scatter(prec, jnp.uint32(1))
    mask_c = jnp.zeros(out_shape, bool).at[s_ids, pos].set(
        active, mode="drop")
    # Scan wants [T, S].
    return lower_c.T, upper_c.T, prec_c.T, mask_c.T


# -----------------------------------------------------------------------------
# Decoder
# -----------------------------------------------------------------------------
# The decoder state is (base, sm1, value, chunks_read); the source is fed as
# 16-bit chunks [S, C] and each renormalization consumes exactly one chunk,
# fetched with a one-hot dot over the chunk axis (TPU has no per-lane
# gather; the scan is pure VPU work and beats a serialized gather).


def _fetch_chunk(src16, chunks_read):
    """chunk[s] = src16[s, chunks_read[s]] via a one-hot sum (no gather)."""
    c = src16.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, src16.shape, 1)
    sel = k == chunks_read[:, None]
    return jnp.sum(jnp.where(sel, src16, 0), axis=1)


def _refine_decoder(state, src16, a, b, mask):
    """Applies the (a, b) interval refinement + conditional renormalization.

    Matches Read16BitValue semantics (range_coder.h:273-282): bytes past the
    stream end read as zero, which the zero-padded chunk buffer reproduces.
    """
    base, sm1, value, chunks_read = state
    nb = base + a
    ns = b - a
    renorm = ((ns >> 16) == 0) & mask
    nb2 = jnp.where(renorm, nb << 16, nb)
    ns2 = jnp.where(renorm, (ns << 16) | _U16, ns)

    chunk = _fetch_chunk(src16, chunks_read)
    new_value = jnp.where(renorm, (value << 16) | chunk, value)
    new_chunks = chunks_read + renorm.astype(jnp.int32)

    keep = lambda new, old: jnp.where(mask, new, old)
    return (keep(nb2, base), keep(ns2, sm1), keep(new_value, value),
            keep(new_chunks, chunks_read))


def _symbol_threshold(state, prec):
    """Exact smallest t with size * t >= lower_bound, via f32 + fixup.

    The decode condition ``lower_bound <= size * cdf[k]`` is equivalent to
    ``cdf[k] >= t`` with t = ceil(lower_bound / size); computing t once per
    lane turns the per-symbol CDF search into a single 16-bit compare per
    alphabet entry instead of a 48-bit multiply (range_coder.h:224-271).
    """
    base, sm1, value, _ = state
    vb1 = (value - base) + 1  # may wrap to 0 == 2**32
    wrapped = vb1 == 0
    lb_hi = jnp.where(wrapped, jnp.uint32(1) << prec, vb1 >> (32 - prec))
    lb_lo = vb1 << prec

    lb_f = lb_hi.astype(jnp.float32) * jnp.float32(2.0**32) \
        + lb_lo.astype(jnp.float32)
    size_f = sm1.astype(jnp.float32) + 1.0
    t0 = jnp.floor(lb_f / size_f).astype(jnp.uint32)
    # The f32 quotient has absolute error < 1 (q <= 2**16, rel err ~4e-7),
    # so the exact t lies in {t0-1, .., t0+2}.  Verify with exact split-u32
    # comparisons of size * c >= lb.
    def ok(c):
        hi, lo = _mul_size(sm1, c)
        return (hi > lb_hi) | ((hi == lb_hi) & (lo >= lb_lo))

    tm1 = jnp.maximum(t0, 1) - 1
    t = jnp.where(
        ok(tm1), tm1,
        jnp.where(ok(t0), t0, jnp.where(ok(t0 + 1), t0 + 1, t0 + 2)))
    return jnp.maximum(t, 1)


def _bucketize_row(cdf_row_f, bucket=16):
    """Precomputes (bucket_last [nb], win17 [nb, 1+bucket]) for one row.

    win17[b] = [last entry of bucket b-1 (or 0), entries of bucket b]; used
    by the bucketed symbol search (`_decode_symbol_bucketed`).
    """
    length = cdf_row_f.shape[0]
    pad = (-length) % bucket
    terminal = cdf_row_f[-1]
    row = jnp.concatenate(
        [cdf_row_f, jnp.full((pad,), terminal, cdf_row_f.dtype)])
    nb = row.shape[0] // bucket
    buckets = row.reshape(nb, bucket)
    bucket_last = buckets[:, -1]
    prev_last = jnp.concatenate(
        [jnp.zeros((1,), row.dtype), bucket_last[:-1]])
    win = jnp.concatenate([prev_last[:, None], buckets], axis=1)
    return bucket_last, win


def _decode_symbol_bucketed(state, src16, bucket_last, win17, max_pv, prec,
                            mask):
    """Single-row symbol decode with a two-level (16-ary) CDF search.

    The count of entries below the threshold splits into full buckets
    (prefix of `bucket_last < t`, by monotonicity) plus the count inside
    the single straddling bucket, whose entries are pulled with a one-hot
    MXU matmul.  ~4x fewer VPU ops per symbol than the flat scan.
    """
    base, sm1, value, chunks_read = state
    t = _symbol_threshold(state, prec)
    t_f = t.astype(jnp.float32)

    nb = bucket_last.shape[0]
    full = bucket_last[None, :] < t_f[:, None]  # [S, nb], prefix property
    nfull = jnp.sum(full.astype(jnp.float32), axis=1).astype(jnp.int32)
    bsel = jnp.minimum(nfull, nb - 1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], nb), 1)
              == bsel[:, None]).astype(jnp.float32)
    win = jnp.dot(onehot, win17, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # [S, 17]

    below = win < t_f[:, None]
    fine = jnp.sum(below[:, 1:].astype(jnp.float32), axis=1).astype(
        jnp.int32)
    pv = jnp.minimum(16 * nfull + fine, max_pv)

    c_lo = jnp.max(jnp.where(below, win, 0.0), axis=1).astype(jnp.uint32)
    c_hi = jnp.minimum(
        jnp.min(jnp.where(below, jnp.float32(2**17), win), axis=1),
        jnp.float32(2**16)).astype(jnp.uint32)

    a = _mul_shift(sm1, c_lo, prec)
    b = _mul_shift(sm1, c_hi, prec) - 1
    state = _refine_decoder(state, src16, a, b, mask)
    return state, pv.astype(jnp.uint32) - 1


def _decode_symbol(state, src16, cdf_rows_f, prec, mask):
    """Decodes one symbol per active lane. cdf_rows_f: [S, Lmax] float32.

    CDF values are exact in f32 (<= 2**16).  Rows must be padded on the
    right with the terminal value (2**precision), which never compares
    below the threshold, so no explicit length masking is needed.
    Entry lookups use masked min/max reductions over the (monotone) row —
    no gathers anywhere in the hot loop.
    """
    base, sm1, value, chunks_read = state
    t = _symbol_threshold(state, prec)

    t_f = t.astype(jnp.float32)
    body = cdf_rows_f[:, 1:]
    below = body < t_f[:, None]
    # pv = 1 + #{k >= 1 : cdf[k] < t}.
    counts = jnp.sum(below.astype(jnp.float32), axis=1)
    pv = 1 + counts.astype(jnp.int32)
    pv = jnp.minimum(pv, cdf_rows_f.shape[1] - 1)
    # Monotone row: cdf[pv-1] = max of entries < t (or cdf[0] == 0),
    # cdf[pv] = min of entries >= t.
    c_lo = jnp.max(jnp.where(below, body, 0.0), axis=1).astype(jnp.uint32)
    c_hi = jnp.minimum(
        jnp.min(jnp.where(below, jnp.float32(2**17), body), axis=1),
        jnp.float32(2**16)).astype(jnp.uint32)

    a = _mul_shift(sm1, c_lo, prec)
    b = _mul_shift(sm1, c_hi, prec) - 1
    state = _refine_decoder(state, src16, a, b, mask)
    return state, pv.astype(jnp.uint32) - 1


def _decode_binary(state, src16, mask):
    """Decodes one bit with the binary uniform CDF {0,1,2} at precision 1."""
    base, sm1, value, chunks_read = state
    vb1 = (value - base) + 1
    wrapped = vb1 == 0
    lb_hi = jnp.where(wrapped, jnp.uint32(2), vb1 >> 31)
    lb_lo = vb1 << 1
    # size * 1 = sm1 + 1: hi = (sm1 == U32), lo = sm1 + 1.
    rhs_lo = sm1 + 1
    rhs_hi = (rhs_lo == 0).astype(jnp.uint32)
    ge = (rhs_hi > lb_hi) | ((rhs_hi == lb_hi) & (rhs_lo >= lb_lo))
    bit = jnp.where(ge, jnp.uint32(0), jnp.uint32(1))
    # a,b from cdf values (bit, bit+1) at precision 1.
    a = _mul_shift(sm1, bit, jnp.uint32(1))
    b = _mul_shift(sm1, bit + 1, jnp.uint32(1)) - 1
    state = _refine_decoder(state, src16, a, b, mask)
    return state, bit


def _gamma_decode(state, src16, active):
    """Masked Elias-gamma decode for lanes in `active`."""

    def unary_cond(c):
        _, act, _ = c
        return jnp.any(act)

    def unary_body(c):
        state, act, n = c
        state, bit = _decode_binary(state, src16, act)
        n = n + jnp.where(act & (bit == 0), 1, 0).astype(jnp.uint32)
        # The n < 31 bound guards against infinite loops on corrupt streams.
        act = act & (bit == 0) & (n < 31)
        return state, act, n

    n0 = jnp.zeros(active.shape, jnp.uint32)
    state, _, n = jax.lax.while_loop(
        unary_cond, unary_body, (state, active, n0))

    value = jnp.where(active, jnp.uint32(1) << n, 0)

    def bits_cond(c):
        _, k, _ = c
        return jnp.any(k > 0)

    def bits_body(c):
        state, k, value = c
        act = active & (k > 0)
        state, bit = _decode_binary(state, src16, act)
        value = jnp.where(act, value | (bit << (k - 1)), value)
        k = jnp.where(act, k - 1, k)
        return state, k, value

    state, _, value = jax.lax.while_loop(
        bits_cond, bits_body, (state, jnp.where(active, n, 0), value))

    state, sign = _decode_binary(state, src16, active)
    return state, value, sign


@functools.partial(jax.jit, static_argnums=(3, 9))
def decode_core(src16, src_len, indexes, num_elements, cdf, length,
                precision, overflow, init_skip_unused=None,
                any_overflow=True):
    """Decodes [S, num_elements] symbols from padded 16-bit chunk buffers.

    Args:
      src16: uint32 [S, C] big-endian 16-bit chunks of the source bytes
        (zero-padded; odd trailing byte sits in a chunk's high byte).
      src_len: int32 [S] actual BYTE length per stream.
      indexes: int32 [S, num_elements] CDF row per element.
      num_elements: static int.
      cdf, length, precision, overflow: dense table arrays.
      any_overflow: static bool; skips gamma machinery when False.

    Returns:
      (symbols int32 [S, num_elements], sanity bool [S]).
    """
    del init_skip_unused
    num_streams = src16.shape[0]
    src16 = src16.astype(jnp.uint32)

    chunks0 = jnp.zeros(num_streams, jnp.int32)
    c0 = _fetch_chunk(src16, chunks0)
    c1 = _fetch_chunk(src16, chunks0 + 1)
    value0 = (c0 << 16) | c1
    init = (
        jnp.zeros(num_streams, jnp.uint32),
        jnp.full(num_streams, _MASK32, jnp.uint32),
        value0,
        jnp.full(num_streams, 2, jnp.int32),  # chunks_read
    )
    all_mask = jnp.ones(num_streams, bool)
    cdf_f = cdf.astype(jnp.float32)
    num_rows = cdf.shape[0]
    if num_rows == 1:
        bucket_last1, win17_1 = _bucketize_row(cdf_f[0])

    def step(state, row):
        if num_rows == 1:
            # Single shared row: bucketed two-level search, no gathers.
            len_r = jnp.broadcast_to(length[0], (num_streams,))
            prec_r = jnp.broadcast_to(precision[0], (num_streams,))
            ovf_r = jnp.broadcast_to(overflow[0], (num_streams,))
            state, sym = _decode_symbol_bucketed(
                state, src16, bucket_last1, win17_1, cdf.shape[1] - 1,
                prec_r, all_mask)
            sym = sym.astype(jnp.int32)
            if any_overflow:
                mv = len_r - 2
                esc = ovf_r & (sym == mv)
                state, gval, gsign = _gamma_decode(state, src16, esc)
                gv = gval.astype(jnp.int32)
                sym = jnp.where(
                    esc, jnp.where(gsign == 1, -gv, gv + mv - 1), sym)
            return state, sym
        else:
            # Row select as a one-hot matmul: runs on the MXU instead of a
            # serialized gather (values <= 2**16 are exact in f32).
            onehot = jax.nn.one_hot(row, num_rows, dtype=jnp.float32)
            cdf_rows_f = jnp.dot(
                onehot, cdf_f, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            len_r = length[row]
            prec_r = precision[row]
            ovf_r = overflow[row]
        state, sym = _decode_symbol(
            state, src16, cdf_rows_f, prec_r, all_mask)
        sym = sym.astype(jnp.int32)
        if any_overflow:
            mv = len_r - 2
            esc = ovf_r & (sym == mv)
            state, gval, gsign = _gamma_decode(state, src16, esc)
            gv = gval.astype(jnp.int32)
            decoded = jnp.where(
                gsign == 1, -gv, gv + mv - 1)
            sym = jnp.where(esc, decoded, sym)
        return state, sym

    state, symbols = jax.lax.scan(step, init, indexes.T)
    symbols = symbols.T

    # Weak sanity check (RangeDecoder::Finalize, range_coder.h:144-169).
    # The byte position after reading k chunks is min(2k, src_len), so the
    # "stream fully consumed" condition is 2 * chunks_read >= src_len.
    base, sm1, value, chunks_read = state
    upper_end = base + sm1
    straddle = upper_end < base
    shift_is24 = ((base - 1) >> 24) < (upper_end >> 24)
    shift = jnp.where(shift_is24, jnp.uint32(24), jnp.uint32(16))
    mid = ((base - 1) >> shift) + 1
    ok_mid = (mid << shift) == value
    sanity = jnp.where(
        (base == 0) | straddle, value == 0, ok_mid) & (
            2 * chunks_read >= src_len)
    return symbols, sanity


# -----------------------------------------------------------------------------
# Host-facing wrappers
# -----------------------------------------------------------------------------
def _round_up(x, m):
    return -(-x // m) * m


def encode_streams(symbols, table, indexes=None) -> tuple[np.ndarray, np.ndarray]:
    """Encodes int32 [S, N] symbols; returns (bytes [S, L] u8, lengths [S]).

    Host wrapper: computes the static micro-op budget from the data, then
    dispatches the jitted core.  Channel mode (indexes=None) assigns element
    j the CDF row ``j % num_rows``.
    """
    if isinstance(table, tables.CdfTable):
        table = DeviceCdfTable(table)
    symbols = np.asarray(symbols, np.int32)
    num_streams, n = symbols.shape

    if indexes is None:
        indexes = np.broadcast_to(
            np.arange(n, dtype=np.int32) % table.num_rows, (num_streams, n))
    indexes = np.asarray(indexes, np.int32)

    if _host_route(num_streams):
        # Consulted BEFORE the O(S*N) micro-op budget passes below: the
        # host fast path exists for low latency on a handful of long
        # streams, and host.encode_streams derives its own escape bound.
        from compression_tpu.codec import host
        DISPATCH_LOG["encode"] = "host"
        strings = host.encode_streams(
            symbols, _host_cdf_table(table), indexes)
        return from_bytes_list(strings)

    # Static micro-op budget (slots per symbol K, scan length T).
    len_np = table.host.length
    ovf_np = table.host.overflow
    mv = len_np[indexes] - 2
    ovf = ovf_np[indexes]
    sign = ovf & (symbols < 0)
    over = ovf & ~sign & (symbols >= mv)
    escape = sign | over
    gamma = np.where(sign, -symbols.astype(np.int64),
                     np.where(over, symbols - mv + 1, 1)).astype(np.uint32)
    nbits = np.floor(np.log2(np.maximum(gamma, 1))).astype(np.int64)
    count = np.where(escape, 3 + 2 * nbits, 1)
    slots = int(count.max()) if count.size else 1
    total = count.sum(axis=1).max() if count.size else 0
    num_steps = max(int(_round_up(max(int(total), 1), 64)), 64)
    out_size = _round_up(2 * num_steps + 2, 4)

    DISPATCH_LOG["encode"] = encode_path(table, n, num_steps, slots)

    buf, lengths = _encode_streams_jit(
        jnp.asarray(symbols), jnp.asarray(indexes), table, slots,
        num_steps, out_size)
    return np.asarray(buf), np.asarray(lengths)


def _pallas_encode_applicable(table) -> bool:
    """True when the fused single-row Pallas encode kernel serves this table.

    Single shared row, no overflow, precision <= 16 (pairs pack
    cdf[v] and cdf[v+1]-1 in 16 bits each), on a real TPU backend.
    Mirrors _pallas_decode_applicable.
    """
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (backend == "tpu"
            and int(table.num_rows) == 1
            and not bool(table.any_overflow)
            and int(table.host.precision[0]) <= 16)


def _pallas_encode_indexed_applicable(table) -> bool:
    """True when the indexed Pallas encode kernel serves this table.

    Any row-per-element table with per-row precision <= 16 (pairs pack
    cdf[v] and cdf[v+1]-1 in 16 bits each); outsized tables fall back
    (per-part gather cost grows with table size).  The DATA must be escape-free (every symbol in range, or
    escapes pre-mapped in sidecar mode) — callers guarantee this via the
    slots==1 micro-op budget.  Requires a real TPU backend (Mosaic).
    """
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend != "tpu":
        return False
    if int(table.host.precision.max()) > 16:
        return False
    total_pairs = int(np.sum(table.host.length - 1))
    return total_pairs <= 16384 and int(table.num_rows) <= 4096


def encode_path(table, n, num_steps, slots=1) -> str:
    """Name of the encode path dispatch will take for this call.

    Authoritative: ``encode_dispatch`` branches on this same function, so
    external gates (verify_tpu.py) can assert on it without duplicating
    the predicates.  ``slots`` is the per-symbol micro-op budget computed
    by the host wrapper (escapes => slots > 1 => XLA micro-op path).
    """
    if slots != 1:
        return "xla"
    if _pallas_encode_applicable(table) and num_steps >= n:
        return "pallas-single"
    if _pallas_encode_indexed_applicable(table) and num_steps >= n:
        return "pallas-indexed"
    return "xla"


def decode_path(table, num_elements, nchunks, channel_mode=True,
                in_stream_gamma=None) -> str:
    """Name of the decode path dispatch will take (see encode_path)."""
    if channel_mode and _pallas_decode_applicable(table):
        return "pallas-single"
    sub = _indexed_kernel_sub(num_elements, nchunks)
    if _pallas_indexed_applicable(table, in_stream_gamma) and sub is not None:
        return "pallas-indexed"
    return "xla"


class _DispatchLog:
    """Thread-local dispatch-path log with a dict-like surface.

    Written by every host-level entry point ("encode", "decode",
    "decode_sidecar"), including on jit-cache hits.  Backed by
    ``threading.local`` so concurrent encode/decode calls (threaded batch
    drivers) cannot interleave each other's path introspection entries;
    readers (verify_tpu.py) see only the paths chosen on their own thread.
    """

    def __init__(self):
        self._tls = threading.local()

    def _d(self) -> dict:
        d = getattr(self._tls, "d", None)
        if d is None:
            d = self._tls.d = {}
        return d

    def __setitem__(self, key, value):
        self._d()[key] = value

    def __getitem__(self, key):
        return self._d()[key]

    def get(self, key, default=None):
        return self._d().get(key, default)

    def clear(self):
        self._d().clear()

    def __contains__(self, key):
        return key in self._d()

    def __repr__(self):
        return repr(self._d())


#: Last path chosen by each host-level entry point on this thread.
DISPATCH_LOG = _DispatchLog()


def _host_route(num_streams) -> bool:
    """True when the native threaded host coder should serve this call.

    The device kernels want >= 1024 coder lanes to pay off; classic
    reference-format containers carry a HANDFUL of long streams (one per
    image, or one per ms2020 slice), where a device dispatch means a
    near-empty tile plus per-call tunnel latency while the host coder
    (bit-exact, ~67 M sym/s/thread) finishes in microseconds-per-KB.
    Only consulted by the reference-format wrappers (encode_streams /
    decode_streams); the sidecar/native-container and traced in-jit
    paths always stay on device.
    """
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    from compression_tpu.codec import host
    if not host.available():
        return False
    limit = int(os.environ.get("CTPU_HOST_ROUTE_MAX_STREAMS", "256"))
    return num_streams < limit


def _host_cdf_table(table) -> tables.CdfTable:
    """CdfTable view of a DeviceCdfTable's host metadata copy."""
    h = table.host
    return tables.CdfTable(
        cdf=np.asarray(h.cdf, np.int32),
        length=np.asarray(h.length, np.int32),
        precision=np.asarray(h.precision, np.int32),
        overflow=np.asarray(h.overflow, bool))


def encode_dispatch(symbols, table, num_steps, out_size, indexes=None):
    """Traced encode entry point: fused Pallas kernels when applicable, the
    micro-op expansion + scan otherwise.

    Safe to call inside jit (symbols/indexes may be tracers; the table must
    be concrete).  ``indexes=None`` selects channel mode (element j uses
    row ``j % num_rows``).  Only escape-free data may take the Pallas
    paths (callers guarantee this via the slots==1 micro-op budget).
    Output bytes are identical across paths.
    """
    num_streams, n = symbols.shape
    sub = 8
    pad = (-num_streams) % (sub * 128)
    path = encode_path(table, n, num_steps)

    if path == "pallas-single":
        from compression_tpu.codec import pallas_coder

        sym_p = jnp.pad(symbols, ((0, pad), (0, 0))) if pad else symbols
        cdf_row = table.host.cdf[0][: int(table.host.length[0])]
        buf, lengths = pallas_coder.encode_single_row_device(
            sym_p, cdf_row, int(table.host.precision[0]), out_size, sub=sub)
        return buf[:num_streams], lengths[:num_streams]

    if path == "pallas-indexed":
        from compression_tpu.codec import pallas_coder

        if indexes is None:
            indexes = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32) % table.num_rows,
                (num_streams, n))
        sym_p = jnp.pad(symbols, ((0, pad), (0, 0))) if pad else symbols
        idx_p = jnp.pad(indexes, ((0, pad), (0, 0))) if pad else indexes
        buf, lengths = pallas_coder.encode_indexed_device(
            sym_p, idx_p, table, out_size, sub=sub)
        return buf[:num_streams], lengths[:num_streams]

    if indexes is None:
        indexes = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32) % table.num_rows,
            (num_streams, n))
    ops = micro_ops_from_symbols(symbols, indexes, table, 1, num_steps)
    return encode_core(*ops, out_size)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _encode_streams_jit(symbols, indexes, table, slots, num_steps, out_size):
    if slots == 1:
        return encode_dispatch(
            symbols, table, num_steps, out_size, indexes=indexes)
    ops = micro_ops_from_symbols(symbols, indexes, table, slots, num_steps)
    return encode_core(*ops, out_size)


# -----------------------------------------------------------------------------
# Sidecar escape mode (TPU-native container variant)
# -----------------------------------------------------------------------------
# The reference codes out-of-range values as an in-stream escape symbol
# followed by Elias-gamma magnitude + sign bits (range_coder_kernels.cc:
# 290-322).  In-stream gamma poisons SIMD decode: with thousands of coder
# lanes, SOME lane escapes on nearly every step, so the whole tile pays the
# variable-length gamma machinery.  Sidecar mode moves the escape payload
# out of band: the stream carries only the escape marker symbol (whose
# probability is the table's tail mass, as in the reference), and the
# (position, value) pairs travel as two small int32 arrays in the
# container.  Decode then runs the cond-free segment kernel.  Compressed
# size is within a few bytes of the reference format (the same gamma bits,
# stored raw); reconstruction is exact.


def encode_streams_sidecar(symbols, table, indexes=None):
    """Encodes with escapes as bare markers + an out-of-band sidecar.

    Args:
      symbols: int32 [S, N] (values may be outside row ranges).
      table: CdfTable or DeviceCdfTable.
      indexes: optional int32 [S, N] CDF row per element (channel mode
        ``j % num_rows`` when None).

    Returns:
      (bytes [S, L] uint8, lengths [S] int32,
       esc_pos int32 [K, 2] (stream, element), esc_val int32 [K]).
    """
    if isinstance(table, tables.CdfTable):
        table = DeviceCdfTable(table)
    symbols = np.asarray(symbols, np.int32)
    num_streams, n = symbols.shape
    if indexes is None:
        indexes = np.broadcast_to(
            np.arange(n, dtype=np.int32) % table.num_rows, (num_streams, n))
    indexes = np.asarray(indexes, np.int32)

    len_np = table.host.length
    ovf_np = table.host.overflow
    mv = len_np[indexes] - 2
    escape = ovf_np[indexes] & ((symbols < 0) | (symbols >= mv))
    s_ix, e_ix = np.nonzero(escape)
    esc_pos = np.stack([s_ix, e_ix], axis=1).astype(np.int32)
    esc_val = symbols[escape].astype(np.int32)

    # slots=1 encodes exactly the marker interval for escaping elements
    # (micro_ops_from_symbols maps them to the escape symbol and the
    # single-slot path emits no gamma ops).
    num_steps = max(int(_round_up(max(n, 1), 64)), 64)
    out_size = _round_up(2 * num_steps + 2, 4)
    DISPATCH_LOG["encode"] = encode_path(table, n, num_steps, 1)
    buf, lengths = _encode_streams_jit(
        jnp.asarray(symbols), jnp.asarray(indexes), table, 1, num_steps,
        out_size)
    return np.asarray(buf), np.asarray(lengths), esc_pos, esc_val


def decode_streams_sidecar(byte_buf, byte_lens, num_elements, table,
                           esc_pos, esc_val, indexes=None):
    """Decodes sidecar-mode streams (see encode_streams_sidecar)."""
    if isinstance(table, tables.CdfTable):
        table = DeviceCdfTable(table)
    byte_lens = np.asarray(byte_lens, np.int32)
    num_streams = np.asarray(byte_buf).shape[0]
    src16 = bytes_to_chunks(byte_buf, byte_lens)

    if indexes is None:
        indexes = np.broadcast_to(
            np.arange(num_elements, dtype=np.int32) % table.num_rows,
            (num_streams, num_elements))
    indexes = np.asarray(indexes, np.int32)

    sub = _indexed_kernel_sub(num_elements, np.asarray(src16).shape[1])
    path = decode_path(table, num_elements, np.asarray(src16).shape[1],
                       channel_mode=False, in_stream_gamma=False)
    DISPATCH_LOG["decode_sidecar"] = path
    if path == "pallas-indexed":
        from compression_tpu.codec import pallas_coder

        pad = (-num_streams) % (sub * 128)
        src_p = np.pad(np.asarray(src16), ((0, pad), (0, 0))) if pad \
            else src16
        len_p = np.pad(byte_lens, (0, pad)) if pad else byte_lens
        idx_p = np.pad(indexes, ((0, pad), (0, 0))) if pad else indexes
        symbols, sanity = pallas_coder.decode_indexed_pallas(
            jnp.asarray(src_p), jnp.asarray(len_p), jnp.asarray(idx_p),
            int(num_elements), table, sub=sub, in_stream_gamma=False)
        symbols = np.asarray(symbols)[:num_streams]
        sanity = np.asarray(sanity)[:num_streams]
    else:
        symbols, sanity = decode_core(
            jnp.asarray(src16), jnp.asarray(byte_lens),
            jnp.asarray(indexes), int(num_elements), table.cdf,
            table.length, table.precision, table.overflow, None, False)
        symbols, sanity = np.asarray(symbols), np.asarray(sanity)

    symbols = np.array(symbols)
    esc_pos = np.asarray(esc_pos, np.int32).reshape(-1, 2)
    if esc_pos.size:
        symbols[esc_pos[:, 0], esc_pos[:, 1]] = np.asarray(
            esc_val, np.int32)
    return symbols, sanity


def sidecar_extract(symbols, escape, budget: int):
    """In-jit fixed-budget escape compaction (traced counterpart of the
    ``np.nonzero`` pass in encode_streams_sidecar).

    Args:
      symbols: int32 [S, N] (offset-subtracted coder symbols).
      escape: bool [S, N] escape mask.
      budget: static max number of escapes the caller reserves space for.

    Returns:
      (esc_idx int32 [budget] flat positions into symbols.ravel() in
       ascending (stream-major) order, padded with S*N (an out-of-range
       sentinel that scatter-drop ignores); esc_val int32 [budget];
       count int32 scalar; ok bool scalar — False when the data had more
       than ``budget`` escapes and the tail was dropped).
    """
    flat_esc = escape.ravel()
    flat_val = symbols.ravel()
    n = flat_esc.shape[0]
    slot = jnp.cumsum(flat_esc.astype(jnp.int32)) - 1
    count = jnp.sum(flat_esc.astype(jnp.int32))
    target = jnp.where(flat_esc, slot, budget)  # park non-escapes OOB
    pos = jnp.arange(n, dtype=jnp.int32)
    esc_idx = jnp.full((budget,), n, jnp.int32).at[target].set(
        pos, mode="drop")
    esc_val = jnp.zeros((budget,), jnp.int32).at[target].set(
        flat_val, mode="drop")
    return esc_idx, esc_val, count, count <= budget


def sidecar_apply(symbols, esc_idx, esc_val):
    """In-jit scatter of sidecar escape values into decoded symbols.

    ``esc_idx`` entries equal to S*N (the pad sentinel) are dropped.
    """
    s, n = symbols.shape
    flat = symbols.ravel().at[esc_idx].set(
        jnp.asarray(esc_val, symbols.dtype), mode="drop")
    return flat.reshape(s, n)


def sidecar_budget(num_symbols: int) -> int:
    """Default static escape budget for traced sidecar compress.

    Escapes carry the table's tail mass (~2^-8 of elements in the
    production Gaussian tables); 1/32 of the element count, floored at
    1024, covers that with a wide margin while keeping the compacted
    arrays small relative to the stream buffers.
    """
    return max(1024, int(num_symbols) // 32)


def sidecar_pad(esc_pos, esc_val, num_elements: int, total: int,
                bucket: int = 1024):
    """Pads host-side (stream, element) escape pairs to a static-bucket
    flat layout for the traced decode path.

    Returns (esc_idx int32 [K], esc_val int32 [K]) with K a multiple of
    ``bucket`` (compile-cache friendly) and padding set to ``total``
    (= S*N, the scatter-drop sentinel).
    """
    esc_pos = np.asarray(esc_pos, np.int32).reshape(-1, 2)
    esc_val = np.asarray(esc_val, np.int32).ravel()
    k = esc_pos.shape[0]
    width = max(bucket, int(_round_up(max(k, 1), bucket)))
    idx = np.full((width,), total, np.int32)
    val = np.zeros((width,), np.int32)
    if k:
        idx[:k] = esc_pos[:, 0] * int(num_elements) + esc_pos[:, 1]
        val[:k] = esc_val[:k]
    return idx, val


def bytes_to_chunks(byte_buf, byte_lens=None):
    """Packs a padded uint8 byte buffer [S, L] into u32 16-bit chunks.

    When lengths are given, the buffer is trimmed to the longest stream
    (+1 chunk of slack) — the chunk-feed scan in the decoder costs O(C)
    per symbol, so a tight C matters.
    """
    byte_buf = np.asarray(byte_buf, np.uint8)
    if byte_lens is not None:
        max_len = int(np.max(byte_lens, initial=0))
        width = min(byte_buf.shape[1], max_len + 2)
        byte_buf = byte_buf[:, :width]
    if byte_buf.shape[1] % 2:
        byte_buf = np.pad(byte_buf, ((0, 0), (0, 1)))
    hi = byte_buf[:, 0::2].astype(np.uint32)
    lo = byte_buf[:, 1::2].astype(np.uint32)
    return (hi << 8) | lo


def chunks_from_bytes_jit(byte_buf):
    """Traced counterpart of bytes_to_chunks' chunk packing.

    Lets the decode jits accept RAW uint8 byte buffers (half the upload
    bytes of pre-chunked u32 through the tunnel, util/transfer.py) and
    build the u32 16-bit chunks on device.  byte_buf [S, W] must have
    even W.
    """
    hi = byte_buf[:, 0::2].astype(jnp.uint32)
    lo = byte_buf[:, 1::2].astype(jnp.uint32)
    return (hi << 8) | lo


def compact_budget_words(num_symbols: int, num_streams: int,
                         scale: int = 1) -> int:
    """Static int32-word budget for compact_streams fetches.

    7 bits/symbol — far above any trained operating point of the model
    zoo (typical latents run 0.1-2 bits/symbol; even RANDOM-INIT
    weights measure ~5.4) — plus per-stream finalize + word-padding
    overhead, times ``scale`` (the codecs double scale and re-trace
    when a pathological payload overflows, so steady state stays
    compacted at any rate).
    """
    byte_budget = scale * ((7 * int(num_symbols)) // 8) + 8 * int(
        num_streams)
    return _round_up(byte_budget, 256) // 4


def compact_streams(buf, lengths, budget_words: int):
    """In-jit compaction of per-stream byte buffers for the packed fetch.

    The encoder emits padded [S, W] byte buffers (W = worst case), but
    only lengths[i] bytes per stream are real — fetching the padding
    costs tunnel bandwidth (~35-65 us/KB measured).  This packs each
    stream's bytes (rounded up to a 4-byte boundary per stream) into a
    flat int32 word buffer of static size ``budget_words``.

    Args:
      buf: uint8 [S, W] with W % 4 == 0.
      lengths: int32 [S] valid byte counts.
      budget_words: static output size.

    Returns:
      (words int32 [budget_words], ok bool — False when the payload
       exceeded the budget and the tail was dropped).
    Host side: ``compact_to_bytes_list(words, lengths)``.
    """
    s, w = buf.shape
    if w % 4:
        raise ValueError(f"buffer width {w} not a multiple of 4")
    words_per = (lengths.reshape(-1).astype(jnp.int32) + 3) // 4
    cum = jnp.cumsum(words_per)  # inclusive; cum[-1] = total words
    total = cum[-1]
    ok = total <= budget_words
    buf32 = jax.lax.bitcast_convert_type(
        buf.reshape(s, w // 4, 4), jnp.int32)  # [S, W/4] little-endian
    p = jnp.arange(budget_words, dtype=jnp.int32)
    # Stream owning word p: first i with cum[i] > p (binary search).
    i = jnp.searchsorted(cum, p, side="right").astype(jnp.int32)
    i = jnp.minimum(i, s - 1)
    starts = cum - words_per  # exclusive prefix
    j = jnp.clip(p - starts[i], 0, w // 4 - 1)
    vals = buf32[i, j]
    return jnp.where(p < total, vals, 0), ok


def compact_to_bytes_list(words, lengths) -> list[bytes]:
    """Host-side unpack of compact_streams output back to byte strings."""
    b = np.ascontiguousarray(np.asarray(words, np.int32)).view(np.uint8)
    out = []
    off = 0
    for ln in np.asarray(lengths, np.int64).reshape(-1):
        ln = int(ln)
        out.append(b[off: off + ln].tobytes())
        off += -(-ln // 4) * 4
    return out


def _pallas_decode_applicable(table) -> bool:
    """True when the lane-major Pallas decode kernel can serve this table.

    The kernel handles the single-shared-row, no-overflow case (the regime
    of batched entropy models and the bench workload) and requires a real
    TPU backend (Mosaic); everything else takes the XLA scan path.
    """
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (backend == "tpu"
            and int(table.num_rows) == 1
            and not bool(table.any_overflow))


def _pallas_indexed_applicable(table, in_stream_gamma=None) -> bool:
    """True when the indexed Pallas decode kernel can serve this table.

    Handles any row-per-element table (incl. overflow/escape rows) with
    per-row precision <= 15 (the 16-bit window packing); outsized tables
    fall back to the XLA scan (per-probe gather cost grows with table
    size).  Requires a real TPU backend (Mosaic).
    """
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend != "tpu":
        return False
    if int(table.host.precision.max()) > 15:
        return False
    if in_stream_gamma is None:
        in_stream_gamma = bool(table.any_overflow)
    # Total bucket count caps the packed window parts (gather cost).
    total_buckets = int(
        np.sum(-(-table.host.length // 16)))
    return total_buckets <= 16384 and int(table.num_rows) <= 4096


def _indexed_kernel_sub(num_elements, nchunks):
    """Largest sublane tile height whose VMEM blocks fit, or None.

    Per program the kernel holds the chunk buffer, the index block and the
    symbol output block in VMEM: ~(c_pad + 2N) * sub * 512 bytes.  Long
    single streams (the reference's one-stream-per-image containers) do
    not fit and take the XLA scan instead.
    """
    nb_pull = max((int(nchunks) + 16) // 16, 1) + 1
    c_pad = 16 * nb_pull + 32
    per_sub = (c_pad + 2 * int(num_elements)) * 128 * 4
    # Sublane tiles below 8 do not lower (Mosaic gather shape mismatch
    # observed at sub=1 on hardware; sub 2/4 rejected by the block-shape
    # divisibility rule) — long streams take the XLA scan instead; the
    # native container keeps streams short (<= 512 elements,
    # models/native_format.py) so production stays here.  The 12 MB cap
    # lets the bench regime (512 symbols/stream) pick sub=16, measured
    # ~1.6x faster than sub=8 on the in-stream escape decode
    # (tools/instream_sweep.py): 560-700 M (median ~600) vs 393 M sym/s.
    for sub in (16, 8):
        if per_sub * sub <= 12 * 1024 * 1024:
            return sub
    return None


def decode_dispatch(src16, byte_lens, num_elements, table, indexes=None,
                    in_stream_gamma=None):
    """Traced decode entry point: Pallas kernels when applicable, XLA scan
    otherwise.

    Safe to call inside jit (src16 / byte_lens / indexes may be tracers;
    the table must be concrete).  ``indexes=None`` selects channel mode
    (element j uses row ``j % num_rows``).  ``in_stream_gamma=False``
    selects sidecar-mode decode (escape markers returned as-is, no gamma
    bits consumed); default derives it from the table's overflow flags.
    """
    num_streams = src16.shape[0]
    path = decode_path(table, num_elements, src16.shape[1],
                       channel_mode=indexes is None,
                       in_stream_gamma=in_stream_gamma)

    if path == "pallas-single":
        from compression_tpu.codec import pallas_coder

        sub = 16
        pad = (-num_streams) % (sub * 128)
        src_p = jnp.pad(src16, ((0, pad), (0, 0))) if pad else src16
        len_p = jnp.pad(byte_lens, (0, pad)) if pad else byte_lens
        cdf_row = table.host.cdf[0][: int(table.host.length[0])]
        symbols, sanity = pallas_coder.decode_scan_pallas_v2(
            src_p, len_p, int(num_elements), cdf_row,
            int(table.host.precision[0]), sub=sub)
        return symbols[:num_streams], sanity[:num_streams]

    if indexes is None:
        indexes = jnp.broadcast_to(
            jnp.arange(num_elements, dtype=jnp.int32) % table.num_rows,
            (num_streams, num_elements))

    sub = _indexed_kernel_sub(num_elements, src16.shape[1])
    if path == "pallas-indexed":
        from compression_tpu.codec import pallas_coder

        pad = (-num_streams) % (sub * 128)
        if pad:
            src_p = jnp.pad(src16, ((0, pad), (0, 0)))
            len_p = jnp.pad(byte_lens, (0, pad))
            idx_p = jnp.pad(indexes, ((0, pad), (0, 0)))
        else:
            src_p, len_p, idx_p = src16, byte_lens, indexes
        symbols, sanity = pallas_coder.decode_indexed_pallas(
            src_p, len_p, idx_p, int(num_elements), table, sub=sub,
            in_stream_gamma=in_stream_gamma)
        return symbols[:num_streams], sanity[:num_streams]

    gamma = (table.any_overflow if in_stream_gamma is None
             else bool(in_stream_gamma))
    return decode_core(
        src16, byte_lens, jnp.asarray(indexes, jnp.int32),
        int(num_elements), table.cdf, table.length, table.precision,
        table.overflow, None, gamma)


def decode_streams(byte_buf, byte_lens, num_elements, table, indexes=None):
    """Decodes padded byte buffers back to int32 symbols [S, num_elements]."""
    if isinstance(table, tables.CdfTable):
        table = DeviceCdfTable(table)
    byte_lens = np.asarray(byte_lens, np.int32)
    num_streams = np.asarray(byte_buf).shape[0]

    if _host_route(num_streams):
        from compression_tpu.codec import host
        DISPATCH_LOG["decode"] = "host"
        strings = to_bytes_list(
            np.asarray(byte_buf, np.uint8), byte_lens)
        idx = None if indexes is None else np.asarray(indexes, np.int32)
        return host.decode_streams(
            strings, int(num_elements), _host_cdf_table(table), idx)

    src16 = bytes_to_chunks(byte_buf, byte_lens)
    DISPATCH_LOG["decode"] = decode_path(
        table, int(num_elements), np.asarray(src16).shape[1],
        channel_mode=indexes is None)
    symbols, sanity = decode_dispatch(
        jnp.asarray(src16), jnp.asarray(byte_lens), int(num_elements),
        table,
        None if indexes is None else jnp.asarray(indexes, jnp.int32))
    return np.asarray(symbols), np.asarray(sanity)


def to_bytes_list(buf, lengths) -> list[bytes]:
    """Extracts per-stream byte strings from a padded buffer."""
    return [bytes(buf[s, : int(lengths[s])].tobytes())
            for s in range(buf.shape[0])]


def from_bytes_list(strings) -> tuple[np.ndarray, np.ndarray]:
    """Packs byte strings into a padded [S, L] buffer + lengths."""
    lengths = np.asarray([len(s) for s in strings], np.int32)
    size = max(int(lengths.max(initial=0)), 1)
    buf = np.zeros((len(strings), size), np.uint8)
    for i, s in enumerate(strings):
        buf[i, : len(s)] = np.frombuffer(s, np.uint8)
    return buf, lengths
