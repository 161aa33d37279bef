"""Pallas TPU kernel for the range-encoder symbol scan.

The encoder recurrence (compression_tpu.codec.jax_coder._encode_step) is a
sequential loop over micro-ops with ~40 u32 VPU ops per step and per-stream
state.  As an XLA `lax.scan` this works but compiles slowly and keeps the
carry in memory; here the scan runs as a single Pallas kernel: the grid
tiles the stream axis, each program holds its block's coder state
``(base, size-1, delay, ptr, pend_start)`` in registers for the whole
micro-op loop, and emits the per-step chunk records (tag / value /
resolution events) that the vectorized post-pass in `jax_coder` resolves
into bytes.

Bit-exactness: identical integer recurrence as the scan path (verified by
the same golden tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encode_scan_pallas", "pair_lookup_pallas"]

_U16 = 0xFFFF
_MASK32 = 0xFFFFFFFF


def _mul_size(size_minus1, v):
    h = size_minus1 >> 16
    l = size_minus1 & _U16
    p1 = h * v
    p2a = l * v
    p2 = p2a + v
    c2 = (p2 < p2a).astype(jnp.uint32)
    lo1 = p1 << 16
    lo = lo1 + p2
    c1 = (lo < lo1).astype(jnp.uint32)
    hi = (p1 >> 16) + c2 + c1
    return hi, lo


def _mul_shift(size_minus1, v, precision):
    hi, lo = _mul_size(size_minus1, v)
    return (hi << (32 - precision)) | (lo >> precision)


def _encode_scan_kernel(lower_ref, upper_ref, prec_ref, mask_ref,
                        tag_ref, val_ref, rese_ref, resd_ref, state_ref):
    num_steps = lower_ref.shape[0]
    block = lower_ref.shape[1]

    base0 = jnp.zeros((block,), jnp.uint32)
    sm10 = jnp.full((block,), _MASK32, jnp.uint32)
    delay0 = jnp.zeros((block,), jnp.uint32)
    ptr0 = jnp.zeros((block,), jnp.int32)
    pend0 = jnp.zeros((block,), jnp.int32)

    def step(t, carry):
        base, sm1, delay, ptr, pend_start = carry
        lower = lower_ref[t, :]
        upper = upper_ref[t, :]
        prec = prec_ref[t, :]
        mask = mask_ref[t, :] != 0

        a = _mul_shift(sm1, lower, prec)
        b = _mul_shift(sm1, upper, prec) - 1
        nb = base + a
        overflow = nb < a
        ns = b - a
        straddle = (nb + ns) < nb
        renorm = (ns >> 16) == 0

        res_event = (delay != 0) & ~straddle & mask
        res_dir = overflow

        shifted_base = nb << 16
        shifted_sm1 = (ns << 16) | _U16
        new_base = jnp.where(renorm, shifted_base, nb)
        new_sm1 = jnp.where(renorm, shifted_sm1, ns)

        top = nb >> 16
        ambiguous = (shifted_base + shifted_sm1) < shifted_base

        tag = jnp.where(
            ~mask | ~renorm,
            0,
            jnp.where(straddle, 3, jnp.where(ambiguous, 2, 1)),
        ).astype(jnp.int32)

        new_delay = jnp.where(
            straddle, delay, jnp.where(tag == 2, top + 1, 0))
        w_val = jnp.where(
            tag == 2, top + 1, jnp.where(tag == 1, top, 0))
        new_pend = jnp.where(tag == 2, ptr, pend_start)
        new_ptr = ptr + 2 * (tag != 0)

        tag_ref[t, :] = tag
        val_ref[t, :] = jnp.where(tag > 0, w_val, 0)
        rese_ref[t, :] = res_event.astype(jnp.int32)
        resd_ref[t, :] = res_dir.astype(jnp.int32)

        keep = lambda new, old: jnp.where(mask, new, old)
        return (keep(new_base, base), keep(new_sm1, sm1),
                keep(new_delay, delay), keep(new_ptr, ptr),
                keep(new_pend, pend_start))

    base, sm1, delay, ptr, pend_start = jax.lax.fori_loop(
        0, num_steps, step, (base0, sm10, delay0, ptr0, pend0))
    state_ref[0, :] = base
    state_ref[1, :] = sm1
    state_ref[2, :] = delay
    state_ref[3, :] = ptr.astype(jnp.uint32)
    state_ref[4, :] = pend_start.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnums=(4,))
def encode_scan_pallas(lower, upper, prec, mask, block=256):
    """Runs the encoder scan over [T, S] micro-ops with a Pallas kernel.

    Returns (tag [T,S] i32, val [T,S] u32, res_event [T,S] bool,
    res_dir [T,S] bool, final_state tuple of [S] arrays
    (base, sm1, delay, ptr, pend_start)).
    """
    num_steps, num_streams = lower.shape
    if num_streams % block:
        raise ValueError(f"num_streams {num_streams} % block {block} != 0")
    grid = (num_streams // block,)

    in_spec = pl.BlockSpec(
        (num_steps, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((num_steps, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ] + [pl.BlockSpec((5, block), lambda i: (0, i), memory_space=pltpu.VMEM)]

    out_shape = [
        jax.ShapeDtypeStruct((num_steps, num_streams), jnp.int32),
        jax.ShapeDtypeStruct((num_steps, num_streams), jnp.uint32),
        jax.ShapeDtypeStruct((num_steps, num_streams), jnp.int32),
        jax.ShapeDtypeStruct((num_steps, num_streams), jnp.int32),
        jax.ShapeDtypeStruct((5, num_streams), jnp.uint32),
    ]

    tag, val, rese, resd, state = pl.pallas_call(
        _encode_scan_kernel,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=out_specs,
        out_shape=out_shape,
    )(lower, upper, prec, mask.astype(jnp.int32))

    final_state = (
        state[0], state[1], state[2],
        state[3].astype(jnp.int32), state[4].astype(jnp.int32))
    return tag, val, rese != 0, resd != 0, final_state


# -----------------------------------------------------------------------------
# Decoder kernel (single-row, no-overflow fast path)
# -----------------------------------------------------------------------------
def _make_decode_kernel(num_symbols, precision, max_pv, nb):
    """Builds the decode kernel body for a single shared CDF row.

    precision is static (single row), so all shifts are compile-time
    constants.  Per symbol: exact threshold (f32 + split-u32 fixup),
    bucketed CDF search with the straddling bucket pulled by a small dot,
    one-hot chunk feed.  State lives in registers across the symbol loop.
    """
    shift_up = 32 - precision

    def kernel(src16_ref, len_ref, blast_ref, win_ref, sym_ref, san_ref):
        block = src16_ref.shape[0]
        nchunks = src16_ref.shape[1]

        def u2f(x):
            # Mosaic has no u32->f32 cast; split into 16-bit halves that
            # fit int32 (u32<->i32 astype is supported).
            hi = (x >> 16).astype(jnp.int32).astype(jnp.float32)
            lo = (x & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
            return hi * jnp.float32(65536.0) + lo

        def f2u(f):
            # Exact for 0 <= f < 2**31 (we only convert small thresholds).
            return f.astype(jnp.int32).astype(jnp.uint32)

        def b2f(b):
            return jnp.where(b, jnp.float32(1.0), jnp.float32(0.0))

        def mul_size(sm1, v):
            h = sm1 >> 16
            l = sm1 & 0xFFFF
            p1 = h * v
            p2a = l * v
            p2 = p2a + v
            c2 = (p2 < p2a).astype(jnp.uint32)
            lo1 = p1 << 16
            lo = lo1 + p2
            c1 = (lo < lo1).astype(jnp.uint32)
            return (p1 >> 16) + c2 + c1, lo

        def mul_shift(sm1, v):
            hi, lo = mul_size(sm1, v)
            return (hi << shift_up) | (lo >> precision)

        def fetch_chunk(chunks_read):
            # src16 arrives as int32 (values <= 0xFFFF): Mosaic has no
            # unsigned reductions.
            k = jax.lax.broadcasted_iota(
                jnp.int32, (block, nchunks), 1)
            sel = k == chunks_read[:, None]
            return jnp.sum(
                jnp.where(sel, src16_ref[:, :], 0), axis=1).astype(
                    jnp.uint32)

        blast = blast_ref[0, :]  # [nb] f32 bucket-last values
        win17 = win_ref[:, :]    # [nb, 17] f32

        c0 = fetch_chunk(jnp.zeros((block,), jnp.int32))
        c1 = fetch_chunk(jnp.ones((block,), jnp.int32))
        value0 = (c0 << 16) | c1

        def step(t, carry):
            base, sm1, value, chunks_read = carry
            vb1 = (value - base) + 1
            wrapped = vb1 == 0
            lb_hi = jnp.where(
                wrapped, jnp.uint32(1 << precision), vb1 >> shift_up)
            lb_lo = vb1 << precision
            lb_f = u2f(lb_hi) * jnp.float32(2.0**32) + u2f(lb_lo)
            size_f = u2f(sm1) + 1.0
            t0 = f2u(jnp.floor(lb_f / size_f))

            def ok(c):
                hi, lo = mul_size(sm1, c)
                return (hi > lb_hi) | ((hi == lb_hi) & (lo >= lb_lo))

            # Mosaic has no unsigned max; use where-selects.
            tm1 = jnp.where(t0 > 1, t0, jnp.uint32(1)) - 1
            thr = jnp.where(
                ok(tm1), tm1,
                jnp.where(ok(t0), t0,
                          jnp.where(ok(t0 + 1), t0 + 1, t0 + 2)))
            thr = jnp.where(thr > 1, thr, jnp.uint32(1))
            t_f = u2f(thr)

            full = blast[None, :] < t_f[:, None]  # [block, nb]
            nfull = jnp.sum(b2f(full), axis=1).astype(jnp.int32)
            bsel = jnp.minimum(nfull, nb - 1)
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (block, nb), 1) == bsel[:, None]).astype(
                    jnp.float32)
            win = jnp.dot(onehot, win17,
                          preferred_element_type=jnp.float32)  # [block, 17]

            below = win < t_f[:, None]
            fine = jnp.sum(b2f(below[:, 1:]), axis=1).astype(jnp.int32)
            pv = jnp.minimum(16 * nfull + fine, max_pv)
            c_lo = f2u(jnp.max(jnp.where(below, win, 0.0), axis=1))
            c_hi = f2u(jnp.minimum(
                jnp.min(jnp.where(below, jnp.float32(2**17), win), axis=1),
                jnp.float32(2**16)))

            a = mul_shift(sm1, c_lo)
            b = mul_shift(sm1, c_hi) - 1
            nbse = base + a
            ns = b - a
            renorm = (ns >> 16) == 0
            new_base = jnp.where(renorm, nbse << 16, nbse)
            new_sm1 = jnp.where(renorm, (ns << 16) | 0xFFFF, ns)
            chunk = fetch_chunk(chunks_read)
            new_value = jnp.where(renorm, (value << 16) | chunk, value)
            new_chunks = chunks_read + jnp.where(renorm, 1, 0)

            sym_ref[t, :] = pv - 1  # int32 output
            return new_base, new_sm1, new_value, new_chunks

        base, sm1, value, chunks_read = jax.lax.fori_loop(
            0, num_symbols, step,
            (jnp.zeros((block,), jnp.uint32),
             jnp.full((block,), _MASK32, jnp.uint32),
             value0,
             jnp.full((block,), 2, jnp.int32)))

        # Weak sanity (RangeDecoder::Finalize).  Computed in int32 (i1
        # vector selects hit Mosaic truncation limits on 1-D shapes).
        upper_end = base + sm1
        straddle = upper_end < base
        is24 = ((base - 1) >> 24) < (upper_end >> 24)
        mid24 = (((base - 1) >> 24) + 1) << 24
        mid16 = (((base - 1) >> 16) + 1) << 16
        mid = jnp.where(is24, mid24, mid16)
        ok_mid_i = jnp.where(mid == value, 1, 0)
        zero_i = jnp.where(value == 0, 1, 0)
        head_i = jnp.where((base == 0) | straddle, zero_i, ok_mid_i)
        consumed_i = jnp.where(2 * chunks_read >= len_ref[0, :], 1, 0)
        san_ref[0, :] = head_i * consumed_i

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def decode_scan_pallas(src16, byte_lens, num_symbols, precision, max_pv,
                       bucket_last, win17, block=256):
    """Single-row decode as a Pallas kernel.

    Args:
      src16: uint32 [S, C] chunk buffers.
      byte_lens: int32 [S].
      num_symbols / precision / max_pv: static ints.
      bucket_last: static tuple of f32 bucket-last values.
      win17: static tuple-of-tuples [nb][17] f32 window table.

    Returns:
      (symbols int32 [S, num_symbols], sanity bool [S]).
    """
    num_streams, nchunks = src16.shape
    nb = len(bucket_last)
    blast = jnp.asarray(bucket_last, jnp.float32)[None, :]
    win = jnp.asarray(win17, jnp.float32)
    kernel = _make_decode_kernel(num_symbols, precision, max_pv, nb)

    grid = (num_streams // block,)
    sym, san = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, nchunks), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 17), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_symbols, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_symbols, num_streams), jnp.int32),
            jax.ShapeDtypeStruct((1, num_streams), jnp.int32),
        ],
    )(src16.astype(jnp.int32), byte_lens[None, :], blast, win)
    return sym.T, san[0] != 0


# -----------------------------------------------------------------------------
# CDF pair-lookup kernel (encoder prep)
# -----------------------------------------------------------------------------
def _make_pair_lookup_kernel(nb):
    """Builds the (cdf[i], cdf[i+1]) lookup kernel.

    Two-level select with the window table in SMEM: an fori_loop over the
    ~K/16 buckets pulls each lane's 17-wide window into registers with
    scalar-broadcast selects (no one-hot materialization, no matmul), then
    a static 17-way select picks positions ``i & 15`` and ``(i & 15) + 1``.
    All int32 — CDF values <= 2**16.

    Status: bit-exact on TPU (unlike the decode kernel), but measured NO
    faster than jax_coder's XLA two-level one-hot (~15-16 ms vs ~14 ms for
    32k x 512 lanes) — encoder prep is not bound by lookup compute.  Kept
    as the starting point for a future fused prep+scan kernel.
    """

    def kernel(win_ref, idx_ref, lo_ref, hi_ref):
        idx = idx_ref[:, :]
        b = idx >> 4
        r = idx & 15

        zeros = jnp.zeros_like(idx)
        w0 = tuple(zeros for _ in range(17))

        def body(bb, w):
            sel = b == bb
            return tuple(
                jnp.where(sel, win_ref[bb, j], w[j]) for j in range(17))

        w = jax.lax.fori_loop(0, nb, body, w0)

        c_lo = zeros
        c_hi = zeros
        for j in range(17):
            if j < 16:
                c_lo = jnp.where(r == j, w[j], c_lo)
            if j >= 1:
                c_hi = jnp.where(r + 1 == j, w[j], c_hi)
        lo_ref[:, :] = c_lo
        hi_ref[:, :] = c_hi

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def pair_lookup_pallas(win17, idx2, block_cols=256):
    """(cdf[i], cdf[i+1]) for flat table indices, as a Pallas kernel.

    Operates directly on the caller's 2-D [R, C] layout (the encoder's
    [num_steps, num_streams]) so no relayouts are inserted around the
    kernel — a flattened variant was measured no faster than XLA purely
    because of the reshape/relayout traffic it forced.

    Args:
      win17: int32 [nb, 17] overlapping windows of the flat CDF table
        (win17[b] = flat[16b : 16b+17], terminal-padded).
      idx2: int32 [R, C] flat table indices, C % block_cols == 0.
      block_cols: stream-axis tile width per program.

    Returns:
      (c_lo, c_hi) int32 [R, C].
    """
    rows, cols = idx2.shape
    nb = win17.shape[0]
    if cols % block_cols:
        raise ValueError(f"cols {cols} % block_cols {block_cols} != 0")
    # The kernel keeps 17 window arrays of the block shape live; cap the
    # row-tile so scoped VMEM stays ~2 MB (17 * 128 * 256 * 4B).
    block_rows = 128 if rows % 128 == 0 else rows
    grid = (rows // block_rows, cols // block_cols)

    kernel = _make_pair_lookup_kernel(nb)
    io_spec = pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    lo, hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, 17), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            io_spec,
        ],
        out_specs=[io_spec, io_spec],
        out_shape=[
            jax.ShapeDtypeStruct(idx2.shape, jnp.int32),
            jax.ShapeDtypeStruct(idx2.shape, jnp.int32),
        ],
    )(win17, idx2)
    return lo, hi
