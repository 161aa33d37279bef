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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# decode_scan_pallas (v1) is deliberately NOT exported: it is
# interpret-mode-correct but miscompiles under the current Mosaic
# toolchain on real TPU (silent wrong results; see docs/ROUND_NOTES.md).
# It is kept only as an interpret-mode cross-check for the v2 kernel and
# refuses to run compiled — decode_scan_pallas_v2 is the production path.
__all__ = ["encode_scan_pallas",
           "decode_scan_pallas_v2", "decode_indexed_pallas",
           "pair_lookup_pallas"]

_U16 = 0xFFFF
_MASK32 = 0xFFFFFFFF

# Saved so the v1 quarantine check can tell a monkeypatched interpret-mode
# pallas_call (tests) from the real compiled path.
_ORIG_PALLAS_CALL = pl.pallas_call


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
                        rec_ref, state_ref):
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

        # Packed record: val(17b) | tag(2b) | res_event(1b) | dir(1b).
        val = jnp.where(tag > 0, w_val, 0).astype(jnp.int32)
        rec_ref[t, :] = (val | (tag << 17)
                         | (res_event.astype(jnp.int32) << 19)
                         | (res_dir.astype(jnp.int32) << 20))

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

    Returns (rec [T,S] i32 packed val(17b)|tag(2b)|res_event(1b)|dir(1b),
    final_state tuple of [S] arrays (base, sm1, delay, ptr, pend_start)).
    """
    num_steps, num_streams = lower.shape
    if num_streams % block:
        raise ValueError(f"num_streams {num_streams} % block {block} != 0")
    grid = (num_streams // block,)

    in_spec = pl.BlockSpec(
        (num_steps, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((num_steps, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]

    out_shape = [
        jax.ShapeDtypeStruct((num_steps, num_streams), jnp.int32),
        jax.ShapeDtypeStruct((5, num_streams), jnp.uint32),
    ]

    rec, state = pl.pallas_call(
        _encode_scan_kernel,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=out_specs,
        out_shape=out_shape,
    )(lower, upper, prec, mask.astype(jnp.int32))

    final_state = (
        state[0], state[1], state[2],
        state[3].astype(jnp.int32), state[4].astype(jnp.int32))
    return rec, final_state


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
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # [block, 17]
            # HIGHEST is load-bearing: CDF values reach 2**16 and the MXU's
            # default bf16 passes round them (silent wrong symbols on TPU).

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
    """QUARANTINED v1 single-row decode kernel — interpret mode only.

    Miscompiles under the current Mosaic toolchain on real TPU (silent
    wrong results); kept as an interpret-mode oracle for kernel-logic
    tests.  Raises if invoked with a compiled TPU backend; production
    uses decode_scan_pallas_v2.

    Args:
      src16: uint32 [S, C] chunk buffers.
      byte_lens: int32 [S].
      num_symbols / precision / max_pv: static ints.
      bucket_last: static tuple of f32 bucket-last values.
      win17: static tuple-of-tuples [nb][17] f32 window table.

    Returns:
      (symbols int32 [S, num_symbols], sanity bool [S]).
    """
    if (pl.pallas_call is _ORIG_PALLAS_CALL
            and jax.default_backend() == "tpu"):
        raise RuntimeError(
            "decode_scan_pallas (v1) is quarantined: it miscompiles on "
            "real TPU (silent wrong results). Use decode_scan_pallas_v2.")
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
# Decoder kernel v2: lane-major layout (the production fast path)
# -----------------------------------------------------------------------------
#
# v1 above keeps per-stream state in 1-D (block,) vectors and pulls CDF
# windows with an MXU one-hot dot; on TPU that forces a lane<->sublane
# relayout on nearly every step (measured ~2 us/step for 256 streams —
# 4.7x slower than the XLA scan).  v2 never leaves the native (SUB, 128)
# vreg tiling:
#
#   * streams live at (sublane, lane); all state is (SUB, 128) u32,
#   * the symbol search is a select-accumulate over the *static* bucket
#     index against SMEM scalars (no gathers, no dots, no relayouts),
#   * the chunk feed holds a 32-chunk window in registers per lane,
#     refilled once per 16-step segment from the VMEM-resident chunk
#     buffer (layout [C, SUB, 128], chunk-major) — HBM is touched once.
#
# Bit-exactness: integer recurrence identical to jax_coder's scan path
# (reference cc/lib/range_coder.h:224-282 DecodeInternal/Read16BitValue);
# the threshold search reproduces RangeDecoder's exact integer threshold
# via an f32 quotient plus +-2 integer correction (exact because
# quantities stay below 2**24 where f32 is integral).


def _make_decode_kernel_v2(num_symbols, precision, max_pv, nb, nb_pull,
                           sub):
    """Builds the lane-major decode kernel for one shared CDF row.

    Static parameters:
      num_symbols: symbols per stream (any int; full 16-step segments run
        in a fori_loop, the remainder is unrolled statically).
      precision: range-coder precision of the row.
      max_pv: alphabet size (pv is clamped to it, as in the scan path).
      nb: number of 16-wide CDF buckets (windows of 17 values each).
      nb_pull: number of 16-chunk source buckets the feed may start from.
      sub: sublane tile height (streams per program = sub * 128).
    """
    shift_up = 32 - precision
    seg_count = num_symbols // 16

    def kernel(src_ref, len_ref, blast_ref, win_ref, sym_ref, san_ref):
        def u2f(x):
            hi = (x >> 16).astype(jnp.int32).astype(jnp.float32)
            lo = (x & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
            return hi * jnp.float32(65536.0) + lo

        def f2u(f):
            return f.astype(jnp.int32).astype(jnp.uint32)

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

        c0 = src_ref[0].astype(jnp.uint32)
        c1 = src_ref[1].astype(jnp.uint32)
        value0 = (c0 << 16) | c1

        def pull_window(chunks_read):
            # Per-lane 32-chunk window starting at the lane's current
            # 16-aligned source bucket.  Select-accumulate over the static
            # bucket index; rows beyond the real buffer are zero-padded
            # on the host.
            b0 = jnp.minimum(chunks_read >> 4, nb_pull - 1)
            window = [jnp.zeros_like(value0, dtype=jnp.int32)] * 32
            for b in range(nb_pull):
                m = b0 == b
                for j in range(32):
                    row = src_ref[16 * b + j]
                    window[j] = jnp.where(m, row, window[j])
            return window, b0 << 4

        def one_step(carry, window, base16, t):
            base, sm1, value, chunks_read = carry

            # --- exact decode threshold (v1 logic, proven on TPU) ---
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

            tm1 = jnp.where(t0 > 1, t0, jnp.uint32(1)) - 1
            thr = jnp.where(
                ok(tm1), tm1,
                jnp.where(ok(t0), t0,
                          jnp.where(ok(t0 + 1), t0 + 1, t0 + 2)))
            thr = jnp.where(thr > 1, thr, jnp.uint32(1))
            thr_i = thr.astype(jnp.int32)  # <= 2**16: exact in i32

            # --- bucketed symbol search, all on lane-major tiles ---
            nfull = jnp.zeros_like(thr_i)
            for b in range(nb):
                nfull = nfull + jnp.where(blast_ref[0, b] < thr_i, 1, 0)
            bsel = jnp.minimum(nfull, nb - 1)
            w = [None] * 17
            for b in range(nb):
                m = bsel == b
                for j in range(17):
                    v = win_ref[0, 17 * b + j]
                    w[j] = v if b == 0 else jnp.where(m, v, w[j])
            fine = jnp.zeros_like(thr_i)
            c_lo = jnp.zeros_like(thr_i)
            c_hi = jnp.full_like(thr_i, 1 << 30)
            for j in range(17):
                below = w[j] < thr_i
                if j > 0:
                    fine = fine + jnp.where(below, 1, 0)
                c_lo = jnp.where(below, jnp.maximum(c_lo, w[j]), c_lo)
                c_hi = jnp.where(below, c_hi, jnp.minimum(c_hi, w[j]))
            pv = jnp.minimum(16 * nfull + fine, max_pv)
            c_hi = jnp.minimum(c_hi, 1 << 16)

            # --- interval update + renormalization ---
            a = mul_shift(sm1, c_lo.astype(jnp.uint32))
            b_ = mul_shift(sm1, c_hi.astype(jnp.uint32)) - 1
            nbse = base + a
            ns = b_ - a
            renorm = (ns >> 16) == 0

            # --- chunk feed from the register window ---
            offs = chunks_read - base16
            ovf = offs >= 32
            sel = window
            for bit in (16, 8, 4, 2, 1):
                half = [jnp.where(offs & bit != 0, sel[i + bit], sel[i])
                        for i in range(bit)]
                sel = half
            chunk = jnp.where(ovf, 0, sel[0]).astype(jnp.uint32)

            base = jnp.where(renorm, nbse << 16, nbse)
            sm1 = jnp.where(renorm, (ns << 16) | 0xFFFF, ns)
            value = jnp.where(renorm, (value << 16) | chunk, value)
            chunks_read = chunks_read + jnp.where(renorm, 1, 0)

            sym_ref[t] = pv - 1
            return base, sm1, value, chunks_read

        def segment(seg, carry):
            window, base16 = pull_window(carry[3])
            for _k in range(16):
                carry = one_step(carry, window, base16, seg * 16 + _k)
            return carry

        carry = (jnp.zeros_like(value0),
                 jnp.full_like(value0, _MASK32),
                 value0,
                 jnp.full_like(value0, 2, dtype=jnp.int32))
        carry = jax.lax.fori_loop(0, seg_count, segment, carry)

        # Static remainder: exactly num_symbols steps total, so the final
        # coder state (and thus the sanity check) matches the scan path.
        rem = num_symbols - 16 * seg_count
        if rem:
            window, base16 = pull_window(carry[3])
            for _k in range(rem):
                carry = one_step(carry, window, base16, 16 * seg_count + _k)
        base, sm1, value, chunks_read = carry

        # Weak decoder sanity (RangeDecoder::Finalize), int32 select form.
        upper_end = base + sm1
        straddle = upper_end < base
        is24 = ((base - 1) >> 24) < (upper_end >> 24)
        mid24 = (((base - 1) >> 24) + 1) << 24
        mid16 = (((base - 1) >> 16) + 1) << 16
        mid = jnp.where(is24, mid24, mid16)
        ok_mid_i = jnp.where(mid == value, 1, 0)
        zero_i = jnp.where(value == 0, 1, 0)
        head_i = jnp.where((base == 0) | straddle, zero_i, ok_mid_i)
        consumed_i = jnp.where(2 * chunks_read >= len_ref[:, :], 1, 0)
        san_ref[:, :] = head_i * consumed_i

    return kernel


def _decode_v2_tables(cdf_row):
    """Bucket tables for the v2 search, like _bucketize_row but int32.

    win[b] = [last value of bucket b-1 (or 0), the 16 values of bucket b].
    """
    cdf_row = np.asarray(cdf_row, np.int64)
    length = len(cdf_row)
    nb = max(-(-length // 16), 1)
    terminal = cdf_row[-1]
    padded = np.concatenate(
        [cdf_row, np.full(16 * nb - length, terminal, np.int64)])
    buckets = padded.reshape(nb, 16)
    blast = buckets[:, -1].astype(np.int32)
    win = np.zeros((nb, 17), np.int32)
    win[:, 0] = np.concatenate([[0], buckets[:-1, -1]])
    win[:, 1:] = buckets
    return blast[None, :], win.reshape(1, -1)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _decode_v2_call(src16, byte_lens, blast, win, num_symbols, precision,
                    max_pv, sub):
    num_streams, nchunks = src16.shape
    nsub = num_streams // 128
    nb = win.shape[1] // 17

    # Chunk-major layout, zero padded so every in-range window read is 0.
    nb_pull = max((nchunks + 16) // 16, 1) + 1
    c_pad = 16 * nb_pull + 32
    src_t = jnp.zeros((c_pad, nsub, 128), jnp.int32)
    src_t = src_t.at[:nchunks].set(
        jnp.asarray(src16, jnp.uint32).astype(jnp.int32)
        .T.reshape(nchunks, nsub, 128))
    len2 = jnp.asarray(byte_lens, jnp.int32).reshape(nsub, 128)

    grid = (nsub // sub,)
    kernel = _make_decode_kernel_v2(
        num_symbols, precision, max_pv, nb, nb_pull, sub)
    sym, san = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c_pad, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blast.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, win.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_symbols, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_symbols, nsub, 128), jnp.int32),
            jax.ShapeDtypeStruct((nsub, 128), jnp.int32),
        ],
    )(src_t, len2, blast, win)
    # [T, NSUB, 128] -> [S, num_symbols]
    sym = sym.reshape(num_symbols, nsub * 128).T
    return sym, san.reshape(-1) != 0


def decode_scan_pallas_v2(src16, byte_lens, num_symbols, cdf_row,
                          precision, sub=8):
    """Lane-major Pallas decode for a single shared no-overflow CDF row.

    Args:
      src16: uint32/int32 [S, C] 16-bit chunk buffers (S % (sub*128) == 0).
      byte_lens: int32 [S] byte lengths (for the sanity check only).
      num_symbols: symbols per stream.
      cdf_row: 1-D int array, the row's CDF values (length = alphabet + 1).
      precision: the row's range-coder precision.
      sub: sublane tile height per program (streams per program = sub*128).

    Returns:
      (symbols int32 [S, num_symbols], sanity bool [S]).
    """
    num_streams = src16.shape[0]
    if num_streams % (sub * 128):
        raise ValueError(f"num_streams {num_streams} % {sub * 128} != 0")
    blast, win = _decode_v2_tables(cdf_row)
    max_pv = len(np.asarray(cdf_row)) - 1
    return _decode_v2_call(
        src16, byte_lens, jnp.asarray(blast), jnp.asarray(win),
        int(num_symbols), int(precision), int(max_pv), int(sub))


# -----------------------------------------------------------------------------
# Indexed decoder kernel: lane-major, any CDF row per element, overflow mode
# -----------------------------------------------------------------------------
#
# The production regime of bmshj2018/ms2020/universal decode: each element
# selects its own CDF row (`indexes`), rows may differ in length and
# precision, and overflow rows append an escape symbol followed by an
# Elias-gamma magnitude + sign coded with the binary uniform CDF at
# precision 1 (reference cc/kernels/range_coder_kernels.cc:449-471
# OverflowDecode).  The XLA scan path serves this regime with a one-hot
# MXU row-select plus a full-row threshold scan per symbol — O(rows x
# max_len) work per step.  This kernel keeps everything lane-major like
# decode v2 and replaces both with O(log) work per step:
#
#   * rows are 16-bucketed once on the host; the 17 window positions are
#     stored TRANSPOSED (one array per window position, indexed by global
#     bucket id) and 16-bit packed, so a per-lane probe is a 2-3 part
#     `take_along_axis` gather instead of a row materialization,
#   * the symbol search is a binary search over the row's bucket-last
#     values (log2(max buckets/row) probes) plus a 17-probe fine pass
#     that also yields the bracketing (cdf[pv-1], cdf[pv]) pair,
#   * per-row metadata (bucket offset/count, precision, escape value,
#     overflow flag) gathers from lane-replicated vectors,
#   * the chunk feed reuses v2's register-resident 32-chunk window, but
#     refilled ON DEMAND (whenever any lane is within reach of the edge),
#     which both amortizes the refill over ~16+ symbols and stays correct
#     under the variable-length gamma escape path,
#   * the gamma path itself runs under `lax.cond` on "any lane escaped",
#     so no-escape steps pay one reduction.
#
# Bit-exactness: same integer recurrences as jax_coder.decode_core
# (reference cc/lib/range_coder.h:224-282); the threshold search uses the
# proven f32-quotient + exact fixup from v1/v2.  Requires precision <= 15
# per row (values then fit the 16-bit packing; the terminal 2^16 of a
# precision-16 row would not).


def _make_decode_kernel_indexed(num_symbols, parts_b, parts_r, bs_iters,
                                nb_pull, sub, any_overflow):
    """Builds the lane-major indexed decode kernel.

    Static parameters:
      num_symbols: symbols per stream.
      parts_b: 128-lane parts of the packed window arrays (2 values/word).
      parts_r: 128-lane parts of the per-row metadata vectors.
      bs_iters: bucket binary-search iterations (covers the widest row).
      nb_pull: number of 16-chunk source buckets the feed may start from.
      sub: sublane tile height (streams per program = sub * 128).
      any_overflow: include the escape/gamma machinery.
    """

    def kernel(src_ref, len_ref, idx_ref, w_ref, meta_ref, sym_ref,
               san_ref, *scratch):
        # Overflow variant: the 32-chunk source window lives in VMEM
        # scratch (win_ref) with its per-lane base in b16_ref, so the
        # escape conds/whiles carry only the 4 coder-state arrays —
        # carrying the window through scf region boundaries spills
        # ~128 KB per step and was measured ~6x slower end to end.
        win_ref = scratch[0] if any_overflow else None
        b16_ref = scratch[1] if any_overflow else None
        la_ref = scratch[2] if any_overflow else None
        labase_ref = scratch[3] if any_overflow else None

        def u2f(x):
            hi = (x >> 16).astype(jnp.int32).astype(jnp.float32)
            lo = (x & 0xFFFF).astype(jnp.int32).astype(jnp.float32)
            return hi * jnp.float32(65536.0) + lo

        def f2u(f):
            return f.astype(jnp.int32).astype(jnp.uint32)

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

        def mul_shift_v(sm1, v, prec):
            hi, lo = mul_size(sm1, v)
            return (hi << (jnp.uint32(32) - prec)) | (lo >> prec)

        def mul_shift1(sm1, v):
            hi, lo = mul_size(sm1, v)
            return (hi << 31) | (lo >> 1)

        def rep(row):  # (128,) -> (sub, 128)
            return jnp.broadcast_to(row[None, :], (sub, 128))

        def gather_w(j, g):
            """Window value j at global bucket id g (16-bit packed)."""
            word = g >> 1
            lane = word & 127
            pix = word >> 7
            acc = jnp.take_along_axis(rep(w_ref[j, 0]), lane, axis=1)
            for p in range(1, parts_b):
                cand = jnp.take_along_axis(rep(w_ref[j, p]), lane, axis=1)
                acc = jnp.where(pix == p, cand, acc)
            return (acc >> ((g & 1) << 4)) & 0xFFFF

        def gather_meta(a, r):
            lane = r & 127
            pix = r >> 7
            acc = jnp.take_along_axis(rep(meta_ref[a, 0]), lane, axis=1)
            for p in range(1, parts_r):
                cand = jnp.take_along_axis(
                    rep(meta_ref[a, p]), lane, axis=1)
                acc = jnp.where(pix == p, cand, acc)
            return acc

        c0 = src_ref[0].astype(jnp.uint32)
        c1 = src_ref[1].astype(jnp.uint32)
        value0 = (c0 << 16) | c1

        def pull_window(chunks_read):
            b0 = jnp.minimum(chunks_read >> 4, nb_pull - 1)
            window = [jnp.zeros_like(chunks_read)] * 32
            for b in range(nb_pull):
                m = b0 == b
                for j in range(32):
                    row = src_ref[16 * b + j]
                    window[j] = jnp.where(m, row, window[j])
            return tuple(window), b0 << 4

        def pull_to_scratch(chunks_read):
            window, base16 = pull_window(chunks_read)
            for j in range(32):
                win_ref[j] = window[j]
            b16_ref[0] = base16

        def ensure_s(chunks_read):
            need = jnp.any((chunks_read - b16_ref[0]) >= 32)
            # lax.cond with a no-op false branch == pl.when, but
            # monkeypatchable by the eager kernel-body tests.
            jax.lax.cond(need, lambda: pull_to_scratch(chunks_read),
                         lambda: None)

        # --- 4-chunk register lookahead for the gamma bit loop ---------
        # Each precision-1 binary decode consumes at most one chunk, so a
        # 4-position lookahead re-filled every <=4 consumed chunks turns
        # the per-bit source fetch from a 32-row select tree into a
        # 3-select pick; the window pull slack (28) guarantees the four
        # positions always sit inside the 32-chunk scratch window.

        def la_refill(chunks_read):
            need = jnp.any((chunks_read - b16_ref[0]) >= 28)
            jax.lax.cond(need, lambda: pull_to_scratch(chunks_read),
                         lambda: None)
            # Combined 4-position extraction: one select tree whose
            # levels keep 3 extra entries, yielding window values at
            # offs..offs+3 in 46 selects (vs 4 independent 31-select
            # fetches).  The 28-slack above bounds offs <= 27, so
            # offs+3 <= 30 stays inside the 32-row window and the
            # min-clamped reads are never selected.
            offs = chunks_read - b16_ref[0]
            lvl = [win_ref[j] for j in range(32)]
            for bit, n in ((16, 19), (8, 11), (4, 7), (2, 5), (1, 4)):
                m = (offs & bit) != 0
                top = len(lvl) - 1
                lvl = [jnp.where(m, lvl[min(i + bit, top)], lvl[i])
                       for i in range(n)]
            for j in range(4):
                la_ref[j] = lvl[j]
            labase_ref[0] = chunks_read

        def fetch_la(chunks_read):
            offs = chunks_read - labase_ref[0]
            c01 = jnp.where(offs & 1 != 0, la_ref[1], la_ref[0])
            c23 = jnp.where(offs & 1 != 0, la_ref[3], la_ref[2])
            # Mirror fetch()'s past-window clamp: a lane whose
            # chunks_read ran past its stream (padded lanes after the
            # bucket clamp in pull_window) must read 0, not wrapped
            # stale tail chunks, so its sanity/symbols stay aligned
            # with the CPU oracle even before the [:num_streams] slice.
            ovf = (chunks_read - b16_ref[0]) >= 32
            return jnp.where(
                ovf, 0,
                jnp.where(offs & 2 != 0, c23, c01)).astype(jnp.uint32)

        def fetch(win, chunks_read):
            if win is None:
                rows = [win_ref[j] for j in range(32)]
                base16 = b16_ref[0]
            else:
                rows, base16 = win
            offs = chunks_read - base16
            ovf = offs >= 32
            sel = list(rows)
            for bit in (16, 8, 4, 2, 1):
                sel = [jnp.where(offs & bit != 0, sel[i + bit], sel[i])
                       for i in range(bit)]
            return jnp.where(ovf, 0, sel[0]).astype(jnp.uint32)

        def refine(state, win, a, b, mask):
            base, sm1, value, chunks_read = state
            nbse = base + a
            ns = b - a
            renorm = ((ns >> 16) == 0) & mask
            chunk = fetch(win, chunks_read)
            base = jnp.where(mask, jnp.where(renorm, nbse << 16, nbse),
                             base)
            sm1 = jnp.where(
                mask, jnp.where(renorm, (ns << 16) | 0xFFFF, ns), sm1)
            value = jnp.where(renorm, (value << 16) | chunk, value)
            chunks_read = chunks_read + jnp.where(renorm, 1, 0)
            return base, sm1, value, chunks_read

        def threshold(state, prec):
            base, sm1, value, _ = state
            vb1 = (value - base) + jnp.uint32(1)
            wrapped = vb1 == 0
            lb_hi = jnp.where(
                wrapped, jnp.uint32(1) << prec,
                vb1 >> (jnp.uint32(32) - prec))
            lb_lo = vb1 << prec
            lb_f = u2f(lb_hi) * jnp.float32(2.0**32) + u2f(lb_lo)
            size_f = u2f(sm1) + 1.0
            t0 = f2u(jnp.floor(lb_f / size_f))

            def ok(c):
                hi, lo = mul_size(sm1, c)
                return (hi > lb_hi) | ((hi == lb_hi) & (lo >= lb_lo))

            tm1 = jnp.where(t0 > 1, t0, jnp.uint32(1)) - 1
            thr = jnp.where(
                ok(tm1), tm1,
                jnp.where(ok(t0), t0,
                          jnp.where(ok(t0 + 1), t0 + 1, t0 + 2)))
            return jnp.where(thr > 1, thr, jnp.uint32(1))

        def refine_la(state, a, b, mask):
            """refine() with the 4-chunk lookahead as the source fetch."""
            base, sm1, value, chunks_read = state
            nbse = base + a
            ns = b - a
            renorm = ((ns >> 16) == 0) & mask
            chunk = fetch_la(chunks_read)
            base = jnp.where(mask, jnp.where(renorm, nbse << 16, nbse),
                             base)
            sm1 = jnp.where(
                mask, jnp.where(renorm, (ns << 16) | 0xFFFF, ns), sm1)
            value = jnp.where(renorm, (value << 16) | chunk, value)
            chunks_read = chunks_read + jnp.where(renorm, 1, 0)
            return base, sm1, value, chunks_read

        def dec_bin(state, mask):
            """One bit with the binary uniform CDF {0,1,2} at precision 1.

            Gamma-loop only: sources its renorm chunk from the lookahead
            (callers keep it live via la_refill)."""
            base, sm1, value, _ = state
            vb1 = (value - base) + jnp.uint32(1)
            wrapped = vb1 == 0
            lb_hi = jnp.where(wrapped, jnp.uint32(2), vb1 >> 31)
            lb_lo = vb1 << 1
            rhs_lo = sm1 + 1
            rhs_hi = (rhs_lo == 0).astype(jnp.uint32)
            ge = (rhs_hi > lb_hi) | ((rhs_hi == lb_hi) & (rhs_lo >= lb_lo))
            bit = jnp.where(ge, jnp.uint32(0), jnp.uint32(1))
            # Closed forms of mul_shift1(sm1, v) for v in {0, 1, 2}:
            # v=1 -> (sm1+1)/2 with the 2^32 wrap mapping to 2^31;
            # v=2 -> sm1+1 (exact in u32, wrap included).
            s1 = rhs_lo
            a1 = jnp.where(s1 == 0, jnp.uint32(1) << 31, s1 >> 1)
            a = jnp.where(bit != 0, a1, jnp.uint32(0))
            b = jnp.where(bit != 0, sm1, a1 - 1)
            state = refine_la(state, a, b, mask)
            return state, bit

        def gamma_decode(state, active):
            """Masked Elias-gamma magnitude + sign (OverflowDecode).

            Scratch-window variant: the bit loops source chunks from the
            4-chunk lookahead (refilled from the scratch window every <=4
            consumed chunks), so the while loops carry only the coder
            state and each bit costs a 3-select fetch.  Loop masks are
            carried as int32 0/1 (Mosaic cannot legalize i1 vectors in
            scf.yield region boundaries).
            """
            # Four bits per while iteration: masked sub-steps are no-ops
            # for finished lanes, so over-decoding is harmless, and the
            # scalar `any` reduce + scf.while region crossing (the real
            # per-bit cost — each stalls the vector pipeline) amortize
            # over 4 bits.  la_refill at each body start restores offs=0,
            # so 4 sub-steps stay inside the 4-chunk lookahead.
            UNROLL = 4

            def ucond(c):
                return jnp.any(c[1] != 0)

            def ubody(c):
                state, act_i, n = c
                la_refill(state[3])
                for _ in range(UNROLL):
                    act = act_i != 0
                    state, bit = dec_bin(state, act)
                    cont = act & (bit == 0)
                    n = n + jnp.where(cont, 1, 0).astype(jnp.uint32)
                    act_i = jnp.where(cont & (n < 31), 1, 0)
                return state, act_i, n

            n0 = jnp.zeros((sub, 128), jnp.uint32)
            active_i = jnp.where(active, 1, 0)
            state, _, n = jax.lax.while_loop(
                ucond, ubody, (state, active_i, n0))

            gval = jnp.where(active, jnp.uint32(1) << n, jnp.uint32(0))
            k0 = jnp.where(active, n, jnp.uint32(0))

            def bcond(c):
                return jnp.any(c[1] > 0)

            def bbody(c):
                state, k, gval = c
                la_refill(state[3])
                for _ in range(UNROLL):
                    act = k > 0
                    state, bit = dec_bin(state, act)
                    gval = jnp.where(act, gval | (bit << (k - 1)), gval)
                    k = jnp.where(act, k - 1, k)
                return state, k, gval

            state, _, gval = jax.lax.while_loop(
                bcond, bbody, (state, k0, gval))
            la_refill(state[3])
            state, sign = dec_bin(state, active)
            return state, gval, sign

        all_true = jnp.ones((sub, 128), bool)

        def search(state, row, win):
            """One indexed symbol decode (search + interval refinement)."""
            boff = gather_meta(0, row)
            nbr = gather_meta(1, row)
            misc = gather_meta(2, row)
            prec = (misc & 31).astype(jnp.uint32)
            mv = (misc >> 5) & 0x7FFF
            ovf_r = ((misc >> 20) & 1) == 1

            thr = threshold(state, prec)
            thr_i = thr.astype(jnp.int32)  # <= 2**15: exact in i32

            # Bucket-level lower_bound over the row's bucket-last values.
            lo = jnp.full_like(row, -1)
            hi = nbr - 1  # blast[nb-1] = 2^p >= t always
            for _ in range(bs_iters):
                mid = (lo + hi + 1) >> 1
                blv = gather_w(16, boff + mid)
                below = blv < thr_i
                lo = jnp.where(below, mid, lo)
                hi = jnp.where(below, hi, mid)
            bsel = hi
            g = boff + bsel

            # Fine pass over the straddling bucket's 17-value window.
            fine = jnp.zeros_like(row)
            c_lo = jnp.zeros_like(row)
            c_hi = jnp.full_like(row, 1 << 30)
            for j in range(17):
                v = gather_w(j, g)
                below = v < thr_i
                if j > 0:
                    fine = fine + jnp.where(below, 1, 0)
                c_lo = jnp.where(below, jnp.maximum(c_lo, v), c_lo)
                c_hi = jnp.where(below, c_hi, jnp.minimum(c_hi, v))
            pv = 16 * bsel + fine
            sym = pv - 1

            sm1 = state[1]
            a = mul_shift_v(sm1, c_lo.astype(jnp.uint32), prec)
            b = mul_shift_v(sm1, c_hi.astype(jnp.uint32), prec) - 1
            state = refine(state, win, a, b, all_true)
            return state, sym, mv, ovf_r

        chunks0 = jnp.full((sub, 128), 2, jnp.int32)

        if not any_overflow:
            # No in-stream gamma: every step consumes at most one chunk,
            # so a 32-chunk register window covers a 16-step segment and
            # the whole loop runs without a single scf.cond/while (their
            # region boundaries spill the carried window and dominate the
            # step cost; see the overflow variant below).
            seg_count = num_symbols // 16

            def one_step(carry, window, base16, t):
                state = carry
                state, sym, _, _ = search(state, idx_ref[t],
                                          (window, base16))
                sym_ref[t] = sym
                return state

            def segment(seg, carry):
                window, base16 = pull_window(carry[3])
                for k in range(16):
                    carry = one_step(carry, window, base16, seg * 16 + k)
                return carry

            carry = (jnp.zeros_like(value0),
                     jnp.full_like(value0, _MASK32),
                     value0,
                     chunks0)
            carry = jax.lax.fori_loop(0, seg_count, segment, carry)
            rem = num_symbols - 16 * seg_count
            if rem:
                window, base16 = pull_window(carry[3])
                for k in range(rem):
                    carry = one_step(carry, window, base16,
                                     16 * seg_count + k)
            base, sm1, value, chunks_read = carry
        else:
            def one_step(carry, t):
                state, sym, mv, ovf_r = search(carry, idx_ref[t], None)
                esc = ovf_r & (sym == mv)

                def do_gamma():
                    st2, gval, gsign = gamma_decode(state, esc)
                    # Restore the slack-UN window invariant for the
                    # remaining unrolled steps of this segment.
                    need = jnp.any((st2[3] - b16_ref[0]) >= 28)
                    jax.lax.cond(need,
                                 lambda: pull_to_scratch(st2[3]),
                                 lambda: None)
                    gv = gval.astype(jnp.int32)
                    s2 = jnp.where(
                        esc, jnp.where(gsign == 1, -gv, gv + mv - 1), sym)
                    return st2, s2

                def skip():
                    return state, sym

                state2, sym2 = jax.lax.cond(jnp.any(esc), do_gamma, skip)
                sym_ref[t] = sym2
                return state2

            # Four symbols per window-ensure: each search consumes at
            # most one chunk, so a slack-4 check (offs >= 28) once per
            # segment bounds every in-segment fetch at offs <= 31; a
            # gamma step restores the invariant itself (above).  Halves
            # the per-symbol scalar reduces vs a per-step ensure.
            UN = 4
            seg_count = num_symbols // UN

            def body(si, carry):
                need = jnp.any((carry[3] - b16_ref[0]) >= 32 - UN)
                jax.lax.cond(need, lambda: pull_to_scratch(carry[3]),
                             lambda: None)
                for k in range(UN):
                    carry = one_step(carry, si * UN + k)
                return carry

            pull_to_scratch(chunks0)
            carry = (jnp.zeros_like(value0),
                     jnp.full_like(value0, _MASK32),
                     value0,
                     chunks0)
            carry = jax.lax.fori_loop(0, seg_count, body, carry)
            for t in range(UN * seg_count, num_symbols):
                ensure_s(carry[3])
                carry = one_step(carry, t)
            base, sm1, value, chunks_read = carry

        # Weak decoder sanity (RangeDecoder::Finalize), int32 select form.
        upper_end = base + sm1
        straddle = upper_end < base
        is24 = ((base - 1) >> 24) < (upper_end >> 24)
        mid24 = (((base - 1) >> 24) + 1) << 24
        mid16 = (((base - 1) >> 16) + 1) << 16
        mid = jnp.where(is24, mid24, mid16)
        ok_mid_i = jnp.where(mid == value, 1, 0)
        zero_i = jnp.where(value == 0, 1, 0)
        head_i = jnp.where((base == 0) | straddle, zero_i, ok_mid_i)
        consumed_i = jnp.where(2 * chunks_read >= len_ref[:, :], 1, 0)
        san_ref[:, :] = head_i * consumed_i

    return kernel


def _decode_indexed_tables(cdf, length, precision, overflow):
    """Host prep: transposed packed window arrays + per-row metadata.

    Returns (w_packed int32 [17, parts_b, 128], meta int32 [3, parts_r,
    128], max_nb).  meta rows: 0 = bucket offset, 1 = bucket count,
    2 = precision | (escape value << 5) | (overflow << 20).
    """
    cdf = np.asarray(cdf, np.int64)
    length = np.asarray(length, np.int64)
    precision = np.asarray(precision, np.int64)
    overflow = np.asarray(overflow, bool)
    num_rows = cdf.shape[0]
    if (precision > 15).any():
        raise ValueError("indexed kernel requires precision <= 15")

    wins = []
    boffs = np.zeros(num_rows, np.int64)
    nbs = np.zeros(num_rows, np.int64)
    total = 0
    for r in range(num_rows):
        row = cdf[r, : length[r]]
        nb_r = max(-(-len(row) // 16), 1)
        terminal = row[-1]
        padded = np.concatenate(
            [row, np.full(16 * nb_r - len(row), terminal, np.int64)])
        buckets = padded.reshape(nb_r, 16)
        win = np.zeros((nb_r, 17), np.int64)
        win[:, 0] = np.concatenate([[0], buckets[:-1, -1]])
        win[:, 1:] = buckets
        wins.append(win)
        boffs[r] = total
        nbs[r] = nb_r
        total += nb_r
    w = np.concatenate(wins, axis=0)  # [B, 17]

    parts_b = max(-(-total // 256), 1)
    wt = np.zeros((17, parts_b * 256), np.int64)
    wt[:, :total] = w.T
    w_packed = (wt[:, 0::2] | (wt[:, 1::2] << 16)).astype(
        np.uint32).astype(np.int64).astype(np.int32)
    w_packed = w_packed.reshape(17, parts_b, 128)

    parts_r = max(-(-num_rows // 128), 1)
    meta = np.zeros((3, parts_r * 128), np.int64)
    meta[0, :num_rows] = boffs
    meta[1, :num_rows] = nbs
    meta[2, :num_rows] = (precision | ((length - 2) << 5)
                          | (overflow.astype(np.int64) << 20))
    meta = meta.astype(np.int32).reshape(3, parts_r, 128)
    return w_packed, meta, int(nbs.max())


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _decode_indexed_call(src16, byte_lens, indexes, w_packed, meta,
                         num_symbols, bs_iters, any_overflow, sub):
    num_streams, nchunks = src16.shape
    nsub = num_streams // 128
    parts_b = w_packed.shape[1]
    parts_r = meta.shape[1]

    nb_pull = max((nchunks + 16) // 16, 1) + 1
    c_pad = 16 * nb_pull + 32
    src_t = jnp.zeros((c_pad, nsub, 128), jnp.int32)
    src_t = src_t.at[:nchunks].set(
        jnp.asarray(src16, jnp.uint32).astype(jnp.int32)
        .T.reshape(nchunks, nsub, 128))
    len2 = jnp.asarray(byte_lens, jnp.int32).reshape(nsub, 128)
    idx_t = jnp.asarray(indexes, jnp.int32).T.reshape(
        num_symbols, nsub, 128)

    grid = (nsub // sub,)
    kernel = _make_decode_kernel_indexed(
        num_symbols, parts_b, parts_r, bs_iters, nb_pull, sub,
        any_overflow)
    sym, san = pl.pallas_call(
        kernel,
        grid=grid,
        # Raise the scoped-vmem budget: XLA sometimes places the full
        # (num_symbols, nsub, 128) result in VMEM and overflows the
        # default 16M limit by a hair at larger stream counts.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((c_pad, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_symbols, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((17, parts_b, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, parts_r, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_symbols, sub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_symbols, nsub, 128), jnp.int32),
            jax.ShapeDtypeStruct((nsub, 128), jnp.int32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((32, sub, 128), jnp.int32),
             pltpu.VMEM((1, sub, 128), jnp.int32),
             pltpu.VMEM((4, sub, 128), jnp.int32),
             pltpu.VMEM((1, sub, 128), jnp.int32)]
            if any_overflow else []),
    )(src_t, len2, idx_t, w_packed, meta)
    sym = sym.reshape(num_symbols, nsub * 128).T
    return sym, san.reshape(-1) != 0


def decode_indexed_pallas(src16, byte_lens, indexes, num_symbols, table,
                          sub=8, in_stream_gamma=None):
    """Lane-major Pallas decode with per-element CDF rows (+ overflow).

    Args:
      src16: uint32/int32 [S, C] 16-bit chunk buffers (S % (sub*128) == 0).
      byte_lens: int32 [S] byte lengths (for the sanity check only).
      indexes: int32 [S, num_symbols] CDF row per element.
      num_symbols: symbols per stream.
      table: DeviceCdfTable (all row precisions <= 15).
      sub: sublane tile height per program.
      in_stream_gamma: whether escaped symbols are followed by in-stream
        Elias-gamma magnitude + sign bits (the reference byte format).
        Default: derived from the table's overflow flags.  Pass False for
        sidecar-mode streams (escape values coded out of band): the decode
        then runs the cond-free segment kernel, which is several times
        faster, and returns the escape marker (row_length - 2) as the
        symbol.

    Returns:
      (symbols int32 [S, num_symbols], sanity bool [S]).
    """
    num_streams = src16.shape[0]
    if num_streams % (sub * 128):
        raise ValueError(f"num_streams {num_streams} % {sub * 128} != 0")
    host = table.host
    cached = host.kernel_tables.get("indexed_decode")
    if cached is None:
        # Cache NUMPY arrays only: jnp.asarray inside a jit trace returns
        # a tracer, and caching a tracer leaks it into later traces
        # (UnexpectedTracerError on reuse across jits).
        cached = _decode_indexed_tables(
            host.cdf, host.length, host.precision, host.overflow)
        host.kernel_tables["indexed_decode"] = cached
    w_packed_np, meta_np, max_nb = cached
    w_packed, meta = jnp.asarray(w_packed_np), jnp.asarray(meta_np)
    bs_iters = max(int(np.ceil(np.log2(max_nb))), 0) if max_nb > 1 else 0
    if in_stream_gamma is None:
        in_stream_gamma = bool(host.overflow.any())
    return _decode_indexed_call(
        src16, byte_lens, indexes, w_packed, meta, int(num_symbols),
        bs_iters, bool(in_stream_gamma), int(sub))


# -----------------------------------------------------------------------------
# Encoder kernel v3: fused lookup + scan, lane-major (production fast path)
# -----------------------------------------------------------------------------
#
# The XLA encode pipeline spends ~60% of its time materializing
# (lower, upper) micro-ops from symbols: the CDF pair lookup is HBM-bound
# on its [M, buckets] one-hot intermediates (measured 10.5 ms for 16.8M
# elements), and per-lane `take_along_axis` gathers are worse still
# (serialized; ~330 ms as an XLA gather, ~4x the whole pipeline as a
# Mosaic gather in the retired v2 kernel).  This kernel fuses lookup and
# scan with all intermediates in registers: symbols stream in as
# [N, SUB, 128] tiles, each (cdf[v], cdf[v+1]) pair is packed into one
# int32 ((lo << 16) | hi, exact for precision <= 15) and pulled from an
# SMEM table by a statically unrolled two-level select-accumulate — the
# same scalar-broadcast technique the decode kernels use, which beats
# both MXU one-hot and hardware gathers at this table size.  The exact
# RangeEncoder::Encode recurrence (reference cc/lib/range_coder.cc:37-264)
# then runs on (SUB, 128) u32 tiles and emits one packed record per step;
# jax_coder._encode_postpass resolves the records into bytes.
#
# Single-shared-row, no-overflow, precision <= 15 tables only (the regime
# of batched entropy models); everything else takes the micro-op path.


def _kernel_chunk_postpass(rec_ref, out_ref, num_steps, sub):
    """In-kernel record resolution + compaction (VMEM-resident).

    Replaces jax_coder._encode_postpass's reverse cummin + binary-shift
    compaction, which are HBM-bound as whole-array XLA passes (~2x the
    fused kernel's own time at [32k, 512]).  Reads packed records
    val(17) | tag(2) | res_event(1) | res_dir(1) from ``rec_ref``
    (scratch, destroyed) and writes compacted 16-bit chunk values (the
    valid prefix per lane, zeros past it) to ``out_ref``.

    Requires num_steps <= 8192 (move distance packed in 13 bits).
    """
    big = jnp.int32(0x7FFFFFFF)
    valid_bit = jnp.int32(1 << 30)

    # Reverse sweep: each pending chunk resolves in the direction of the
    # first resolution event strictly after its step (none -> up), fused
    # with the forward-rank bookkeeping's input form: rec becomes
    # valid(1<<30) | value16.
    def rev_step(tt, nearest):
        t = num_steps - 1 - tt
        r = rec_ref[t]
        tag = (r >> 17) & 3
        val = r & 0x1FFFF
        # up as int 0/1 (Mosaic rejects bool-vector truncations here).
        up = jnp.where(nearest != big, nearest & 1, 1)
        value16 = jnp.where(
            tag == 1, val,
            jnp.where(tag == 2, val - 1 + up, (1 - up) * 0xFFFF))
        rec_ref[t] = jnp.where(tag > 0, valid_bit | value16, 0)
        event = (r >> 19) & 1
        return jnp.where(event != 0, (t << 1) | ((r >> 20) & 1), nearest)

    jax.lax.fori_loop(
        0, num_steps, rev_step, jnp.full((sub, 128), big, jnp.int32))

    # Forward sweep: move-up distance = t - rank (rank = # valid chunks at
    # steps <= t), packed into bits 17..29.
    def fwd_step(t, count):
        p = rec_ref[t]
        v = p >> 30
        count = count + v
        dist = jnp.where(v != 0, t - (count - 1), 0)
        rec_ref[t] = p | (dist << 17)
        return count

    jax.lax.fori_loop(
        0, num_steps, fwd_step, jnp.zeros((sub, 128), jnp.int32))

    # Collision-free binary-shift compaction (same invariant as
    # jax_coder._encode_postpass): moving every element whose dist has bit
    # b set up by 2^b, LSB-first, never collides.  In-place ascending is
    # safe: reads are at t + sh > t, not yet overwritten this pass.  The
    # last pass writes the stripped chunk values to out_ref.
    nbits = max((num_steps - 1).bit_length(), 1)
    for b in range(nbits):
        sh = 1 << b
        last = b == nbits - 1

        def shift_step(t, _, sh=sh, last=last):
            cur = rec_ref[t]
            tsrc = jnp.minimum(t + sh, num_steps - 1)
            src = jnp.where(t + sh < num_steps, rec_ref[tsrc], 0)
            take = (src & (valid_bit | (sh << 17))) == (
                valid_bit | (sh << 17))
            stay = (cur & (valid_bit | (sh << 17))) == valid_bit
            new = jnp.where(take, src - (sh << 17),
                            jnp.where(stay, cur, 0))
            if last:
                out_ref[t] = new & 0x1FFFF
            else:
                rec_ref[t] = new
            return 0

        jax.lax.fori_loop(0, num_steps, shift_step, 0)


def _make_encode_kernel_v3(num_steps, precision, parts_p, sub,
                           fused_postpass=False):
    """Builds the fused encode kernel for one shared CDF row.

    Static parameters:
      num_steps: symbols per stream.
      precision: range-coder precision of the row (<= 16).
      parts_p: 128-lane parts of the packed-pair table.
      sub: sublane tile height (streams per program = sub * 128).
      fused_postpass: resolve + compact records in-kernel; the first
        output then holds compacted 16-bit chunks instead of records.
    """
    shift_up = 32 - precision

    def kernel(vq_ref, pairs_ref, out_ref, state_ref, *scratch):
        rec_ref = scratch[0] if fused_postpass else out_ref
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

        def rep(row):  # (128,) -> (sub, 128)
            return jnp.broadcast_to(row[None, :], (sub, 128))

        def step(t, carry):
            base, sm1, delay, ptr, pend_start = carry
            vq = vq_ref[t]  # (sub, 128) int32, pre-clipped

            # Packed-pair lookup: one per-lane gather into the 128-lane
            # parts of the pair table (symbol is known at encode — no
            # search).  ~3*parts_p vops, vs ~alphabet+16 for the
            # select-accumulate form this replaces (measured ~2x faster
            # end-to-end at alphabet 256).
            lane = vq & 127
            pix = vq >> 7
            pair = jnp.take_along_axis(rep(pairs_ref[0]), lane, axis=1)
            for p in range(1, parts_p):
                cand = jnp.take_along_axis(rep(pairs_ref[p]), lane, axis=1)
                pair = jnp.where(pix == p, cand, pair)
            pair_u = pair.astype(jnp.uint32)
            c_lo = pair_u >> 16
            c_hi = (pair_u & 0xFFFF) + 1  # stored as cdf[v+1]-1 (16 bits)

            # RangeEncoder::Encode, exactly as jax_coder._encode_step
            # (delayed-carry "state 1" via delay/pend bookkeeping).
            a = mul_shift(sm1, c_lo)
            b_ = mul_shift(sm1, c_hi) - 1
            nbase = base + a
            overflow = nbase < a
            ns = b_ - a
            straddle = (nbase + ns) < nbase
            renorm = (ns >> 16) == 0

            res_event = (delay != 0) & ~straddle
            shifted_base = nbase << 16
            shifted_sm1 = (ns << 16) | _U16
            new_base = jnp.where(renorm, shifted_base, nbase)
            new_sm1 = jnp.where(renorm, shifted_sm1, ns)

            top = nbase >> 16
            ambiguous = (shifted_base + shifted_sm1) < shifted_base
            tag = jnp.where(
                ~renorm, 0,
                jnp.where(straddle, 3, jnp.where(ambiguous, 2, 1)),
            ).astype(jnp.int32)

            new_delay = jnp.where(
                straddle, delay, jnp.where(tag == 2, top + 1, 0))
            w_val = jnp.where(
                tag == 2, top + 1, jnp.where(tag == 1, top, 0))
            new_pend = jnp.where(tag == 2, ptr, pend_start)
            new_ptr = ptr + 2 * (tag != 0)

            # Packed record: val(17b) | tag(2b) | res_event(1b) | dir(1b).
            val = jnp.where(tag > 0, w_val, 0).astype(jnp.int32)
            rec_ref[t] = (val | (tag << 17)
                          | (res_event.astype(jnp.int32) << 19)
                          | (overflow.astype(jnp.int32) << 20))
            return new_base, new_sm1, new_delay, new_ptr, new_pend

        zero_u = jnp.zeros((sub, 128), jnp.uint32)
        zero_i = jnp.zeros((sub, 128), jnp.int32)
        base, sm1, delay, ptr, pend_start = jax.lax.fori_loop(
            0, num_steps, step,
            (zero_u, jnp.full((sub, 128), _MASK32, jnp.uint32), zero_u,
             zero_i, zero_i))
        state_ref[0] = base.astype(jnp.int32)
        state_ref[1] = sm1.astype(jnp.int32)
        state_ref[2] = delay.astype(jnp.int32)
        state_ref[3] = ptr
        state_ref[4] = pend_start
        if fused_postpass:
            _kernel_chunk_postpass(rec_ref, out_ref, num_steps, sub)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _encode_v3_call(vq_t, pairs, precision, sub, fused=False):
    """vq_t: int32 [N, NSUB, 128]; pairs: int32 [parts_p, 128]."""
    num_steps, nsub, _ = vq_t.shape
    parts_p = pairs.shape[0]
    grid = (nsub // sub,)
    kernel = _make_encode_kernel_v3(
        num_steps, precision, parts_p, sub, fused_postpass=fused)
    io = lambda: pl.BlockSpec((num_steps, sub, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    rec, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            io(),
            pl.BlockSpec((parts_p, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[io(),
                   pl.BlockSpec((5, sub, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((num_steps, nsub, 128), jnp.int32),
                   jax.ShapeDtypeStruct((5, nsub, 128), jnp.int32)],
        scratch_shapes=(
            [pltpu.VMEM((num_steps, sub, 128), jnp.int32)] if fused
            else []),
    )(vq_t, pairs)
    return rec, state


def encode_single_row_device(symbols, cdf_row, precision, out_size, sub=8):
    """Fused single-row encode: symbols -> (bytes [S, out_size], lengths).

    Jittable (symbols may be traced; cdf_row must be a host constant).

    Args:
      symbols: int32 [S, N], S % (sub*128) == 0; values are clipped to the
        row's alphabet like the micro-op path.
      cdf_row: 1-D host int array (alphabet + 1 CDF values); all values
        must fit 16 bits (precision <= 15).
      precision: static int (<= 15).
      out_size: static output buffer width (>= 2*N + 2).
      sub: sublane tile height.
    """
    from compression_tpu.codec import jax_coder

    num_streams, n = symbols.shape
    if num_streams % (sub * 128):
        raise ValueError(f"num_streams {num_streams} % {sub * 128} != 0")
    if int(precision) > 16:
        raise ValueError("packed-pair kernel requires precision <= 16")
    cdf_row = np.asarray(cdf_row, np.int64)
    max_sym = len(cdf_row) - 2
    # pairs[v] = cdf[v] << 16 | (cdf[v+1] - 1): both halves fit 16 bits
    # even at precision 16 (cdf[v] <= 2^p - 1, cdf[v+1] - 1 <= 2^p - 1,
    # CDFs are strictly increasing so cdf[v+1] >= 1).  Laid out as
    # 128-lane parts for the in-kernel per-lane gather.
    pairs = (cdf_row[:-1] << 16) | (cdf_row[1:] - 1)
    parts_p = max(-(-len(pairs) // 128), 1)
    pairs = np.concatenate(
        [pairs, np.full(parts_p * 128 - len(pairs), pairs[-1], np.int64)])
    win = pairs.astype(np.uint32).view(np.int32).reshape(parts_p, 128)

    nsub = num_streams // 128
    vq = jnp.clip(jnp.asarray(symbols, jnp.int32), 0, max_sym)
    vq_t = vq.T.reshape(n, nsub, 128)
    win_d = jnp.asarray(win)
    # Cap the per-call grid: one pallas call over the full stream axis
    # (grid 32 at 32k streams) wedges the XLA TPU compiler for tens of
    # minutes, while the identical kernel at grid <= 8 compiles in
    # seconds.  Chunk the stream axis and emit one call per chunk — same
    # Mosaic binary, same total device work.
    nsub_max = 8 * sub
    fused = n <= 8192  # in-kernel compaction packs move distance in 13 bits
    if nsub <= nsub_max:
        rec, state = _encode_v3_call(
            vq_t, win_d, int(precision), int(sub), fused)
    else:
        chunks = [
            _encode_v3_call(vq_t[:, i:i + nsub_max], win_d,
                            int(precision), int(sub), fused)
            for i in range(0, nsub, nsub_max)
        ]
        rec = jnp.concatenate([c[0] for c in chunks], axis=1)
        state = jnp.concatenate([c[1] for c in chunks], axis=1)

    rec = rec.reshape(n, num_streams)
    state_f = state.reshape(5, num_streams)
    state_t = (state_f[0].astype(jnp.uint32), state_f[1].astype(jnp.uint32),
               state_f[2].astype(jnp.uint32), state_f[3], state_f[4])
    if fused:
        return jax_coder._finalize_chunks(
            rec.T.astype(jnp.uint32), state_t, out_size)
    return jax_coder._encode_postpass(rec, state_t, out_size)


# -----------------------------------------------------------------------------
# Indexed encoder kernel: lane-major, any CDF row per element
# -----------------------------------------------------------------------------
#
# The encode counterpart of decode_indexed_pallas: each element selects
# its own CDF row (bmshj2018/ms2020/universal compress), rows may differ
# in length and precision.  Unlike decode, the symbol is KNOWN, so the
# table access is a single per-lane gather of the packed (cdf[v] << 16 |
# cdf[v+1]) pair at global index row_base[row] + v — no search.  Row
# metadata (pair base, escape index, precision, overflow flag) gathers
# from lane-replicated vectors exactly like the indexed decoder's.
#
# Escape-free streams only (the caller guarantees every symbol is in its
# row's range, or escapes were pre-mapped to the marker in sidecar mode);
# in-stream gamma escapes take the micro-op path.  Precision <= 15 per
# row (16-bit pair packing).


def _make_encode_kernel_indexed(num_steps, parts_p, parts_r, sub,
                                fused_postpass=False):
    """Builds the lane-major indexed encode kernel.

    Static parameters:
      num_steps: symbols per stream.
      parts_p: 128-lane parts of the packed-pair table.
      parts_r: 128-lane parts of the per-row metadata vectors.
      sub: sublane tile height (streams per program = sub * 128).
    """

    def kernel(vq_ref, idx_ref, pairs_ref, meta_ref, out_ref, state_ref,
               *scratch):
        rec_ref = scratch[0] if fused_postpass else out_ref

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

        def mul_shift_v(sm1, v, prec):
            hi, lo = mul_size(sm1, v)
            return (hi << (jnp.uint32(32) - prec)) | (lo >> prec)

        def rep(row):  # (128,) -> (sub, 128)
            return jnp.broadcast_to(row[None, :], (sub, 128))

        def gather_pairs(g):
            lane = g & 127
            pix = g >> 7
            acc = jnp.take_along_axis(rep(pairs_ref[0]), lane, axis=1)
            for p in range(1, parts_p):
                cand = jnp.take_along_axis(rep(pairs_ref[p]), lane, axis=1)
                acc = jnp.where(pix == p, cand, acc)
            return acc

        def gather_meta(a, r):
            lane = r & 127
            pix = r >> 7
            acc = jnp.take_along_axis(rep(meta_ref[a, 0]), lane, axis=1)
            for p in range(1, parts_r):
                cand = jnp.take_along_axis(
                    rep(meta_ref[a, p]), lane, axis=1)
                acc = jnp.where(pix == p, cand, acc)
            return acc

        def step(t, carry):
            base, sm1, delay, ptr, pend_start = carry
            row = idx_ref[t]
            base_r = gather_meta(0, row)
            maxs = gather_meta(1, row)
            prec = gather_meta(2, row).astype(jnp.uint32)
            ovf = gather_meta(3, row)

            v = vq_ref[t]
            # Escape mapping: out-of-range on overflow rows -> marker
            # (row_length - 2); plain clip on bounded rows (reference
            # ScanCDF clip semantics).
            vq = jnp.where(
                v < 0,
                jnp.where(ovf != 0, maxs, 0),
                jnp.minimum(v, maxs))
            pair_u = gather_pairs(base_r + vq).astype(jnp.uint32)
            c_lo = pair_u >> 16
            c_hi = (pair_u & 0xFFFF) + 1  # stored as cdf[v+1]-1 (16 bits)

            # RangeEncoder::Encode with per-element precision.
            a = mul_shift_v(sm1, c_lo, prec)
            b_ = mul_shift_v(sm1, c_hi, prec) - 1
            nbase = base + a
            overflow = nbase < a
            ns = b_ - a
            straddle = (nbase + ns) < nbase
            renorm = (ns >> 16) == 0

            res_event = (delay != 0) & ~straddle
            shifted_base = nbase << 16
            shifted_sm1 = (ns << 16) | _U16
            new_base = jnp.where(renorm, shifted_base, nbase)
            new_sm1 = jnp.where(renorm, shifted_sm1, ns)

            top = nbase >> 16
            ambiguous = (shifted_base + shifted_sm1) < shifted_base
            tag = jnp.where(
                ~renorm, 0,
                jnp.where(straddle, 3, jnp.where(ambiguous, 2, 1)),
            ).astype(jnp.int32)

            new_delay = jnp.where(
                straddle, delay, jnp.where(tag == 2, top + 1, 0))
            w_val = jnp.where(
                tag == 2, top + 1, jnp.where(tag == 1, top, 0))
            new_pend = jnp.where(tag == 2, ptr, pend_start)
            new_ptr = ptr + 2 * (tag != 0)

            val = jnp.where(tag > 0, w_val, 0).astype(jnp.int32)
            rec_ref[t] = (val | (tag << 17)
                          | (res_event.astype(jnp.int32) << 19)
                          | (overflow.astype(jnp.int32) << 20))
            return new_base, new_sm1, new_delay, new_ptr, new_pend

        zero_u = jnp.zeros((sub, 128), jnp.uint32)
        zero_i = jnp.zeros((sub, 128), jnp.int32)
        base, sm1, delay, ptr, pend_start = jax.lax.fori_loop(
            0, num_steps, step,
            (zero_u, jnp.full((sub, 128), _MASK32, jnp.uint32), zero_u,
             zero_i, zero_i))
        state_ref[0] = base.astype(jnp.int32)
        state_ref[1] = sm1.astype(jnp.int32)
        state_ref[2] = delay.astype(jnp.int32)
        state_ref[3] = ptr
        state_ref[4] = pend_start
        if fused_postpass:
            _kernel_chunk_postpass(rec_ref, out_ref, num_steps, sub)

    return kernel


@functools.partial(jax.jit, static_argnums=(4, 5))
def _encode_indexed_call(vq_t, idx_t, pairs, meta, sub, fused=False):
    """vq_t/idx_t: int32 [N, NSUB, 128]; pairs: [parts_p, 128];
    meta: [4, parts_r, 128]."""
    num_steps, nsub, _ = vq_t.shape
    parts_p = pairs.shape[0]
    parts_r = meta.shape[1]
    grid = (nsub // sub,)
    kernel = _make_encode_kernel_indexed(
        num_steps, parts_p, parts_r, sub, fused_postpass=fused)
    io = lambda: pl.BlockSpec((num_steps, sub, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    rec, state = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            io(), io(),
            pl.BlockSpec((parts_p, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, parts_r, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[io(),
                   pl.BlockSpec((5, sub, 128), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((num_steps, nsub, 128), jnp.int32),
                   jax.ShapeDtypeStruct((5, nsub, 128), jnp.int32)],
        scratch_shapes=(
            [pltpu.VMEM((num_steps, sub, 128), jnp.int32)] if fused
            else []),
    )(vq_t, idx_t, pairs, meta)
    return rec, state


def _encode_indexed_tables(cdf, length, precision, overflow):
    """Packed-pair table + per-row metadata for the indexed encoder."""
    num_rows = len(length)
    pairs = []
    for r in range(num_rows):
        n = int(length[r])
        cdfr = np.asarray(cdf[r][:n], np.int64)
        pairs.append((cdfr[:-1] << 16) | (cdfr[1:] - 1))
    row_base = np.concatenate(
        [[0], np.cumsum([len(x) for x in pairs])[:-1]]).astype(np.int64)
    flat = np.concatenate(pairs) if pairs else np.zeros(1, np.int64)
    parts_p = max(-(-len(flat) // 128), 1)
    flat = np.concatenate(
        [flat, np.full(parts_p * 128 - len(flat), flat[-1], np.int64)])
    pairs_arr = flat.astype(np.uint32).view(np.int32).reshape(parts_p, 128)

    parts_r = max(-(-num_rows // 128), 1)
    def metavec(v):
        v = np.asarray(v, np.int64)
        return np.concatenate(
            [v, np.zeros(parts_r * 128 - num_rows, np.int64)]).astype(
                np.int32).reshape(parts_r, 128)

    meta = np.stack([
        metavec(row_base),
        metavec(np.asarray(length, np.int64) - 2),
        metavec(precision),
        metavec(np.asarray(overflow, np.int64)),
    ])
    return pairs_arr, meta


def encode_indexed_device(symbols, indexes, table, out_size, sub=8):
    """Fused indexed encode: (symbols, row indexes) -> (bytes, lengths).

    Jittable (symbols/indexes may be traced; the table must be concrete).
    Escape-free data only (every symbol in range, or sidecar-mapped);
    all row precisions <= 15.

    Args:
      symbols: int32 [S, N], S % (sub*128) == 0.
      indexes: int32 [S, N] CDF row per element.
      table: DeviceCdfTable.
      out_size: static output buffer width (>= 2*N + 2).
      sub: sublane tile height.
    """
    from compression_tpu.codec import jax_coder

    num_streams, n = symbols.shape
    if num_streams % (sub * 128):
        raise ValueError(f"num_streams {num_streams} % {sub * 128} != 0")
    host = table.host
    cached = host.kernel_tables.get("indexed_encode")
    if cached is None:
        # Cache NUMPY arrays only (see indexed_decode: a jnp.asarray made
        # under tracing is a tracer; caching it poisons later traces).
        cached = _encode_indexed_tables(
            host.cdf, host.length, host.precision, host.overflow)
        host.kernel_tables["indexed_encode"] = cached
    pairs_np, meta_np = cached
    pairs_arr, meta = jnp.asarray(pairs_np), jnp.asarray(meta_np)

    nsub = num_streams // 128
    vq_t = jnp.asarray(symbols, jnp.int32).T.reshape(n, nsub, 128)
    idx_t = jnp.asarray(indexes, jnp.int32).T.reshape(n, nsub, 128)
    nsub_max = 8 * sub  # see encode_single_row_device: big grids wedge XLA
    fused = n <= 8192  # in-kernel compaction packs move distance in 13 bits
    if nsub <= nsub_max:
        rec, state = _encode_indexed_call(
            vq_t, idx_t, pairs_arr, meta, int(sub), fused)
    else:
        chunks = [
            _encode_indexed_call(
                vq_t[:, i:i + nsub_max], idx_t[:, i:i + nsub_max],
                pairs_arr, meta, int(sub), fused)
            for i in range(0, nsub, nsub_max)
        ]
        rec = jnp.concatenate([c[0] for c in chunks], axis=1)
        state = jnp.concatenate([c[1] for c in chunks], axis=1)

    rec = rec.reshape(n, num_streams)
    state_f = state.reshape(5, num_streams)
    state_t = (state_f[0].astype(jnp.uint32), state_f[1].astype(jnp.uint32),
               state_f[2].astype(jnp.uint32), state_f[3], state_f[4])
    if fused:
        return jax_coder._finalize_chunks(
            rec.T.astype(jnp.uint32), state_t, out_size)
    return jax_coder._encode_postpass(rec, state_t, out_size)


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
