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

__all__ = ["encode_scan_pallas"]

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
