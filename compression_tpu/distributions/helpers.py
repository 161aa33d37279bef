"""Tail/offset estimation helpers for range coding.

JAX counterparts of the reference's python/distributions/helpers.py:29-219:
``estimate_tails`` is the vectorized Adam-like fixed-point iteration (stops
100 iterations after the gradient sign flips per element), and
``quantization_offset`` / ``lower_tail`` / ``upper_tail`` walk the same
duck-typed fallback chains over the distribution protocol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "estimate_tails",
    "quantization_offset",
    "lower_tail",
    "upper_tail",
]


def estimate_tails(func, target, shape, dtype=jnp.float32):
    """Finds x (elementwise) such that func(x) == target, via Adam iteration.

    func must be monotonic and vectorized.  Mirrors the reference iteration
    exactly: m/v running averages with halving decay, lr 0.1/sqrt(count+1),
    counting starts at the first gradient sign flip, stops when
    max |func(x)-target| <= 1e-8 or all counts reach 100; returns the best
    (lowest-loss) iterate seen.
    """
    target = jnp.asarray(target, dtype)
    shape = tuple(int(s) for s in shape)

    loss_fn = lambda t: jnp.abs(func(t) - target)
    # func is elementwise, so grad-of-sum gives elementwise derivatives.
    grad_fn = jax.grad(lambda t: jnp.sum(jnp.abs(func(t) - target)))

    def cond(state):
        _, _, _, loss, count, _, _ = state
        return jnp.logical_and(jnp.max(loss) > 1e-8, jnp.min(count) < 100)

    def body(state):
        tails, prev_m, prev_v, _, count, best_tails, best_loss = state
        loss = loss_fn(tails)
        better = loss < best_loss
        best_tails = jnp.where(better, tails, best_tails)
        best_loss = jnp.where(better, loss, best_loss)

        grad = grad_fn(tails)
        m = (prev_m + grad) / 2
        v = (prev_v + jnp.square(grad)) / 2
        k = jnp.sqrt(jnp.asarray(count + 1, m.dtype))
        tails = tails - 0.1 * m / (k * jnp.sqrt(v) + 1e-20)
        count = jnp.where(
            jnp.logical_or(count > 0, prev_m * grad < 0), count + 1, count)
        return tails, m, v, loss, count, best_tails, best_loss

    init_tails = jnp.zeros(shape, dtype)
    init = (
        init_tails,
        jnp.zeros(shape, dtype),
        jnp.ones(shape, dtype),
        jnp.full(shape, jnp.finfo(dtype).max, dtype),
        jnp.zeros(shape, jnp.int32),
        init_tails,
        jnp.full(shape, jnp.finfo(dtype).max, dtype),
    )
    # Compile the whole iteration as one program: eagerly dispatched
    # while_loops hit per-op execution paths some TPU runtimes do not
    # implement (deferred "UNIMPLEMENTED" surfacing at the first transfer).
    state = jax.jit(lambda i: jax.lax.while_loop(cond, body, i))(init)
    return state[-2]


def _try(fn):
    try:
        return fn()
    except (AttributeError, NotImplementedError):
        return None


def quantization_offset(distribution):
    """Mode-aligned sub-integer quantization offset in [-.5, .5].

    Fallback chain: _quantization_offset -> mode -> quantile(.5) -> mean ->
    0, reduced mod round (reference helpers.py:104-147).  The result is a
    constant w.r.t. differentiation (stop_gradient).
    """
    offset = _try(lambda: distribution._quantization_offset())
    if offset is None:
        offset = _try(distribution.mode)
    if offset is None:
        offset = _try(lambda: distribution.quantile(0.5))
    if offset is None:
        offset = _try(distribution.mean)
    if offset is None:
        offset = jnp.zeros((), distribution.dtype)
    offset = jnp.asarray(offset, distribution.dtype)
    return jax.lax.stop_gradient(offset - jnp.round(offset))


def lower_tail(distribution, tail_mass):
    """Approximate lower tail quantile (reference helpers.py:150-183)."""
    tail = _try(lambda: distribution._lower_tail(tail_mass))
    if tail is None:
        tail = _try(lambda: distribution.quantile(tail_mass / 2))
    if tail is None:
        target = jnp.log(jnp.asarray(tail_mass / 2, distribution.dtype))
        tail = estimate_tails(
            distribution.log_cdf, target, distribution.batch_shape,
            distribution.dtype)
    return jax.lax.stop_gradient(jnp.asarray(tail, distribution.dtype))


def upper_tail(distribution, tail_mass):
    """Approximate upper tail quantile (reference helpers.py:186-219)."""
    tail = _try(lambda: distribution._upper_tail(tail_mass))
    if tail is None:
        tail = _try(lambda: distribution.quantile(1 - tail_mass / 2))
    if tail is None:
        target = jnp.log(jnp.asarray(tail_mass / 2, distribution.dtype))
        tail = estimate_tails(
            distribution.log_survival_function, target,
            distribution.batch_shape, distribution.dtype)
    return jax.lax.stop_gradient(jnp.asarray(tail, distribution.dtype))
