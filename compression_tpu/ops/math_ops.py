"""Math operations with compression-specific custom gradients.

JAX counterparts of the reference's python/ops/math_ops.py:27-216:
``upper_bound`` / ``lower_bound`` (min/max with 'identity',
'identity_if_towards' or 'disconnected' gradient overrides) and
``perturb_and_apply`` (additive U(-.5,.5) noise with analytically expected
gradients, Agustsson & Theis 2020 §4.2).  Implemented with jax.custom_vjp
instead of tf.custom_gradient; functional (noise keys are explicit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "upper_bound",
    "lower_bound",
    "perturb_and_apply",
]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _upper_bound(inputs, bound, gradient):
    return jnp.minimum(inputs, bound)


def _upper_bound_fwd(inputs, bound, gradient):
    return jnp.minimum(inputs, bound), (inputs, bound)


def _upper_bound_bwd(gradient, res, grad):
    inputs, bound = res
    if gradient == "identity":
        return grad, jnp.zeros_like(bound)
    if gradient == "identity_if_towards":
        pass_through = jnp.logical_or(inputs <= bound, grad > 0)
    else:  # disconnected
        pass_through = inputs <= bound
    return pass_through.astype(grad.dtype) * grad, jnp.zeros_like(bound)


_upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lower_bound(inputs, bound, gradient):
    return jnp.maximum(inputs, bound)


def _lower_bound_fwd(inputs, bound, gradient):
    return jnp.maximum(inputs, bound), (inputs, bound)


def _lower_bound_bwd(gradient, res, grad):
    inputs, bound = res
    if gradient == "identity":
        return grad, jnp.zeros_like(bound)
    if gradient == "identity_if_towards":
        pass_through = jnp.logical_or(inputs >= bound, grad < 0)
    else:  # disconnected
        pass_through = inputs >= bound
    return pass_through.astype(grad.dtype) * grad, jnp.zeros_like(bound)


_lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def upper_bound(inputs, bound, gradient="identity_if_towards"):
    """jnp.minimum with a compression-friendly gradient at the bound.

    gradient: 'disconnected' (plain min), 'identity' (gradient passes
    through unconditionally), or 'identity_if_towards' (passes through only
    when gradient descent would push inputs toward the bound).
    """
    if gradient not in ("disconnected", "identity", "identity_if_towards"):
        raise ValueError(f"Invalid value for `gradient`: '{gradient}'.")
    inputs = jnp.asarray(inputs)
    bound = jnp.asarray(bound, inputs.dtype)
    return _upper_bound(inputs, bound, gradient)


def lower_bound(inputs, bound, gradient="identity_if_towards"):
    """jnp.maximum with a compression-friendly gradient at the bound."""
    if gradient not in ("disconnected", "identity", "identity_if_towards"):
        raise ValueError(f"Invalid value for `gradient`: '{gradient}'.")
    inputs = jnp.asarray(inputs)
    bound = jnp.asarray(bound, inputs.dtype)
    return _lower_bound(inputs, bound, gradient)


def perturb_and_apply(f, x, *args, key=None, u=None, x_plus_u=None,
                      expected_grads=True):
    """Perturbs x with U(-.5,.5) noise and applies pointwise f.

    Returns (y, x + u) with y = f(x + u, *args).  With expected_grads=True
    the gradient of y w.r.t. x is replaced by the analytically expected
    derivative w.r.t. the noise distribution, f(x+.5) - f(x-.5)
    (Agustsson & Theis 2020, §4.2); gradients w.r.t. *args flow as usual.

    Exactly one of key / u / x_plus_u must be provided (JAX needs an
    explicit noise source; reference python/ops/math_ops.py:157-216 samples
    internally).
    """
    if x_plus_u is None:
        if u is None:
            if key is None:
                raise ValueError("Provide one of `key`, `u`, or `x_plus_u`.")
            u = jax.random.uniform(
                key, jnp.shape(x), jnp.result_type(x), -0.5, 0.5)
        x_plus_u = x + u
    elif u is not None or key is not None:
        raise ValueError("Cannot provide both `x_plus_u` and `u`/`key`.")

    if not expected_grads:
        return f(x_plus_u, *args), x_plus_u

    @jax.custom_vjp
    def _apply(x, x_plus_u, args):
        return f(x_plus_u, *args)

    def _apply_fwd(x, x_plus_u, args):
        y, pullback = jax.vjp(lambda a: f(x_plus_u, *a), args)
        dydx = f(x + 0.5, *args) - f(x - 0.5, *args)
        return y, (pullback, dydx)

    def _apply_bwd(res, grad):
        pullback, dydx = res
        (grad_args,) = pullback(grad)
        return grad * dydx, jnp.zeros_like(dydx), grad_args

    _apply.defvjp(_apply_fwd, _apply_bwd)
    return _apply(x, x_plus_u, tuple(args)), x_plus_u
