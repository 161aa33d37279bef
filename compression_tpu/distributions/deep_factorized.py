"""Deep fully-factorized distribution (neural-network CDF).

JAX counterpart of the reference's python/distributions/deep_factorized.py:
the CDF is a per-channel monotone MLP (softplus-positive matrices with tanh
factor gates, Ballé et al. 2018 appendix 6.1); log-prob comes from the
derivative of the logits, computed with a jvp instead of a GradientTape.

Parameters are an explicit pytree (`init_params`) so the distribution can be
constructed inside jit/grad traces and trained with optax; trainable-layer
integration lives in compression_tpu.layers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.distributions import base as base_lib
from compression_tpu.distributions import helpers
from compression_tpu.distributions import uniform_noise

__all__ = ["DeepFactorized", "NoisyDeepFactorized", "log_expm1"]


def log_expm1(x):
    """log(exp(x) - 1), stable for large x (~= x for x > 15)."""
    x = jnp.asarray(x)
    cond = x < 15.0
    x_small = jnp.minimum(x, 15.0)
    return jnp.where(cond, jnp.log(jnp.expm1(x_small)), x)


class DeepFactorized(base_lib.Distribution):
    """Non-parametric scalar density via a monotone MLP cumulative."""

    def __init__(self, params=None, *, batch_shape=(), num_filters=(3, 3),
                 init_scale=10.0, dtype=jnp.float32, key=None):
        """Creates the distribution.

        Args:
          params: parameter pytree from `init_params`; if None, fresh
            parameters are initialized (requires `key`).
          batch_shape: rightmost independent (non-iid) dimensions.
          num_filters: hidden layer widths of the CDF MLP.
          init_scale: density scale factor at initialization.
          dtype: computation dtype.
          key: PRNG key for initialization when params is None.
        """
        self._batch_shape_tuple = tuple(int(s) for s in batch_shape)
        self.num_filters = tuple(int(f) for f in num_filters)
        self.init_scale = float(init_scale)
        self.dtype = dtype
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.init_params(
                key, self._batch_shape_tuple, self.num_filters,
                self.init_scale, dtype)
        self.params = params

    @staticmethod
    def init_params(key, batch_shape, num_filters=(3, 3), init_scale=10.0,
                    dtype=jnp.float32):
        """Initializes the matrices/biases/factors pytree."""
        channels = int(np.prod(batch_shape)) if batch_shape else 1
        filters = (1,) + tuple(num_filters) + (1,)
        scale = init_scale ** (1 / (len(num_filters) + 1))
        matrices, biases, factors = [], [], []
        for i in range(len(num_filters) + 1):
            init = log_expm1(1 / scale / filters[i + 1]).astype(dtype)
            matrices.append(jnp.broadcast_to(
                init, (channels, filters[i + 1], filters[i])))
            key, sub = jax.random.split(key)
            biases.append(jax.random.uniform(
                sub, (channels, filters[i + 1], 1), dtype, -0.5, 0.5))
            if i < len(num_filters):
                factors.append(jnp.zeros((channels, filters[i + 1], 1), dtype))
        return {"matrices": matrices, "biases": biases, "factors": factors}

    @property
    def batch_shape(self):
        return self._batch_shape_tuple

    def _channels(self):
        return int(np.prod(self._batch_shape_tuple)) \
            if self._batch_shape_tuple else 1

    def _broadcast_inputs(self, x):
        shape = jnp.broadcast_shapes(jnp.shape(x), self.batch_shape)
        return jnp.broadcast_to(x, shape)

    def _logits_cumulative(self, inputs):
        """Logits of the cumulative; elementwise in inputs, monotone."""
        shape = jnp.shape(inputs)
        c = self._channels()
        x = jnp.reshape(inputs, (-1, 1, c))
        x = jnp.transpose(x, (2, 1, 0))  # (channels, 1, batch)
        logits = x
        n = len(self.num_filters)
        for i in range(n + 1):
            matrix = jax.nn.softplus(self.params["matrices"][i])
            logits = jnp.einsum("coi,cib->cob", matrix, logits)
            logits = logits + self.params["biases"][i]
            if i < n:
                factor = jnp.tanh(self.params["factors"][i])
                logits = logits + factor * jnp.tanh(logits)
        logits = jnp.transpose(logits, (2, 1, 0))
        return jnp.reshape(logits, shape)

    def log_cdf(self, x):
        return jax.nn.log_sigmoid(
            self._logits_cumulative(self._broadcast_inputs(x)))

    def log_survival_function(self, x):
        return jax.nn.log_sigmoid(
            -self._logits_cumulative(self._broadcast_inputs(x)))

    def cdf(self, x):
        return jax.nn.sigmoid(
            self._logits_cumulative(self._broadcast_inputs(x)))

    def survival_function(self, x):
        return jax.nn.sigmoid(
            -self._logits_cumulative(self._broadcast_inputs(x)))

    def log_prob(self, x):
        x = self._broadcast_inputs(x)
        # p(x) = s(l(x)) s(-l(x)) l'(x); l' via jvp (l is elementwise).
        logits, dlogits = jax.jvp(
            self._logits_cumulative, (x,), (jnp.ones_like(x),))
        return (jax.nn.log_sigmoid(logits) + jax.nn.log_sigmoid(-logits)
                + jnp.log(dlogits))

    def prob(self, x):
        return jnp.exp(self.log_prob(x))

    def _quantization_offset(self):
        return helpers.estimate_tails(
            self._logits_cumulative, 0.0, self.batch_shape, self.dtype)

    def _lower_tail(self, tail_mass):
        target = math.log(tail_mass / 2 / (1.0 - tail_mass / 2))
        return helpers.estimate_tails(
            self._logits_cumulative, target, self.batch_shape, self.dtype)

    def _upper_tail(self, tail_mass):
        target = -math.log(tail_mass / 2 / (1.0 - tail_mass / 2))
        return helpers.estimate_tails(
            self._logits_cumulative, target, self.batch_shape, self.dtype)


class NoisyDeepFactorized(uniform_noise.UniformNoiseAdapter):
    """DeepFactorized convolved with unit-width uniform noise."""

    def __init__(self, **kwargs):
        super().__init__(DeepFactorized(**kwargs))
