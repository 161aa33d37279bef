"""Minimal scalar distribution protocol for entropy modeling.

The reference builds on tfp.distributions (SURVEY.md §2, L3); here
distributions are lightweight Python objects over jnp arrays, safe to
construct inside jit-traced functions.  Only scalar (event-rank-0)
distributions are needed by the entropy models.

The duck-typed protocol consumed by `helpers.{quantization_offset,
lower_tail, upper_tail}` mirrors the reference
(python/distributions/helpers.py:104-219): distributions may implement
``_quantization_offset() / _lower_tail(m) / _upper_tail(m)`` and the usual
``log_cdf / log_survival_function / quantile / mode / mean``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Distribution", "Normal", "Logistic", "Laplace", "Categorical",
           "MixtureSameFamily"]


class Distribution:
    """Base class: scalar distribution with a batch shape."""

    dtype = jnp.float32

    @property
    def batch_shape(self):
        raise NotImplementedError

    # Subclasses implement a subset of the following; helpers use
    # NotImplementedError to walk their fallback chains.
    def log_prob(self, x):
        raise NotImplementedError

    def prob(self, x):
        return jnp.exp(self.log_prob(x))

    def cdf(self, x):
        return jnp.exp(self.log_cdf(x))

    def log_cdf(self, x):
        raise NotImplementedError

    def survival_function(self, x):
        return jnp.exp(self.log_survival_function(x))

    def log_survival_function(self, x):
        raise NotImplementedError

    def quantile(self, p):
        raise NotImplementedError

    def mean(self):
        raise NotImplementedError

    def mode(self):
        raise NotImplementedError


class Normal(Distribution):
    """Gaussian; loc/scale broadcast to the batch shape."""

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.loc, self.scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def _std(self, x):
        return (x - self.loc) / self.scale

    def log_prob(self, x):
        z = self._std(x)
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * jnp.log(
            2 * jnp.pi).astype(self.dtype)

    def log_cdf(self, x):
        return jax.scipy.stats.norm.logcdf(self._std(x))

    def log_survival_function(self, x):
        return jax.scipy.stats.norm.logcdf(-self._std(x))

    def cdf(self, x):
        return jax.scipy.stats.norm.cdf(self._std(x))

    def survival_function(self, x):
        return jax.scipy.stats.norm.cdf(-self._std(x))

    def quantile(self, p):
        return self.loc + self.scale * jax.scipy.special.ndtri(
            jnp.asarray(p, self.dtype))

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def mode(self):
        return self.mean()

    def sample(self, key, shape=()):
        shape = tuple(shape) + self.batch_shape
        return self.loc + self.scale * jax.random.normal(
            key, shape, self.dtype)


class Logistic(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.loc, self.scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def _std(self, x):
        return (x - self.loc) / self.scale

    def log_prob(self, x):
        z = self._std(x)
        return -z - 2 * jax.nn.softplus(-z) - jnp.log(self.scale)

    def log_cdf(self, x):
        return jax.nn.log_sigmoid(self._std(x))

    def log_survival_function(self, x):
        return jax.nn.log_sigmoid(-self._std(x))

    def quantile(self, p):
        p = jnp.asarray(p, self.dtype)
        return self.loc + self.scale * (jnp.log(p) - jnp.log1p(-p))

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def mode(self):
        return self.mean()


class Laplace(Distribution):
    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.dtype = jnp.result_type(self.loc, self.scale)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(self.loc.shape, self.scale.shape)

    def log_prob(self, x):
        z = jnp.abs(x - self.loc) / self.scale
        return -z - jnp.log(2 * self.scale)

    def log_cdf(self, x):
        z = (x - self.loc) / self.scale
        return jnp.where(
            z <= 0,
            z - jnp.log(2.0).astype(self.dtype),
            jnp.log1p(-0.5 * jnp.exp(-jnp.abs(z))),
        )

    def log_survival_function(self, x):
        z = (x - self.loc) / self.scale
        return jnp.where(
            z >= 0,
            -z - jnp.log(2.0).astype(self.dtype),
            jnp.log1p(-0.5 * jnp.exp(-jnp.abs(z))),
        )

    def quantile(self, p):
        p = jnp.asarray(p, self.dtype)
        return self.loc - self.scale * jnp.sign(p - 0.5) * jnp.log1p(
            -2 * jnp.abs(p - 0.5))

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    def mode(self):
        return self.mean()


class Categorical:
    """Categorical over the last axis (mixture weights)."""

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs/logits.")
        if probs is not None:
            self.logits = jnp.log(jnp.asarray(probs))
        else:
            self.logits = jnp.asarray(logits)

    def log_probs(self):
        return jax.nn.log_softmax(self.logits, axis=-1)


class MixtureSameFamily(Distribution):
    """Mixture of a batched component family along its last batch axis."""

    def __init__(self, mixture_distribution, components_distribution):
        self.mixture = mixture_distribution
        self.components = components_distribution
        self.dtype = components_distribution.dtype

    @property
    def batch_shape(self):
        return self.components.batch_shape[:-1]

    def _mix(self, per_component):
        w = self.mixture.log_probs()
        return jax.scipy.special.logsumexp(per_component + w, axis=-1)

    def log_prob(self, x):
        return self._mix(self.components.log_prob(x[..., None]))

    def log_cdf(self, x):
        return self._mix(self.components.log_cdf(x[..., None]))

    def log_survival_function(self, x):
        return self._mix(self.components.log_survival_function(x[..., None]))

    def mean(self):
        w = jnp.exp(self.mixture.log_probs())
        return jnp.sum(w * self.components.mean(), axis=-1)
