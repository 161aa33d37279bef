"""Minimal tensorflow_probability stand-in (test harness only).

The image has TF 2.21 but no tensorflow_probability, so the REFERENCE
Python entropy-model stack (mounted read-only at /root/reference) cannot
import as-is.  This module supplies exactly the tfp surface the reference
distributions/entropy_models use — `distributions.Distribution` dispatch
semantics, `Normal`/`Logistic`/`Laplace` (with TFP's `special_math.ndtr`
/ `log_ndtr` formulas so float32 values match real TFP), `Categorical`
and `MixtureSameFamily` — so the reference code can run UNMODIFIED from
its mount as a golden-fixture oracle (see make_golden_em.py).

This is a test fixture generator dependency only; nothing here is part of
the compression_tpu package.
"""

import math

import numpy as np
import tensorflow as tf

__version__ = "0.0-shim"


class ReparameterizationType:

    def __init__(self, rep_type):
        self._rep_type = rep_type

    def __repr__(self):
        return f"<Reparameterization Type: {self._rep_type}>"


NOT_REPARAMETERIZED = ReparameterizationType("NOT_REPARAMETERIZED")
FULLY_REPARAMETERIZED = ReparameterizationType("FULLY_REPARAMETERIZED")


# --- special_math: same formulas as tfp.internal.special_math ----------

_HALF_SQRT_2 = 0.5 * np.sqrt(2.0)
_LOGNDTR_FLOAT64_LOWER = -20.0
_LOGNDTR_FLOAT32_LOWER = -10.0
_LOGNDTR_FLOAT64_UPPER = 8.0
_LOGNDTR_FLOAT32_UPPER = 5.0


def ndtr(x):
    """Normal CDF, computed as in tfp.internal.special_math.ndtr."""
    x = tf.convert_to_tensor(x)
    half_sqrt_2 = tf.constant(_HALF_SQRT_2, x.dtype)
    w = x * half_sqrt_2
    z = tf.abs(w)
    y = tf.where(z < half_sqrt_2,
                 1. + tf.math.erf(w),
                 tf.where(w > 0., 2. - tf.math.erfc(z), tf.math.erfc(z)))
    return 0.5 * y


def _double_factorial(n):
    return np.prod(np.arange(n, 1, -2))


def _log_ndtr_asymptotic_series(x, series_order):
    npdt = x.dtype.as_numpy_dtype
    if series_order <= 0:
        return np.array(1, npdt)
    x_2 = tf.square(x)
    even_sum = tf.zeros_like(x)
    odd_sum = tf.zeros_like(x)
    x_2n = x_2
    for n in range(1, series_order + 1):
        y = npdt(_double_factorial(2 * n - 1)) / x_2n
        if n % 2:
            odd_sum += y
        else:
            even_sum += y
        x_2n *= x_2
    return 1. + even_sum - odd_sum


def _log_ndtr_lower(x, series_order):
    x_2 = tf.square(x)
    log_scale = (-0.5 * x_2 - tf.math.log(-x)
                 - tf.constant(0.5 * math.log(2. * math.pi), x.dtype))
    return log_scale + tf.math.log(
        _log_ndtr_asymptotic_series(x, series_order))


def log_ndtr(x, series_order=3):
    """log of Normal CDF, as in tfp.internal.special_math.log_ndtr."""
    x = tf.convert_to_tensor(x)
    if x.dtype == tf.float64:
        lower, upper = _LOGNDTR_FLOAT64_LOWER, _LOGNDTR_FLOAT64_UPPER
    else:
        lower, upper = _LOGNDTR_FLOAT32_LOWER, _LOGNDTR_FLOAT32_UPPER
    return tf.where(
        x > upper,
        -ndtr(-x),  # log(1-x) ~= -x, x << 1
        tf.where(x > lower,
                 tf.math.log(ndtr(tf.maximum(x, lower))),
                 _log_ndtr_lower(tf.minimum(x, lower), series_order)))


# --- Distribution base --------------------------------------------------


class Distribution(tf.Module):
    """tfp.distributions.Distribution with TFP's public-method fallbacks."""

    def __init__(self, dtype=tf.float32, reparameterization_type=None,
                 validate_args=False, allow_nan_stats=True, parameters=None,
                 name=None):
        super().__init__(name=(name or type(self).__name__).replace(" ", "_"))
        self._dtype = tf.as_dtype(dtype) if dtype is not None else None
        self._reparameterization_type = reparameterization_type
        self._validate_args = validate_args
        self._allow_nan_stats = allow_nan_stats
        if parameters is not None:
            parameters = {k: v for k, v in parameters.items()
                          if k not in ("self", "__class__")}
        self._parameters = parameters or {}

    @property
    def dtype(self):
        return self._dtype

    @property
    def reparameterization_type(self):
        return self._reparameterization_type

    @property
    def validate_args(self):
        return self._validate_args

    @property
    def allow_nan_stats(self):
        return self._allow_nan_stats

    @property
    def parameters(self):
        return dict(self._parameters)

    # shape machinery
    def _batch_shape(self):
        return tf.TensorShape(None)

    def _batch_shape_tensor(self):
        raise NotImplementedError

    def _event_shape(self):
        return tf.TensorShape(None)

    def _event_shape_tensor(self):
        raise NotImplementedError

    @property
    def batch_shape(self):
        return tf.TensorShape(self._batch_shape())

    def batch_shape_tensor(self, name="batch_shape_tensor"):
        # TFP returns the static shape as an int32 constant when it is
        # fully known, only falling back to `_batch_shape_tensor()`.
        del name
        static = self.batch_shape
        if static.is_fully_defined():
            return tf.constant(static.as_list(), dtype=tf.int32)
        return self._batch_shape_tensor()

    @property
    def event_shape(self):
        return tf.TensorShape(self._event_shape())

    def event_shape_tensor(self, name="event_shape_tensor"):
        del name
        static = self.event_shape
        if static.is_fully_defined():
            return tf.constant(static.as_list(), dtype=tf.int32)
        return self._event_shape_tensor()

    def _cast(self, value):
        return tf.convert_to_tensor(value, dtype_hint=self.dtype)

    # public dispatch with TFP's fallback chains
    def log_prob(self, value, name="log_prob"):
        del name
        value = self._cast(value)
        try:
            return self._log_prob(value)
        except (AttributeError, NotImplementedError):
            return tf.math.log(self._prob(value))

    def prob(self, value, name="prob"):
        del name
        value = self._cast(value)
        try:
            return self._prob(value)
        except (AttributeError, NotImplementedError):
            return tf.exp(self._log_prob(value))

    def cdf(self, value, name="cdf"):
        del name
        value = self._cast(value)
        try:
            return self._cdf(value)
        except (AttributeError, NotImplementedError):
            return tf.exp(self._log_cdf(value))

    def log_cdf(self, value, name="log_cdf"):
        del name
        value = self._cast(value)
        try:
            return self._log_cdf(value)
        except (AttributeError, NotImplementedError):
            return tf.math.log(self._cdf(value))

    def survival_function(self, value, name="survival_function"):
        del name
        value = self._cast(value)
        try:
            return self._survival_function(value)
        except (AttributeError, NotImplementedError):
            return 1. - self.cdf(value)

    def log_survival_function(self, value, name="log_survival_function"):
        del name
        value = self._cast(value)
        try:
            return self._log_survival_function(value)
        except (AttributeError, NotImplementedError):
            return tf.math.log1p(-self.cdf(value))

    def quantile(self, value, name="quantile"):
        del name
        value = self._cast(value)
        return self._quantile(value)

    def _quantile(self, value):
        raise NotImplementedError("quantile is not implemented")

    def mean(self, name="mean"):
        del name
        return self._mean()

    def _mean(self):
        raise NotImplementedError("mean is not implemented")

    def mode(self, name="mode"):
        del name
        return self._mode()

    def _mode(self):
        raise NotImplementedError("mode is not implemented")

    def stddev(self, name="stddev"):
        del name
        return self._stddev()

    def _stddev(self):
        raise NotImplementedError("stddev is not implemented")

    def sample(self, sample_shape=(), seed=None, name="sample"):
        del name
        sample_shape = tf.convert_to_tensor(
            sample_shape, dtype=tf.int32, name="sample_shape")
        n = int(np.prod(sample_shape.numpy())) if sample_shape.shape.rank \
            else int(sample_shape.numpy())
        return self._sample_n(n, seed=seed)


# --- concrete distributions ---------------------------------------------


class Normal(Distribution):
    """tfp.distributions.Normal (the surface the reference uses)."""

    def __init__(self, loc, scale, validate_args=False, allow_nan_stats=True,
                 name="Normal"):
        parameters = dict(locals())
        loc = tf.convert_to_tensor(loc)
        self._loc = tf.cast(loc, loc.dtype)
        self._scale = tf.cast(tf.convert_to_tensor(scale), loc.dtype)
        super().__init__(
            dtype=self._loc.dtype,
            reparameterization_type=FULLY_REPARAMETERIZED,
            validate_args=validate_args, allow_nan_stats=allow_nan_stats,
            parameters=parameters, name=name)

    @property
    def loc(self):
        return self._loc

    @property
    def scale(self):
        return self._scale

    def _batch_shape(self):
        return tf.broadcast_static_shape(self._loc.shape, self._scale.shape)

    def _batch_shape_tensor(self):
        return tf.broadcast_dynamic_shape(
            tf.shape(self._loc), tf.shape(self._scale))

    def _event_shape(self):
        return tf.TensorShape([])

    def _event_shape_tensor(self):
        return tf.constant([], dtype=tf.int32)

    def _z(self, x):
        return (x - self._loc) / self._scale

    def _log_prob(self, x):
        z = self._z(x)
        log_unnormalized = -0.5 * tf.square(z)
        log_normalization = (
            tf.constant(0.5 * math.log(2. * math.pi), x.dtype)
            + tf.math.log(self._scale))
        return log_unnormalized - log_normalization

    def _cdf(self, x):
        return ndtr(self._z(x))

    def _log_cdf(self, x):
        return log_ndtr(self._z(x))

    def _survival_function(self, x):
        return ndtr(-self._z(x))

    def _log_survival_function(self, x):
        return log_ndtr(-self._z(x))

    def _quantile(self, p):
        return self._loc + self._scale * tf.math.ndtri(p)

    def _mean(self):
        return self._loc * tf.ones_like(self._scale)

    def _mode(self):
        return self._mean()

    def _stddev(self):
        return self._scale * tf.ones_like(self._loc)

    def _sample_n(self, n, seed=None):
        shape = tf.concat([[n], self._batch_shape_tensor()], 0)
        return self._loc + self._scale * tf.random.normal(
            shape, dtype=self.dtype, seed=seed)


class Logistic(Distribution):

    def __init__(self, loc, scale, validate_args=False, allow_nan_stats=True,
                 name="Logistic"):
        parameters = dict(locals())
        loc = tf.convert_to_tensor(loc)
        self._loc = tf.cast(loc, loc.dtype)
        self._scale = tf.cast(tf.convert_to_tensor(scale), loc.dtype)
        super().__init__(
            dtype=self._loc.dtype,
            reparameterization_type=FULLY_REPARAMETERIZED,
            validate_args=validate_args, allow_nan_stats=allow_nan_stats,
            parameters=parameters, name=name)

    loc = property(lambda self: self._loc)
    scale = property(lambda self: self._scale)

    def _batch_shape(self):
        return tf.broadcast_static_shape(self._loc.shape, self._scale.shape)

    def _batch_shape_tensor(self):
        return tf.broadcast_dynamic_shape(
            tf.shape(self._loc), tf.shape(self._scale))

    def _event_shape(self):
        return tf.TensorShape([])

    def _event_shape_tensor(self):
        return tf.constant([], dtype=tf.int32)

    def _z(self, x):
        return (x - self._loc) / self._scale

    def _log_prob(self, x):
        z = self._z(x)
        return (-z - 2. * tf.math.softplus(-z) - tf.math.log(self._scale))

    def _cdf(self, x):
        return tf.math.sigmoid(self._z(x))

    def _log_cdf(self, x):
        return -tf.math.softplus(-self._z(x))

    def _survival_function(self, x):
        return tf.math.sigmoid(-self._z(x))

    def _log_survival_function(self, x):
        return -tf.math.softplus(self._z(x))

    def _quantile(self, p):
        return self._loc + self._scale * (
            tf.math.log(p) - tf.math.log1p(-p))

    def _mean(self):
        return self._loc * tf.ones_like(self._scale)

    def _mode(self):
        return self._mean()


class Laplace(Distribution):

    def __init__(self, loc, scale, validate_args=False, allow_nan_stats=True,
                 name="Laplace"):
        parameters = dict(locals())
        loc = tf.convert_to_tensor(loc)
        self._loc = tf.cast(loc, loc.dtype)
        self._scale = tf.cast(tf.convert_to_tensor(scale), loc.dtype)
        super().__init__(
            dtype=self._loc.dtype,
            reparameterization_type=FULLY_REPARAMETERIZED,
            validate_args=validate_args, allow_nan_stats=allow_nan_stats,
            parameters=parameters, name=name)

    loc = property(lambda self: self._loc)
    scale = property(lambda self: self._scale)

    def _batch_shape(self):
        return tf.broadcast_static_shape(self._loc.shape, self._scale.shape)

    def _batch_shape_tensor(self):
        return tf.broadcast_dynamic_shape(
            tf.shape(self._loc), tf.shape(self._scale))

    def _event_shape(self):
        return tf.TensorShape([])

    def _event_shape_tensor(self):
        return tf.constant([], dtype=tf.int32)

    def _z(self, x):
        return (x - self._loc) / self._scale

    def _log_prob(self, x):
        z = self._z(x)
        return (-tf.abs(z) - tf.constant(math.log(2.), x.dtype)
                - tf.math.log(self._scale))

    def _cdf(self, x):
        z = self._z(x)
        return 0.5 - 0.5 * tf.sign(z) * tf.math.expm1(-tf.abs(z))

    def _log_cdf(self, x):
        z = self._z(x)
        return tf.where(z > 0.,
                        tf.math.log1p(-0.5 * tf.exp(-z)),
                        tf.constant(math.log(0.5), x.dtype) + z)

    def _survival_function(self, x):
        return self._cdf(2. * self._loc - x)

    def _log_survival_function(self, x):
        return self._log_cdf(2. * self._loc - x)

    def _quantile(self, p):
        return tf.where(
            p > 0.5,
            self._loc - self._scale * tf.math.log(2. * (1. - p)),
            self._loc + self._scale * tf.math.log(2. * p))

    def _mean(self):
        return self._loc * tf.ones_like(self._scale)

    def _mode(self):
        return self._mean()


class Categorical(Distribution):

    def __init__(self, logits=None, probs=None, validate_args=False,
                 allow_nan_stats=True, name="Categorical"):
        parameters = dict(locals())
        if (logits is None) == (probs is None):
            raise ValueError("Exactly one of logits/probs must be given.")
        if probs is not None:
            probs = tf.convert_to_tensor(probs)
            logits = tf.math.log(probs)
        else:
            logits = tf.convert_to_tensor(logits)
        self._logits = logits
        self._probs = probs
        super().__init__(
            dtype=tf.int32, reparameterization_type=NOT_REPARAMETERIZED,
            validate_args=validate_args, allow_nan_stats=allow_nan_stats,
            parameters=parameters, name=name)

    @property
    def logits(self):
        return self._logits

    def probs_parameter(self):
        if self._probs is not None:
            return self._probs
        return tf.math.softmax(self._logits)

    def logits_parameter(self):
        return self._logits

    def _batch_shape(self):
        return self._logits.shape[:-1]

    def _batch_shape_tensor(self):
        return tf.shape(self._logits)[:-1]

    def _event_shape(self):
        return tf.TensorShape([])

    def _event_shape_tensor(self):
        return tf.constant([], dtype=tf.int32)

    def log_probs_all(self):
        return tf.math.log_softmax(self._logits)


class MixtureSameFamily(Distribution):
    """Univariate mixture; the surface NoisyMixtureSameFamily needs."""

    def __init__(self, mixture_distribution, components_distribution,
                 validate_args=False, allow_nan_stats=True,
                 name="MixtureSameFamily"):
        parameters = dict(locals())
        self._mixture_distribution = mixture_distribution
        self._components_distribution = components_distribution
        super().__init__(
            dtype=components_distribution.dtype,
            reparameterization_type=NOT_REPARAMETERIZED,
            validate_args=validate_args, allow_nan_stats=allow_nan_stats,
            parameters=parameters, name=name)

    @property
    def mixture_distribution(self):
        return self._mixture_distribution

    @property
    def components_distribution(self):
        return self._components_distribution

    def _batch_shape(self):
        return self._components_distribution.batch_shape[:-1]

    def _batch_shape_tensor(self):
        return self._components_distribution.batch_shape_tensor()[:-1]

    def _event_shape(self):
        return tf.TensorShape([])

    def _event_shape_tensor(self):
        return tf.constant([], dtype=tf.int32)

    def _pad(self, x):
        return x[..., tf.newaxis]

    def _mixture_log_weights(self):
        return tf.math.log_softmax(
            self._mixture_distribution.logits_parameter())

    def _log_prob(self, x):
        lp = self._components_distribution.log_prob(self._pad(x))
        return tf.reduce_logsumexp(lp + self._mixture_log_weights(), axis=-1)

    def _log_cdf(self, x):
        lc = self._components_distribution.log_cdf(self._pad(x))
        return tf.reduce_logsumexp(lc + self._mixture_log_weights(), axis=-1)

    def _cdf(self, x):
        c = self._components_distribution.cdf(self._pad(x))
        w = tf.math.softmax(self._mixture_distribution.logits_parameter())
        return tf.reduce_sum(c * w, axis=-1)

    def _log_survival_function(self, x):
        ls = self._components_distribution.log_survival_function(self._pad(x))
        return tf.reduce_logsumexp(ls + self._mixture_log_weights(), axis=-1)

    def _mean(self):
        m = self._components_distribution.mean()
        w = tf.math.softmax(self._mixture_distribution.logits_parameter())
        return tf.reduce_sum(m * w, axis=-1)


class _Distributions:
    Distribution = Distribution
    Normal = Normal
    Logistic = Logistic
    Laplace = Laplace
    Categorical = Categorical
    MixtureSameFamily = MixtureSameFamily
    ReparameterizationType = ReparameterizationType
    NOT_REPARAMETERIZED = NOT_REPARAMETERIZED
    FULLY_REPARAMETERIZED = FULLY_REPARAMETERIZED


distributions = _Distributions()
