"""Toy-source research harness (reference models/toy_sources/*).

JAX counterpart of the reference's 1-2D toy-source experiments: stochastic
process sources (ramp, sawbridge, sinusoid, sphere), the `CompressionModel`
RD training loop, the nonlinear-transform-coding `NTCModel` with
deep/GSM/GMM/LSM/LMM priors and dither/soft-round options, and the
entropy-constrained vector quantization `VECVQModel`.

Functional/flax style: sources are sampling functions over PRNG keys,
models are flax modules with explicit train states.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.distributions import base as dist_base
from compression_tpu.distributions import deep_factorized
from compression_tpu.distributions import helpers
from compression_tpu.distributions import round_adapters
from compression_tpu.distributions import uniform_noise
from compression_tpu.ops import round_ops

__all__ = [
    "ramp_sample",
    "sawbridge_sample",
    "sinusoid_sample",
    "sphere_sample",
    "NTCModel",
    "VECVQModel",
    "make_ntc_train_step",
    "train_ntc",
]


# --- sources ----------------------------------------------------------------
def ramp_sample(key, n, index_points, phase=None):
    """Y(t) = (t + V) mod 1 - 0.5, V ~ U[0,1] (reference ramp.py)."""
    ind = jnp.asarray(index_points)
    if phase is None:
        phase = jax.random.uniform(key, (n, 1), ind.dtype)
    else:
        phase = jnp.full((n, 1), phase, ind.dtype)
    return (ind + phase) % 1 - 0.5


def sawbridge_sample(key, n, index_points, phase=None, drop=None,
                     stationary=True, order=1):
    """B(t) = t - 1(t > Z), stationarized and order-averaged."""
    ind = jnp.asarray(index_points)
    kd, kp = jax.random.split(key)
    if drop is None:
        z = jax.random.uniform(kd, (order, n, 1), ind.dtype)
    else:
        z = jnp.full((order, n, 1), drop, ind.dtype)
    t = ind
    if stationary:
        if phase is None:
            v = jax.random.uniform(kp, (n, 1), ind.dtype)
        else:
            v = jnp.asarray(phase, ind.dtype)
        t = (ind + v) % 1
    out = t - (t > z).astype(ind.dtype)
    return jnp.mean(out, axis=0) * jnp.sqrt(jnp.asarray(float(order)))


def sinusoid_sample(key, n, index_points, phase=None):
    """X(t) = sin(2 pi (t + V))."""
    ind = jnp.asarray(index_points)
    if phase is None:
        phase = jax.random.uniform(key, (n, 1), ind.dtype)
    else:
        phase = jnp.full((n, 1), phase, ind.dtype)
    return jnp.sin(2 * jnp.pi * (ind + phase))


def sphere_sample(key, n, order=2, width=0.0):
    """Uniform on the unit sphere (optionally a thick shell)."""
    kn, kw = jax.random.split(key)
    samples = jax.random.normal(kn, (n, order))
    radius = jnp.sqrt(jnp.sum(jnp.square(samples), -1, keepdims=True))
    if width:
        radius = radius * jax.random.uniform(
            kw, (n, 1), minval=1 - width / 2, maxval=1 + width / 2)
    return samples / radius


# --- NTC model ---------------------------------------------------------------
class MLP(nn.Module):
    """Small MLP transform (the reference notebooks use 2x100 softplus)."""

    features: Sequence[int]
    activation: Callable = jax.nn.softplus

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features[:-1]):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            x = self.activation(x)
        return nn.Dense(self.features[-1], name="out")(x)


class NTCModel(nn.Module):
    """Nonlinear transform coding on a toy source (reference ntc.py)."""

    ndim_source: int
    ndim_latent: int
    lmbda: float = 1.0
    distortion_loss: str = "sse"
    prior_type: str = "deep"  # or gsm-X / gmm-X / lsm-X / lmm-X
    dither: Tuple[bool, bool, bool, bool] = (True, True, False, False)
    soft_round: Tuple[bool, bool] = (True, False)
    guess_offset: bool = False
    hidden: int = 100

    def setup(self):
        self._analysis = MLP((self.hidden, self.hidden, self.ndim_latent),
                             name="analysis")
        self._synthesis = MLP((self.hidden, self.hidden, self.ndim_source),
                              name="synthesis")
        if self.prior_type == "deep":
            self.prior_params = self.param(
                "prior",
                lambda key: deep_factorized.DeepFactorized.init_params(
                    key, (self.ndim_latent,)))
        elif self.prior_type[:4] in ("gsm-", "gmm-", "lsm-", "lmm-"):
            components = int(self.prior_type[4:])
            shape = (self.ndim_latent, components)
            self.logits = self.param(
                "logits", nn.initializers.normal(1.0), shape)
            self.log_scale = self.param(
                "log_scale",
                lambda key, s: 2.0 + jax.random.normal(key, s), shape)
            if "m" in self.prior_type[:4]:
                self.loc = self.param(
                    "loc", nn.initializers.normal(1.0), shape)
            else:
                self.loc = 0.0
        else:
            raise ValueError(f"Unknown prior_type: '{self.prior_type}'.")
        self.logit_alpha = self.param(
            "logit_alpha", lambda key: jnp.asarray(-3.0))

    @property
    def alpha(self):
        return jax.nn.sigmoid(self.logit_alpha) * 4.0

    def prior(self, soft_round, skip_noise=False):
        if self.prior_type == "deep":
            prior = deep_factorized.DeepFactorized(
                params=self.prior_params,
                batch_shape=(self.ndim_latent,))
        else:
            cls = (dist_base.Normal if self.prior_type.startswith("g")
                   else dist_base.Logistic)
            prior = dist_base.MixtureSameFamily(
                mixture_distribution=dist_base.Categorical(
                    logits=self.logits),
                components_distribution=cls(
                    loc=self.loc, scale=jnp.exp(self.log_scale)),
            )
        if soft_round:
            prior = round_adapters.SoftRoundAdapter(prior, self.alpha)
        if skip_noise:
            return prior
        return uniform_noise.UniformNoiseAdapter(prior)

    def analysis(self, x):
        batch_shape = x.shape[:-1]
        y = self._analysis(x.reshape(-1, self.ndim_source))
        return y.reshape(batch_shape + (self.ndim_latent,))

    def synthesis(self, y):
        batch_shape = y.shape[:-1]
        x = self._synthesis(y.reshape(-1, self.ndim_latent))
        return x.reshape(batch_shape + (self.ndim_source,))

    def distortion_fn(self, reference, reconstruction):
        diff = jnp.square(reference - reconstruction)
        if self.distortion_loss == "sse":
            return jnp.sum(diff, axis=-1)
        if self.distortion_loss == "mse":
            return jnp.mean(diff, axis=-1)
        raise ValueError(self.distortion_loss)

    def encode_decode(self, x, dither_rate, dither_dist, soft_round,
                      key=None, offset=0.0):
        prior = self.prior(soft_round=soft_round)

        def perturb(inputs, dither, key):
            if dither:
                if soft_round:
                    inputs = round_ops.soft_round(inputs, self.alpha)
                inputs = inputs + jax.random.uniform(
                    key, inputs.shape, inputs.dtype, -0.5, 0.5)
                if soft_round:
                    inputs = round_ops.soft_round_conditional_mean(
                        inputs, self.alpha)
                return inputs
            off = None if isinstance(offset, float) and offset == 0.0 \
                else offset
            if self.guess_offset and not soft_round:
                qoff = helpers.quantization_offset(prior)
                off = qoff if off is None else off + qoff
            return round_ops.round_st(inputs, off)

        y = self.analysis(x)
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        y_dist = perturb(y, dither_dist, k2)
        if dither_rate == dither_dist:
            y_rate = y_dist
        else:
            y_rate = perturb(y, dither_rate, k1)
        x_hat = self.synthesis(y_dist)
        log_probs = prior.log_prob(y_rate)
        rates = jnp.sum(log_probs, axis=-1) / (-jnp.log(2.0))
        return y_dist, x_hat, rates

    def train_losses(self, x, key=None):
        _, x_hat, rates = self.encode_decode(
            x, self.dither[0], self.dither[1], self.soft_round[0], key=key)
        return rates, self.distortion_fn(x, x_hat)

    def test_losses(self, x, key=None):
        _, x_hat, rates = self.encode_decode(
            x, self.dither[2], self.dither[3], self.soft_round[1], key=key)
        return rates, self.distortion_fn(x, x_hat)

    def __call__(self, x, training=True, key=None):
        rates, distortions = (
            self.train_losses(x, key) if training else self.test_losses(x, key))
        losses = rates + self.lmbda * distortions
        return jnp.mean(losses), jnp.mean(rates), jnp.mean(distortions)

    def quantize_codebook(self, x):
        """Returns (codebook, rates, indexes) over the induced lattice."""
        y_hat, x_hat, rates = self.encode_decode(x, False, False, False)
        flat_y = np.asarray(y_hat).reshape(-1, self.ndim_latent)
        _, i, indexes = np.unique(
            flat_y, return_index=True, return_inverse=True, axis=0)
        codebook = np.asarray(x_hat).reshape(-1, self.ndim_source)[i]
        rates = np.asarray(rates).reshape(-1)[i]
        indexes = indexes.reshape(x.shape[:-1]).astype(np.int32)
        return codebook, rates, indexes


class VECVQModel(nn.Module):
    """Variational entropy-constrained VQ (reference vecvq.py)."""

    ndim_source: int
    codebook_size: int
    lmbda: float = 1.0
    distortion_loss: str = "sse"
    logit_scale: float = 1.0
    init_width: float = 2.0

    def setup(self):
        self.codebook = self.param(
            "codebook",
            lambda key: jax.random.uniform(
                key, (self.codebook_size, self.ndim_source),
                minval=-self.init_width / 2, maxval=self.init_width / 2))
        self._logits = self.param(
            "logits", nn.initializers.normal(self.logit_scale / 10),
            (self.codebook_size,))

    @property
    def logits(self):
        return self._logits / self.logit_scale

    def distortion_fn(self, reference, reconstruction):
        diff = jnp.square(reference - reconstruction)
        if self.distortion_loss == "sse":
            return jnp.sum(diff, axis=-1)
        return jnp.mean(diff, axis=-1)

    def all_rd(self, x):
        rates = (jax.scipy.special.logsumexp(self.logits)
                 - self.logits) / jnp.log(2.0)
        distortions = self.distortion_fn(x[..., None, :], self.codebook)
        return rates, distortions

    def __call__(self, x, training=True, key=None):
        del training, key
        rates, distortions = self.all_rd(x)
        all_rd = rates + self.lmbda * distortions
        if True:  # soft assignment for differentiability of the argmin
            indexes = jnp.argmin(all_rd, axis=-1)
        r = jnp.take(rates, indexes)
        d = jnp.take_along_axis(
            distortions, indexes[..., None], axis=-1)[..., 0]
        losses = r + self.lmbda * d
        return jnp.mean(losses), jnp.mean(r), jnp.mean(d)

    def quantize(self, x):
        rates, distortions = self.all_rd(x)
        all_rd = rates + self.lmbda * distortions
        indexes = jnp.argmin(all_rd, axis=-1).astype(jnp.int32)
        return self.codebook, rates, indexes


def make_ntc_train_step(model, optimizer):
    @jax.jit
    def step(params, opt_state, batch, key):
        def loss_fn(p):
            loss, rate, dist = model.apply(p, batch, training=True, key=key)
            return loss, (rate, dist)

        (loss, (rate, dist)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {
            "loss": loss, "rate": rate, "distortion": dist}

    return step


def train_ntc(sample_fn, model, steps=2000, batch_size=512,
              learning_rate=1e-3, seed=0, log_every=0):
    """RD training loop (reference compression_model.py train_step)."""
    key = jax.random.PRNGKey(seed)
    key, init_key, data_key = jax.random.split(key, 3)
    x0 = sample_fn(data_key, batch_size)
    params = model.init(init_key, x0, training=False)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step_fn = make_ntc_train_step(model, optimizer)
    for i in range(steps):
        key, kd, kn = jax.random.split(key, 3)
        batch = sample_fn(kd, batch_size)
        params, opt_state, metrics = step_fn(params, opt_state, batch, kn)
        if log_every and i % log_every == 0:
            print({k: float(v) for k, v in metrics.items()}, flush=True)
    return params, metrics
