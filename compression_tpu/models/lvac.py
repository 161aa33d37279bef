"""lvac: lossy variational audio compression example (reference models/lvac).

The reference ships this only as a notebook (models/lvac/lvac.ipynb); here
it is a small executable module: a 1-D SignalConv autoencoder over audio
frames with a NoisyDeepFactorized bottleneck, trained with the same RD
Lagrangian as the image codecs.  Serves as the 1-D / audio counterpart of
bls2017 and a usage example of SignalConv1D.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from compression_tpu.distributions import deep_factorized, uniform_noise
from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
from compression_tpu.layers import GDN, SignalConv1D

__all__ = ["LVACModel", "train"]


class AnalysisTransform(nn.Module):
    num_filters: int = 64

    @nn.compact
    def __call__(self, x):
        for i, down in enumerate([4, 2, 2]):
            x = SignalConv1D(
                filters=self.num_filters, kernel_support=9, corr=True,
                strides_down=down, padding="same_zeros", use_bias=True,
                name=f"layer_{i}")(x)
            if i < 2:
                x = GDN(name=f"gdn_{i}")(x)
        return x


class SynthesisTransform(nn.Module):
    num_filters: int = 64

    @nn.compact
    def __call__(self, y):
        for i, up in enumerate([2, 2, 4]):
            last = i == 2
            y = SignalConv1D(
                filters=1 if last else self.num_filters, kernel_support=9,
                corr=False, strides_up=up, padding="same_zeros",
                use_bias=True, name=f"layer_{i}")(y)
            if not last:
                y = GDN(inverse=True, name=f"igdn_{i}")(y)
        return y


class LVACModel(nn.Module):
    """Rate-distortion model over [batch, samples, 1] audio frames."""

    lmbda: float = 100.0
    num_filters: int = 64

    def setup(self):
        self.analysis = AnalysisTransform(self.num_filters)
        self.synthesis = SynthesisTransform(self.num_filters)
        self.prior_params = self.param(
            "prior",
            lambda key: deep_factorized.DeepFactorized.init_params(
                key, (self.num_filters,)))

    def prior(self):
        return uniform_noise.UniformNoiseAdapter(
            deep_factorized.DeepFactorized(
                params=self.prior_params,
                batch_shape=(self.num_filters,)))

    def __call__(self, x, training=True, key=None):
        x = jnp.asarray(x, jnp.float32)
        em = ContinuousBatchedEntropyModel(
            prior=self.prior(), coding_rank=2, compression=False,
            offset_heuristic=False)
        y = self.analysis(x)
        y_hat, bits = em(y, training=training, key=key)
        x_hat = self.synthesis(y_hat)[:, : x.shape[1], :]
        num_samples = x.shape[0] * x.shape[1]
        bps = jnp.sum(bits) / num_samples  # bits per sample
        mse = jnp.mean(jnp.square(x - x_hat))
        loss = bps + self.lmbda * mse
        return loss, bps, mse


def train(steps=500, batch_size=8, frame=1024, lmbda=100.0, seed=0,
          data_iter=None, log_every=100):
    """Trains on sine-mixture toy audio unless an iterator is given."""
    model = LVACModel(lmbda=lmbda)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = model.init(
        init_key, jnp.zeros((1, frame, 1)), training=False)
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch, key):
        def loss_fn(p):
            loss, bps, mse = model.apply(p, batch, training=True, key=key)
            return loss, (bps, mse)

        (loss, (bps, mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "bps": bps, "mse": mse}

    def default_iter():
        rng = np.random.RandomState(seed)
        t = np.arange(frame) / 16000.0
        while True:
            f = rng.uniform(100, 2000, (batch_size, 3, 1))
            a = rng.uniform(0.1, 0.5, (batch_size, 3, 1))
            wave = (a * np.sin(2 * np.pi * f * t[None, None, :])).sum(1)
            yield wave[..., None].astype(np.float32)

    it = data_iter if data_iter is not None else default_iter()
    for i, batch in zip(range(steps), it):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, jnp.asarray(batch), sub)
        if log_every and i % log_every == 0:
            print({k: float(v) for k, v in metrics.items()}, flush=True)
    return model, params


if __name__ == "__main__":
    train(steps=200)
