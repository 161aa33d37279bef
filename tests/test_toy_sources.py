"""Toy-source harness tests (reference models/toy_sources spec)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu.models import toy_sources as ts


class TestSources:
    def test_ramp(self):
        t = jnp.linspace(0, 1, 16, endpoint=False)
        x = ts.ramp_sample(jax.random.PRNGKey(0), 8, t)
        assert x.shape == (8, 16)
        assert np.all(np.abs(np.asarray(x)) <= 0.5)

    def test_sawbridge(self):
        t = jnp.linspace(0, 1, 32)
        x = ts.sawbridge_sample(jax.random.PRNGKey(1), 4, t, order=2)
        assert x.shape == (4, 32)
        assert np.all(np.isfinite(np.asarray(x)))

    def test_sinusoid(self):
        t = jnp.linspace(0, 1, 10)
        x = ts.sinusoid_sample(jax.random.PRNGKey(2), 4, t)
        assert np.all(np.abs(np.asarray(x)) <= 1.0 + 1e-6)

    def test_sphere(self):
        x = ts.sphere_sample(jax.random.PRNGKey(3), 100, order=3)
        norms = np.linalg.norm(np.asarray(x), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.parametrize("prior_type", ["deep", "gsm-2", "lmm-2"])
def test_ntc_trains(prior_type):
    model = ts.NTCModel(
        ndim_source=2, ndim_latent=2, lmbda=10.0, prior_type=prior_type,
        hidden=16)
    sample_fn = functools.partial(
        ts.sphere_sample, order=2)
    params, metrics = ts.train_ntc(
        lambda k, n: sample_fn(k, n), model, steps=20, batch_size=64)
    assert np.isfinite(float(metrics["loss"]))


def test_ntc_quantize_codebook():
    model = ts.NTCModel(ndim_source=1, ndim_latent=1, lmbda=30.0, hidden=8)
    x = jnp.linspace(-1, 1, 64)[:, None]
    params = model.init(jax.random.PRNGKey(0), x, training=False)
    codebook, rates, indexes = model.apply(
        params, x, method=ts.NTCModel.quantize_codebook)
    assert codebook.shape[1] == 1
    assert indexes.shape == (64,)
    assert indexes.max() < len(codebook)


def test_vecvq_trains():
    model = ts.VECVQModel(ndim_source=2, codebook_size=8, lmbda=20.0)
    params, metrics = ts.train_ntc(
        lambda k, n: ts.sphere_sample(k, n, order=2), model,
        steps=20, batch_size=64)
    assert np.isfinite(float(metrics["loss"]))
