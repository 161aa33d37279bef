"""Distribution layer tests, mirroring the reference's behavioral specs:

- uniform-noise adapters match analytic convolutions (uniform_noise_test.py)
- DeepFactorized reduces to logistic special case (deep_factorized_test.py)
- tail helpers produce ordered, mass-consistent tails (helpers_test.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu import distributions as d
from compression_tpu.distributions import helpers


class TestScalarDistributions:
    @pytest.mark.parametrize("dist_cls,loc,scale", [
        (d.Normal, 0.3, 1.7), (d.Logistic, -0.2, 0.8), (d.Laplace, 1.1, 2.0)])
    def test_cdf_sf_consistency(self, dist_cls, loc, scale):
        dist = dist_cls(loc=loc, scale=scale)
        x = jnp.linspace(-8, 8, 101)
        np.testing.assert_allclose(
            dist.cdf(x) + dist.survival_function(x), 1.0, atol=1e-6)
        np.testing.assert_allclose(
            np.exp(dist.log_cdf(x)), dist.cdf(x), atol=1e-6)

    @pytest.mark.parametrize("dist_cls", [d.Normal, d.Logistic, d.Laplace])
    def test_quantile_inverts_cdf(self, dist_cls):
        dist = dist_cls(loc=0.5, scale=2.0)
        p = jnp.array([0.01, 0.1, 0.5, 0.9, 0.99])
        np.testing.assert_allclose(dist.cdf(dist.quantile(p)), p, atol=1e-5)

    @pytest.mark.parametrize("dist_cls", [d.Normal, d.Logistic, d.Laplace])
    def test_log_prob_integrates_to_one(self, dist_cls):
        dist = dist_cls(loc=0.0, scale=1.3)
        x = jnp.linspace(-30, 30, 20001)
        total = jnp.trapezoid(jnp.exp(dist.log_prob(x)), x)
        np.testing.assert_allclose(total, 1.0, atol=1e-4)


class TestUniformNoise:
    def test_matches_analytic_convolution(self):
        base = d.Normal(loc=0.25, scale=1.5)
        noisy = d.NoisyNormal(loc=0.25, scale=1.5)
        y = jnp.linspace(-6, 6, 201)
        expected = base.cdf(y + 0.5) - base.cdf(y - 0.5)
        np.testing.assert_allclose(noisy.prob(y), expected, atol=1e-6)
        np.testing.assert_allclose(
            jnp.exp(noisy.log_prob(y)), expected, atol=1e-6)

    def test_stable_far_tails(self):
        noisy = d.NoisyNormal(loc=0.0, scale=1.0)
        y = jnp.array([-40.0, 40.0])
        lp = noisy.log_prob(y)
        assert np.all(np.isfinite(lp))
        assert np.all(lp < -100)

    def test_offset_and_tails(self):
        noisy = d.NoisyNormal(loc=jnp.array([0.3, -0.6]), scale=1.0)
        off = helpers.quantization_offset(noisy)
        np.testing.assert_allclose(off, [0.3, 0.4], atol=1e-6)
        lo = helpers.lower_tail(noisy, 2**-8)
        hi = helpers.upper_tail(noisy, 2**-8)
        assert np.all(np.asarray(lo) < np.asarray(hi))

    def test_mixture(self):
        m = d.NoisyNormalMixture(
            loc=jnp.array([[-3.0, 3.0]]), scale=jnp.array([[0.5, 0.5]]),
            weight=jnp.array([[0.3, 0.7]]))
        y = jnp.linspace(-6, 6, 121)[:, None]
        p = m.prob(y)
        total = jnp.trapezoid(p[:, 0], y[:, 0])
        np.testing.assert_allclose(total, 1.0, atol=1e-3)
        assert m.batch_shape == (1,)


class TestDeepFactorized:
    def test_shapes_and_normalization(self):
        # At init the CDF behaves like a logistic with scale ~ init_scale,
        # so integrate well past the heavy tails.
        df = d.DeepFactorized(
            batch_shape=(3,), key=jax.random.PRNGKey(0))
        x = jnp.linspace(-300, 300, 6001)[:, None]
        p = df.prob(jnp.broadcast_to(x, (6001, 3)))
        totals = jnp.trapezoid(p, x[:, 0], axis=0)
        np.testing.assert_allclose(totals, 1.0, atol=1e-3)

    def test_logistic_special_case(self):
        # With init_scale such that softplus weights ~ logistic behavior:
        # at initialization (factors=0), logits are affine in x, so the CDF
        # is sigmoid(w x + b) == a logistic distribution.
        df = d.DeepFactorized(
            batch_shape=(1,), num_filters=(), init_scale=1.0,
            key=jax.random.PRNGKey(1))
        x = jnp.linspace(-5, 5, 101)[:, None]
        cdf = df.cdf(x)
        # Affine-logit check: logit(cdf) must be affine in x.
        logits = jnp.log(cdf) - jnp.log1p(-cdf)
        diffs = jnp.diff(logits[:, 0])
        np.testing.assert_allclose(diffs, diffs[0], rtol=1e-3)

    def test_noisy_log_prob_finite(self):
        ndf = d.NoisyDeepFactorized(
            batch_shape=(2,), key=jax.random.PRNGKey(2))
        y = jnp.array([[-100.0, 0.0], [0.5, 100.0]])
        lp = ndf.log_prob(y)
        assert np.all(np.isfinite(lp))

    def test_tails_and_offset(self):
        df = d.DeepFactorized(batch_shape=(4,), key=jax.random.PRNGKey(3))
        lo = df._lower_tail(2**-8)
        hi = df._upper_tail(2**-8)
        off = helpers.quantization_offset(df)
        assert np.all(np.asarray(lo) < np.asarray(hi))
        assert np.all(np.abs(np.asarray(off)) <= 0.5)
        # Tail masses roughly as requested.
        np.testing.assert_allclose(df.cdf(lo), 2**-9, atol=2**-10)
        np.testing.assert_allclose(df.survival_function(hi), 2**-9,
                                   atol=2**-10)


class TestRoundAdapters:
    def test_round_adapter_cdf_staircase(self):
        base = d.Normal(loc=0.0, scale=2.0)
        ra = d.RoundAdapter(base)
        # CDF of round(x) at y: P(x <= ceil(y) - .5).
        y = jnp.array([-1.2, -0.5, 0.0, 0.4, 1.9])
        np.testing.assert_allclose(
            ra.cdf(y), base.cdf(jnp.ceil(y) - 0.5), atol=1e-6)

    def test_noisy_rounded_normal_prob(self):
        nrn = d.NoisyRoundedNormal(loc=0.0, scale=2.0)
        # At integer y, prob = P(round(x) == y) exactly.
        base = d.Normal(loc=0.0, scale=2.0)
        y = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
        expected = base.cdf(y + 0.5) - base.cdf(y - 0.5)
        np.testing.assert_allclose(nrn.prob(y), expected, atol=1e-5)

    def test_soft_round_adapter_identity_limit(self):
        base = d.Normal(loc=0.3, scale=1.0)
        sra = d.SoftRoundAdapter(base, alpha=1e-12)
        y = jnp.linspace(-3, 3, 41)
        np.testing.assert_allclose(sra.cdf(y), base.cdf(y), atol=1e-5)

    def test_soft_rounded_tails_ordered(self):
        ns = d.NoisySoftRoundedNormal(loc=0.0, scale=1.0, alpha=5.0)
        lo = helpers.lower_tail(ns, 2**-8)
        hi = helpers.upper_tail(ns, 2**-8)
        assert float(lo) < float(hi)


class TestEstimateTails:
    def test_finds_quantile(self):
        dist = d.Normal(loc=1.0, scale=2.0)
        target = 0.01
        x = helpers.estimate_tails(
            dist.cdf, target, shape=(), dtype=jnp.float32)
        np.testing.assert_allclose(dist.cdf(x), target, atol=1e-4)

    def test_vectorized(self):
        dist = d.Normal(loc=jnp.array([0.0, 5.0, -3.0]), scale=1.0)
        x = helpers.estimate_tails(dist.cdf, 0.5, shape=(3,))
        np.testing.assert_allclose(x, [0.0, 5.0, -3.0], atol=1e-3)

    def test_jittable(self):
        f = jax.jit(lambda: helpers.estimate_tails(
            lambda t: jax.nn.sigmoid(t - 2.0), 0.5, shape=()))
        np.testing.assert_allclose(f(), 2.0, atol=1e-3)
