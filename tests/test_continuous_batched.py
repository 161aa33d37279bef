"""ContinuousBatchedEntropyModel tests.

Ports the behavioral spec of the reference's continuous_batched_test.py:
round-trip identity, information bounds vs. empirical string lengths,
straight-through gradients, serialization, Dirac edge cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compression_tpu import distributions as d
from compression_tpu.entropy_models import ContinuousBatchedEntropyModel


class TestCall:
    def test_noise_and_bits(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = ContinuousBatchedEntropyModel(prior=prior, coding_rank=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        xp, bits = em(x, training=True, key=jax.random.PRNGKey(1))
        assert xp.shape == x.shape
        assert bits.shape == (8,)
        assert np.all(np.abs(np.asarray(xp - x)) <= 0.5)
        assert np.all(np.asarray(bits) > 0)

    def test_eval_mode_quantizes(self):
        prior = d.NoisyNormal(loc=0.25, scale=1.0)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))
        xp, bits = em(x, training=False)
        # Quantized to offset-shifted integers.
        off = np.asarray(em.quantization_offset)
        np.testing.assert_allclose(
            np.asarray(xp - off), np.round(np.asarray(xp - off)), atol=1e-5)

    def test_expected_grads(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, expected_grads=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 10))

        def loss(x):
            _, bits = em(x, training=True, key=jax.random.PRNGKey(1))
            return jnp.sum(bits)

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_quantize_straight_through(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = ContinuousBatchedEntropyModel(prior=prior, coding_rank=1)
        x = jnp.array([0.1, 0.6, -1.4])
        g = jax.grad(lambda x: jnp.sum(em.quantize(x) * 2.0))(x)
        np.testing.assert_allclose(g, [2.0, 2.0, 2.0])


class TestCompression:
    @pytest.mark.parametrize("scale", [0.1, 1.0, 3.0])
    def test_roundtrip(self, scale):
        prior = d.NoisyNormal(loc=0.0, scale=scale)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)
        x = scale * jax.random.normal(jax.random.PRNGKey(0), (8, 50))
        buf, lengths = em.compress(x)
        decoded = em.decompress(
            buf.reshape(8, -1), (50,), lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(em.quantize(x)), atol=1e-5)

    def test_information_bound(self):
        # Compressed size within [Shannon bound, bound + overhead]
        # (reference continuous_batched_test.py:112-145).
        for scale in [0.5, 1.0, 2.0, 5.0]:
            prior = d.NoisyNormal(loc=0.0, scale=scale)
            em = ContinuousBatchedEntropyModel(
                prior=prior, coding_rank=1, compression=True)
            x = scale * jax.random.normal(jax.random.PRNGKey(1), (16, 400))
            _, bits_eval = em(x, training=False)
            strings = em.compress_to_strings(x)
            total_bits = sum(8 * len(s) for s in strings)
            bound = float(np.sum(np.asarray(bits_eval)))
            assert bound <= total_bits <= bound * 1.05 + 16 * 32, (
                scale, bound, total_bits)

    def test_roundtrip_multi_channel_prior(self):
        prior = d.NoisyNormal(
            loc=jnp.array([0.0, 0.25, -0.25]),
            scale=jnp.array([0.4, 1.0, 2.5]))
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 7, 3))
        buf, lengths = em.compress(x)
        assert lengths.shape == (2,)
        decoded = em.decompress(buf, (5, 7), lengths=lengths)
        assert decoded.shape == x.shape
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(em.quantize(x)), atol=1e-5)

    def test_deep_factorized_roundtrip(self):
        # The minimum end-to-end slice: NoisyDeepFactorized prior -> tables
        # -> compress/decompress (BASELINE.json config #3 shape).
        prior = d.NoisyDeepFactorized(
            batch_shape=(4,), key=jax.random.PRNGKey(3))
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=3, compression=True)
        x = 3.0 * jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 4))
        buf, lengths = em.compress(x)
        decoded = em.decompress(buf, (6, 6), lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(em.quantize(x)), atol=1e-5)

    def test_dirac_prior_tiny_cdfs(self):
        # Nearly deterministic prior: tiny CDF tables, heavy overflow use.
        prior = d.NoisyNormal(loc=0.0, scale=1e-5)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)
        x = jnp.concatenate(
            [jnp.zeros((1, 9)), jnp.full((1, 1), 17.0)], axis=1)
        buf, lengths = em.compress(x)
        decoded = em.decompress(buf, (10,), lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(em.quantize(x)), atol=1e-5)

    def test_compression_consistent_with_quantization(self):
        prior = d.NoisyNormal(loc=0.3, scale=1.0)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)
        x = jax.random.normal(jax.random.PRNGKey(5), (3, 30))
        buf, lengths = em.compress(x)
        decoded = em.decompress(buf, (30,), lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(em.quantize(x)), np.asarray(decoded), atol=1e-5)


class TestSerialization:
    def test_config_weights_roundtrip(self):
        prior = d.NoisyNormal(loc=0.25, scale=1.5)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)
        config = em.get_config()
        weights = em.get_weights()
        em2 = ContinuousBatchedEntropyModel.from_config(config)
        em2.set_weights(weights)
        np.testing.assert_array_equal(em.cdf, em2.cdf)
        np.testing.assert_array_equal(em.cdf_offset, em2.cdf_offset)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 20))
        s1 = em.compress_to_strings(x)
        s2 = em2.compress_to_strings(x)
        assert s1 == s2

    def test_laplace_tail_mass(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, laplace_tail_mass=1e-3)
        x = jnp.array([[0.0, 100.0]])  # far outlier
        _, bits = em(x, training=False)
        assert np.all(np.isfinite(np.asarray(bits)))


class TestDeviceCompress:
    def test_traced_compress_matches_host(self):
        prior = d.NoisyNormal(loc=0.0, scale=jnp.asarray([0.5, 1.5]))
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=2, compression=True)
        x = 1.5 * jax.random.normal(jax.random.PRNGKey(0), (4, 30, 2))

        compress_jit = jax.jit(em.compress_device)
        buf_d, len_d, ok = compress_jit(x)
        assert bool(ok)
        from compression_tpu.codec import jax_coder
        got = jax_coder.to_bytes_list(
            np.asarray(buf_d).reshape(4, -1), np.asarray(len_d).reshape(-1))
        expected = em.compress_to_strings(x)
        assert got == expected

    def test_traced_roundtrip_with_escape(self):
        prior = d.NoisyNormal(loc=0.0, scale=0.5)
        em = ContinuousBatchedEntropyModel(
            prior=prior, coding_rank=1, compression=True)
        # Outliers force escape coding but stay within the gamma budget.
        x = jnp.concatenate(
            [jnp.zeros((2, 18)), jnp.full((2, 2), 40.0)], axis=1)
        buf_d, len_d, ok = jax.jit(em.compress_device)(x)
        assert bool(ok)
        from compression_tpu.codec import jax_coder
        src16 = jnp.asarray(jax_coder.bytes_to_chunks(
            np.asarray(buf_d), np.asarray(len_d)))
        out, sanity = jax.jit(
            lambda s, l: em.decompress_device(s, l, (20,)))(
                src16, jnp.asarray(len_d))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(em.quantize(x)), atol=1e-5)
        assert np.asarray(sanity).all()
