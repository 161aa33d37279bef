"""Universal quantization EM tests (reference universal_test.py spec:
round-trips with shared dither, information bounds)."""

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu import distributions as d
from compression_tpu.entropy_models.universal import (
    UniversalBatchedEntropyModel,
    UniversalIndexedEntropyModel,
)


class TestUniversalBatched:
    def test_call_training(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = UniversalBatchedEntropyModel(prior, coding_rank=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 20))
        xp, bits = em(x, training=True, key=jax.random.PRNGKey(1))
        assert xp.shape == x.shape
        assert np.all(np.asarray(bits) > 0)

    def test_roundtrip_shared_dither(self):
        prior = d.NoisyNormal(loc=0.0, scale=jnp.asarray([0.5, 1.0, 2.0]))
        em = UniversalBatchedEntropyModel(
            prior, coding_rank=2, compression=True)
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 10, 3))
        buf, lengths = em.compress(x)
        decoded = em.decompress(buf, (10,), lengths=lengths)
        # Decoder reconstructs exactly the encoder's dithered quantization.
        xp, _ = em(x, training=False)
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(xp), atol=1e-5)

    def test_dither_deterministic(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = UniversalBatchedEntropyModel(
            prior, coding_rank=1, compression=True)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 50))
        s1 = em.compress_to_strings(x)
        s2 = em.compress_to_strings(x)
        assert s1 == s2

    def test_information_bound(self):
        prior = d.NoisyNormal(loc=0.0, scale=1.0)
        em = UniversalBatchedEntropyModel(
            prior, coding_rank=1, compression=True)
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 300))
        _, bits = em(x, training=False)
        strings = em.compress_to_strings(x)
        total_bits = sum(8 * len(s) for s in strings)
        bound = float(np.sum(np.asarray(bits)))
        assert bound <= total_bits <= bound * 1.1 + 8 * 32


class TestUniversalIndexed:
    def make_em(self, **kwargs):
        return UniversalIndexedEntropyModel(
            prior_fn=d.NoisyNormal,
            index_ranges=(8,),
            parameter_fns=dict(
                loc=lambda _: 0.0,
                scale=lambda i: jnp.exp(-1.0 + 0.5 * i[..., 0])),
            coding_rank=1, **kwargs)

    def test_call_training(self):
        em = self.make_em()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 30))
        idx = jax.random.randint(
            jax.random.PRNGKey(1), (2, 30, 1), 0, 8).astype(jnp.float32)
        xp, bits = em(x, idx, training=True, key=jax.random.PRNGKey(2))
        assert xp.shape == x.shape
        assert np.all(np.isfinite(np.asarray(bits)))

    def test_roundtrip(self):
        em = self.make_em(compression=True)
        rng = np.random.RandomState(5)
        idx = rng.randint(0, 8, size=(3, 40, 1)).astype(np.float32)
        x = rng.normal(0, 1.5, size=(3, 40)).astype(np.float32)
        buf, lengths = em.compress(x, idx)
        decoded = em.decompress(buf, idx, lengths=lengths)
        xp, _ = em(jnp.asarray(x), jnp.asarray(idx), training=False)
        np.testing.assert_allclose(
            np.asarray(decoded), np.asarray(xp), atol=1e-5)
