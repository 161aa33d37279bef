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


class TestPhiloxParity:
    """The dither stream must be bit-exact with tf.random.stateless_uniform
    (reference universal.py:34-40) so both implementations pick the same
    dither levels.  Goldens below were captured from the in-image TF 2.21;
    tests/golden/fuzz_parity.py re-verifies against live TF."""

    def test_dither_seed_goldens(self):
        from compression_tpu.util import philox
        got = philox.stateless_uniform_int32((24,), (1234, 1234), 0, 15)
        np.testing.assert_array_equal(
            got, [5, 13, 11, 12, 1, 7, 1, 7, 1, 4, 1, 2, 2, 8, 11, 8,
                  11, 11, 5, 1, 5, 2, 12, 14])
        got = philox.stateless_uniform_int32((24,), (1234, 1234), 0, 5)
        np.testing.assert_array_equal(
            got, [0, 3, 1, 2, 1, 2, 1, 2, 1, 4, 1, 2, 2, 3, 1, 3,
                  1, 1, 0, 1, 0, 2, 2, 4])
        got = philox.stateless_uniform_int32((10,), (77, -3), -4, 11)
        np.testing.assert_array_equal(
            got, [8, -4, 1, 0, 3, -3, 4, -3, 3, 2])

    def test_shape_invariance(self):
        # Same stream regardless of how the count is shaped (row-major).
        from compression_tpu.util import philox
        a = philox.stateless_uniform_int32((30,), (1234, 1234), 0, 15)
        b = philox.stateless_uniform_int32((5, 6), (1234, 1234), 0, 15)
        np.testing.assert_array_equal(a.reshape(5, 6), b)

    def test_em_uses_philox_stream(self):
        from compression_tpu.entropy_models import universal
        from compression_tpu.util import philox
        got = universal._offset_indexes((3, 7), 15)
        np.testing.assert_array_equal(
            np.asarray(got),
            philox.stateless_uniform_int32((3, 7), (1234, 1234), 0, 15))
