"""ContinuousIndexedEntropyModel tests (reference continuous_indexed_test.py):
index clipping, compression round-trips, bounds, loc/scale special case."""

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu import distributions as d
from compression_tpu.entropy_models.continuous_indexed import (
    ContinuousIndexedEntropyModel,
    LocationScaleIndexedEntropyModel,
)


def scale_table_em(num_scales=16, coding_rank=1, **kwargs):
    scale_fn = lambda i: jnp.exp(
        jnp.log(0.11) + i / (num_scales - 1) *
        (jnp.log(64.0) - jnp.log(0.11)))
    return LocationScaleIndexedEntropyModel(
        prior_fn=d.NoisyNormal, num_scales=num_scales, scale_fn=scale_fn,
        coding_rank=coding_rank, **kwargs)


class TestIndexedCall:
    def test_bits_and_noise(self):
        em = ContinuousIndexedEntropyModel(
            prior_fn=d.NoisyNormal,
            index_ranges=(8,),
            parameter_fns=dict(
                loc=lambda _: 0.0,
                scale=lambda i: jnp.exp(-1.0 + i[..., 0] * 0.5)),
            coding_rank=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 20))
        idx = jax.random.randint(jax.random.PRNGKey(1), (4, 20, 1), 0, 8)
        xp, bits = em(x, idx, training=True, key=jax.random.PRNGKey(2))
        assert xp.shape == x.shape
        assert bits.shape == (4,)
        assert np.all(np.asarray(bits) > 0)

    def test_index_clipping(self):
        em = ContinuousIndexedEntropyModel(
            prior_fn=d.NoisyNormal,
            index_ranges=(4,),
            parameter_fns=dict(
                loc=lambda _: 0.0, scale=lambda i: 1.0 + i[..., 0]),
            coding_rank=1)
        idx = jnp.asarray([[-3.0], [0.0], [2.0], [9.0]])[..., None]
        norm = em._normalize_indexes(idx)
        np.testing.assert_allclose(
            np.asarray(norm).ravel(), [0.0, 0.0, 2.0, 3.0])

    def test_gradients_flow_through_indexes(self):
        em = ContinuousIndexedEntropyModel(
            prior_fn=d.NoisyNormal,
            index_ranges=(8,),
            parameter_fns=dict(
                loc=lambda _: 0.0,
                scale=lambda i: jnp.exp(-2.0 + i[..., 0] * 0.5)),
            coding_rank=1, expected_grads=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10))

        def loss(idx):
            _, bits = em(x, idx, training=True, key=jax.random.PRNGKey(1))
            return jnp.sum(bits)

        idx = 3.0 * jnp.ones((2, 10, 1))
        g = jax.grad(loss)(idx)
        assert np.any(np.asarray(g) != 0)
        assert np.all(np.isfinite(np.asarray(g)))


class TestIndexedCompression:
    def test_roundtrip(self):
        em = ContinuousIndexedEntropyModel(
            prior_fn=d.NoisyNormal,
            index_ranges=(10,),
            parameter_fns=dict(
                loc=lambda i: i[..., 0] / 4.0,
                scale=lambda i: jnp.exp(-1.0 + i[..., 0] * 0.4)),
            coding_rank=1, compression=True)
        rng = np.random.RandomState(0)
        idx = rng.randint(0, 10, size=(4, 60, 1)).astype(np.float32)
        x = rng.normal(0, 2, size=(4, 60)).astype(np.float32)
        buf, lengths = em.compress(x, idx)
        decoded = em.decompress(buf, idx, lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(decoded), np.round(x), atol=1e-5)

    def test_information_bound(self):
        em = scale_table_em(compression=True)
        rng = np.random.RandomState(1)
        idx = rng.randint(0, 16, size=(8, 300)).astype(np.float32)
        scales = np.asarray(jnp.exp(
            jnp.log(0.11) + idx / 15 * (jnp.log(64.0) - jnp.log(0.11))))
        x = (rng.normal(size=(8, 300)) * scales).astype(np.float32)
        _, bits = em(x, idx, training=False)
        strings = em.compress_to_strings(x, idx)
        total_bits = sum(8 * len(s) for s in strings)
        bound = float(np.sum(np.asarray(bits)))
        assert bound <= total_bits <= bound * 1.08 + 8 * 32

    def test_multi_channel_indexes(self):
        em = ContinuousIndexedEntropyModel(
            prior_fn=d.NoisyLogistic,
            index_ranges=(5, 3),
            parameter_fns=dict(
                loc=lambda i: (i[..., 0] - 2.0) / 2.0,
                scale=lambda i: jnp.exp(-1.0 + i[..., 1] * 0.6)),
            coding_rank=2, channel_axis=-1, compression=True)
        rng = np.random.RandomState(2)
        idx = np.stack([
            rng.randint(0, 5, size=(3, 6, 8)),
            rng.randint(0, 3, size=(3, 6, 8))], axis=-1).astype(np.float32)
        x = rng.normal(0, 1.5, size=(3, 6, 8)).astype(np.float32)
        buf, lengths = em.compress(x, idx)
        assert lengths.shape == (3,)
        decoded = em.decompress(buf, idx, lengths=lengths)
        np.testing.assert_allclose(np.asarray(decoded), np.round(x), atol=1e-5)


class TestLocationScale:
    def test_roundtrip_with_loc(self):
        em = scale_table_em(compression=True)
        rng = np.random.RandomState(3)
        idx = rng.randint(0, 16, size=(4, 50)).astype(np.float32)
        loc = rng.normal(0, 3, size=(4, 50)).astype(np.float32)
        x = (loc + rng.normal(size=(4, 50))).astype(np.float32)
        buf, lengths = em.compress(x, idx, loc=loc)
        decoded = em.decompress(buf, idx, loc=loc, lengths=lengths)
        np.testing.assert_allclose(
            np.asarray(decoded), np.round(x - loc) + loc, atol=1e-5)

    def test_call_with_loc(self):
        em = scale_table_em()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 30))
        idx = jnp.full((2, 30), 8.0)
        loc = 0.3 * jnp.ones((2, 30))
        xp, bits = em(x, idx, loc=loc, training=False)
        # Quantized modulo loc.
        np.testing.assert_allclose(
            np.asarray(xp - loc), np.round(np.asarray(xp - loc)), atol=1e-5)


class TestIndexedDeviceCompress:
    def test_traced_compress_matches_host(self):
        import jax
        from compression_tpu.codec import jax_coder
        em = ContinuousIndexedEntropyModel(
            prior_fn=d.NoisyNormal,
            index_ranges=(8,),
            parameter_fns=dict(
                loc=lambda _: 0.0,
                scale=lambda i: jnp.exp(-1.0 + 0.5 * i[..., 0])),
            coding_rank=1, channel_axis=-1, compression=True)
        rng = np.random.RandomState(7)
        idx = rng.randint(0, 8, size=(4, 30, 1)).astype(np.float32)
        x = rng.normal(0, 2.0, size=(4, 30)).astype(np.float32)
        buf_d, len_d, ok = jax.jit(em.compress_device)(x, idx)
        assert bool(ok)
        got = jax_coder.to_bytes_list(
            np.asarray(buf_d).reshape(4, -1), np.asarray(len_d).reshape(-1))
        expected = em.compress_to_strings(x, idx)
        assert got == expected

    def test_traced_roundtrip_location_scale(self):
        import jax
        from compression_tpu.codec import jax_coder
        em = LocationScaleIndexedEntropyModel(
            prior_fn=d.NoisyNormal, num_scales=16,
            scale_fn=lambda i: jnp.exp(-2.0 + 0.3 * i),
            coding_rank=1, compression=True)
        rng = np.random.RandomState(8)
        idx = rng.randint(0, 16, size=(3, 25)).astype(np.float32)
        loc = rng.normal(0, 0.5, size=(3, 25)).astype(np.float32)
        x = rng.normal(0, 1.0, size=(3, 25)).astype(np.float32) + loc
        buf_d, len_d, ok = jax.jit(em.compress_device)(x, idx, loc)
        assert bool(ok)
        src16 = jnp.asarray(jax_coder.bytes_to_chunks(
            np.asarray(buf_d), np.asarray(len_d)))
        out, sanity = jax.jit(
            lambda s, l, i, lo: em.decompress_device(s, l, i, lo))(
                src16, jnp.asarray(len_d), jnp.asarray(idx), jnp.asarray(loc))
        assert np.asarray(sanity).all()
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(em.quantize(x, loc)), atol=1e-5)
