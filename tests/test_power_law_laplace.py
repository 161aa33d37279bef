"""PowerLaw and Laplace entropy model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from compression_tpu.entropy_models import (
    LaplaceEntropyModel,
    PowerLawEntropyModel,
)


class TestPowerLaw:
    def test_call_and_penalty(self):
        em = PowerLawEntropyModel(coding_rank=1)
        x = jnp.asarray([[0.0, 1.0, -2.0], [5.0, 0.0, 0.0]])
        q, p = em(x)
        np.testing.assert_allclose(np.asarray(q), np.round(np.asarray(x)))
        assert p.shape == (2,)
        assert np.all(np.asarray(p) >= 0)

    def test_penalty_gradient(self):
        em = PowerLawEntropyModel(coding_rank=1)
        g = jax.grad(lambda x: jnp.sum(em.penalty(x)))(jnp.ones((1, 4)))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_roundtrip(self):
        em = PowerLawEntropyModel(coding_rank=2)
        rng = np.random.RandomState(0)
        x = np.round(rng.laplace(0, 3, size=(3, 4, 5))).astype(np.float32)
        strings = em.compress(x)
        assert len(strings) == 3
        decoded = em.decompress(strings, (4, 5))
        np.testing.assert_allclose(np.asarray(decoded), x)


class TestLaplace:
    def test_penalty(self):
        em = LaplaceEntropyModel(coding_rank=1, l1=0.1)
        x = jnp.asarray([[1.0, -2.0, 0.0]])
        np.testing.assert_allclose(np.asarray(em.penalty(x)), [0.3], atol=1e-6)

    def test_roundtrip_modes(self):
        rng = np.random.RandomState(1)
        x = np.round(rng.laplace(0, 2, size=(2, 30))).astype(np.float32)
        for rlc, mc, rlnz in [(-1, 0, False), (0, 1, True), (-1, -1, False)]:
            em = LaplaceEntropyModel(
                coding_rank=1, run_length_code=rlc, magnitude_code=mc,
                use_run_length_for_non_zeros=rlnz)
            strings = em.compress(x)
            decoded = em.decompress(strings, (30,))
            np.testing.assert_allclose(np.asarray(decoded), x)
