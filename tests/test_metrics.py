"""Metrics tests, cross-checked against tf.image where available."""

import numpy as np
import pytest

from compression_tpu.util import metrics


def make_pair(seed=0, size=96):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (1, size, size, 3)).astype(np.float32)
    noise = rng.normal(0, 12, a.shape).astype(np.float32)
    b = np.clip(a + noise, 0, 255)
    return a, b


class TestPSNR:
    def test_identical(self):
        a, _ = make_pair()
        assert float(metrics.psnr(a, a)[0]) > 100

    def test_known_value(self):
        a = np.zeros((1, 8, 8, 3), np.float32)
        b = a + 16.0
        np.testing.assert_allclose(
            np.asarray(metrics.psnr(a, b)), 20 * np.log10(255 / 16),
            rtol=1e-5)


class TestSSIM:
    def test_matches_tensorflow(self):
        tf = pytest.importorskip("tensorflow")
        a, b = make_pair()
        ours = np.asarray(metrics.ssim(a, b))
        theirs = tf.image.ssim(
            tf.constant(a), tf.constant(b), max_val=255.0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-3)

    def test_msssim_matches_tensorflow(self):
        tf = pytest.importorskip("tensorflow")
        a, b = make_pair(size=192)
        ours = np.asarray(metrics.msssim(a, b))
        theirs = tf.image.ssim_multiscale(
            tf.constant(a), tf.constant(b), max_val=255.0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-3)

    def test_ordering(self):
        a, b = make_pair(size=192)
        near = np.asarray(metrics.msssim(a, np.clip(a + 2, 0, 255)))
        far = np.asarray(metrics.msssim(a, b))
        assert near[0] > far[0]
