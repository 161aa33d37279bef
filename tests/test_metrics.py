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


class TestFidKid:
    """FID/KID machinery (the reference's HiFiC evaluation columns,
    models/hific/data.csv)."""

    def test_fid_matches_analytic_gaussian(self):
        # FID(N(0,I), N(m,I)) = ||m||^2.
        rng = np.random.RandomState(0)
        d = 8
        a = rng.normal(0, 1, (5000, d))
        b = rng.normal(0, 1, (5000, d)) + 2.0
        fid = float(metrics.fid_from_features(a, b))
        assert abs(fid - 4 * d) < 1.5

    def test_fid_zero_for_identical(self):
        rng = np.random.RandomState(1)
        a = rng.normal(0, 1, (2000, 6))
        assert float(metrics.fid_from_features(a, a)) < 1e-2

    def test_frechet_distance_closed_form(self):
        # Diagonal covariances: sum (mu diff)^2 + sum (sqrt(s1)-sqrt(s2))^2.
        mu1 = np.array([0.0, 1.0])
        mu2 = np.array([1.0, 1.0])
        c1 = np.diag([1.0, 4.0])
        c2 = np.diag([9.0, 1.0])
        expected = 1.0 + (1 - 3) ** 2 + (2 - 1) ** 2
        got = float(metrics.frechet_distance(mu1, c1, mu2, c2))
        assert abs(got - expected) < 1e-4

    def test_kid_unbiased_near_zero_same_distribution(self):
        rng = np.random.RandomState(2)
        a = rng.normal(0, 1, (3000, 10))
        b = rng.normal(0, 1, (3000, 10))
        kid = float(metrics.kid_from_features(a, b, block_size=500))
        assert abs(kid) < 0.5

    def test_kid_positive_for_shifted(self):
        rng = np.random.RandomState(3)
        a = rng.normal(0, 1, (2000, 10))
        b = rng.normal(0, 1, (2000, 10)) + 1.0
        assert float(metrics.kid_from_features(a, b, block_size=500)) > 1.0

    def test_image_feature_pipeline(self):
        from compression_tpu.models import lpips as lpips_lib
        params = lpips_lib.random_lpips_weights(seed=0)
        rng = np.random.RandomState(4)
        imgs = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.float32)
        feats = metrics.image_perceptual_features(params, imgs)
        assert feats.shape[0] == 4 and feats.ndim == 2
        assert np.all(np.isfinite(np.asarray(feats)))
