"""Image quality metrics: PSNR, SSIM, MS-SSIM.

The reference evaluates codecs with tf.image.psnr / ssim_multiscale
(models/bls2017.py:290-306); these are the JAX counterparts, matching the
standard formulations (Wang et al. 2003 for MS-SSIM with the usual
power-factor weights and 2x average-pool downsampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "msssim", "frechet_distance",
           "fid_from_features", "kid_from_features",
           "image_perceptual_features"]

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, max_val=255.0):
    """Peak signal-to-noise ratio over the trailing [H, W, C] dims."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean(jnp.square(a - b), axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _fspecial_gauss(size, sigma):
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2(img, kernel):
    """Depthwise valid convolution with a 2-D kernel; img NHWC."""
    c = img.shape[-1]
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(
        img.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, feature_group_count=c)


def _ssim_components(a, b, max_val, filter_size=11, filter_sigma=1.5,
                     k1=0.01, k2=0.03):
    kernel = _fspecial_gauss(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_a = _filter2(a, kernel)
    mu_b = _filter2(b, kernel)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sigma_aa = _filter2(a * a, kernel) - mu_aa
    sigma_bb = _filter2(b * b, kernel) - mu_bb
    sigma_ab = _filter2(a * b, kernel) - mu_ab
    luminance = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    contrast_structure = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    return luminance, contrast_structure


def ssim(a, b, max_val=255.0, **kwargs):
    """Mean structural similarity over NHWC batches."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    luminance, cs = _ssim_components(a, b, max_val, **kwargs)
    return jnp.mean(luminance * cs, axis=(1, 2, 3))


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def msssim(a, b, max_val=255.0, weights=_MSSSIM_WEIGHTS, **kwargs):
    """Multi-scale SSIM (Wang et al. 2003)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    levels = len(weights)
    mcs = []
    luminance = None
    for i in range(levels):
        luminance, cs = _ssim_components(a, b, max_val, **kwargs)
        mcs.append(jnp.maximum(jnp.mean(cs, axis=(1, 2, 3)), 0.0))
        if i < levels - 1:
            a = _avg_pool2(a)
            b = _avg_pool2(b)
    lum = jnp.maximum(jnp.mean(luminance, axis=(1, 2, 3)), 0.0)
    weights = jnp.asarray(weights)
    result = jnp.prod(
        jnp.stack(mcs[:-1], 0) ** weights[:-1, None], axis=0)
    return result * (mcs[-1] * lum) ** weights[-1]


# --- distribution-level perceptual metrics (HiFiC evaluation columns,
# reference models/hific/data.csv: FID/KID) --------------------------------

def _sqrtm_psd(mat, eps=1e-10):
    """Matrix square root of a symmetric PSD matrix via eigh."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, eps)
    return (v * jnp.sqrt(w)) @ v.T


def frechet_distance(mu1, cov1, mu2, cov2):
    """Fréchet distance between two Gaussians:
    ||mu1-mu2||^2 + Tr(C1 + C2 - 2 (C1 C2)^1/2)."""
    mu1, mu2 = jnp.asarray(mu1), jnp.asarray(mu2)
    cov1, cov2 = jnp.asarray(cov1), jnp.asarray(cov2)
    s1 = _sqrtm_psd(cov1)
    # Tr sqrt(C1 C2) = Tr sqrt(s1 C2 s1) (similar PSD matrix).
    inner = s1 @ cov2 @ s1
    w = jnp.maximum(jnp.linalg.eigvalsh(inner), 0.0)
    tr_sqrt = jnp.sum(jnp.sqrt(w))
    return (jnp.sum((mu1 - mu2) ** 2) + jnp.trace(cov1) + jnp.trace(cov2)
            - 2.0 * tr_sqrt)


def fid_from_features(feats_a, feats_b):
    """Fréchet inception-style distance between two feature sets [N, D].

    Feature extractor is the caller's choice (the reference pipeline uses
    Inception pool3; `lpips.vgg16_features` is the in-repo TPU-native
    extractor).  Needs N > D for a well-conditioned covariance.
    """
    a = jnp.asarray(feats_a, jnp.float32)
    b = jnp.asarray(feats_b, jnp.float32)
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = jnp.cov(a, rowvar=False)
    cb = jnp.cov(b, rowvar=False)
    ca = jnp.atleast_2d(ca)
    cb = jnp.atleast_2d(cb)
    return frechet_distance(mu_a, ca, mu_b, cb)


def kid_from_features(feats_a, feats_b, block_size=None, seed=0):
    """Kernel inception-style distance (unbiased MMD^2, cubic kernel
    k(x,y) = (x.y/D + 1)^3, Binkowski et al. 2018), averaged over blocks.
    """
    a = jnp.asarray(feats_a, jnp.float32)
    b = jnp.asarray(feats_b, jnp.float32)
    n = min(a.shape[0], b.shape[0])
    if block_size is None or block_size > n:
        block_size = n
    num_blocks = max(n // block_size, 1)
    d = a.shape[1]

    def poly(x, y):
        return (x @ y.T / d + 1.0) ** 3

    vals = []
    for i in range(num_blocks):
        xa = a[i * block_size:(i + 1) * block_size]
        xb = b[i * block_size:(i + 1) * block_size]
        m = xa.shape[0]
        kxx = poly(xa, xa)
        kyy = poly(xb, xb)
        kxy = poly(xa, xb)
        sum_xx = (jnp.sum(kxx) - jnp.trace(kxx)) / (m * (m - 1))
        sum_yy = (jnp.sum(kyy) - jnp.trace(kyy)) / (m * (m - 1))
        sum_xy = jnp.mean(kxy)
        vals.append(sum_xx + sum_yy - 2 * sum_xy)
    return jnp.mean(jnp.asarray(vals))


def image_perceptual_features(params, images, input_range=(0.0, 255.0)):
    """Pooled VGG16 feature embedding for FID/KID over image batches.

    Uses the TPU-native LPIPS VGG stack (compression_tpu.models.lpips);
    with pretrained weights loaded the embedding matches a standard VGG
    perceptual space, otherwise the deterministic random-feature fallback
    still yields a valid (if weaker) two-sample statistic.
    """
    from compression_tpu.models import lpips as lpips_lib

    x = jnp.asarray(images, jnp.float32)
    lo, hi = input_range
    x = (x - lo) / (hi - lo)
    feats = lpips_lib.vgg16_features(params, x * 2.0 - 1.0)
    pooled = [jnp.mean(f, axis=(1, 2)) for f in feats]
    return jnp.concatenate(pooled, axis=-1)
