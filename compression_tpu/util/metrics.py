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

__all__ = ["psnr", "ssim", "msssim"]

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
