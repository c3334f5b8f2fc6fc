"""PSNR / SSIM evaluation metrics (jit-safe, NHWC).

The reference never computes any quality metric (its README lists PSNR/SSIM
as future work, README.md:203-220); this module provides the eval harness
the north-star requires. SSIM follows Wang et al. 2004 with the standard
11x11 Gaussian window (sigma 1.5), matching skimage/tf.image conventions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio, averaged over the batch.

    Args:
      pred, target: (B, H, W, C) in [0, max_val].
    Returns: (B,) per-image PSNR in dB.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5, dtype=jnp.float32) -> jnp.ndarray:
    x = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity, mean over valid windows and channels.

    Args:
      pred, target: (B, H, W, C) in [0, max_val].
    Returns: (B,) per-image mean SSIM.
    """
    # f32 throughout: the sigma = E[x^2] - mu^2 cancellation explodes in
    # bf16 (observed SSIM < -1, outside the metric's range)
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    dtype = jnp.float32
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    kern2d = _gaussian_kernel(window_size, sigma, dtype)
    c = pred.shape[-1]
    # Depthwise Gaussian filter, VALID padding (edge windows excluded).
    kern = jnp.tile(kern2d[:, :, None, None], (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(pred.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))

    def filt(x):
        return lax.conv_general_dilated(
            x, kern, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=c, precision=lax.Precision.HIGHEST)

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_pp = jnp.maximum(filt(pred * pred) - mu_pp, 0.0)
    sigma_tt = jnp.maximum(filt(target * target) - mu_tt, 0.0)
    sigma_pt = filt(pred * target) - mu_pt

    num = (2.0 * mu_pt + c1) * (2.0 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
