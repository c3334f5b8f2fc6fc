"""Sobel gradient operator (depthwise, NHWC).

Equivalent to the reference's per-channel Sobel loop
(src/utils/loss_functions.py:76-93), but as a single depthwise convolution —
one fused XLA conv instead of a Python loop over channels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Correlation kernels, exactly as in the reference (loss_functions.py:80-81).
SOBEL_X = jnp.array([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
SOBEL_Y = jnp.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def sobel_gradients(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Sobel Gx, Gy with zero ('SAME') padding.

    Args:
      x: (B, H, W, C)
    Returns:
      (Gx, Gy) each (B, H, W, C).
    """
    c = x.shape[-1]
    dtype = x.dtype
    # Depthwise kernel layout HWIO with feature_group_count=C: (3, 3, 1, C)
    kx = jnp.tile(SOBEL_X.astype(dtype)[:, :, None, None], (1, 1, 1, c))
    ky = jnp.tile(SOBEL_Y.astype(dtype)[:, :, None, None], (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kx.shape, ("NHWC", "HWIO", "NHWC"))
    gx = lax.conv_general_dilated(x, kx, (1, 1), "SAME", dimension_numbers=dn,
                                  feature_group_count=c,
                                  precision=lax.Precision.HIGHEST)
    gy = lax.conv_general_dilated(x, ky, (1, 1), "SAME", dimension_numbers=dn,
                                  feature_group_count=c,
                                  precision=lax.Precision.HIGHEST)
    return gx, gy
