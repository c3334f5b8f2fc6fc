"""Color histogram ops.

`color_histogram` reproduces the reference's exact per-image, per-channel
256-bin histogram (src/utils/loss_functions.py:99-148): floor -> clamp ->
bincount, normalized by H*W. Like the reference's `torch.bincount`, this path
carries **zero gradient** w.r.t. the input (floor's derivative is 0) — it
contributes a penalty value to the loss but no training signal. That quirk is
part of the reference's trained behavior, so it is the default.

`soft_color_histogram` is the differentiable alternative (triangular-kernel
soft binning) offered behind a flag for users who want a real gradient.

Both are fully vectorized over batch and channel (no Python loops over B or C
as in the reference) and safe under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def color_histogram(x: jnp.ndarray, num_bins: int = 256) -> jnp.ndarray:
    """Exact per-image per-channel histogram of an NHWC batch.

    Args:
      x: (B, H, W, C), values nominally in [0, 1] (out-of-range values clamp
        into the first/last bin, matching the reference's clamp).
    Returns:
      (B, C, num_bins) histograms normalized by H*W.
    """
    b, h, w, c = x.shape
    inds = jnp.floor(x * (num_bins - 1))
    inds = jnp.clip(inds, 0, num_bins - 1).astype(jnp.int32)
    # One flat scatter-add: offset each (b, c) histogram into its own range.
    inds = jnp.transpose(inds, (0, 3, 1, 2)).reshape(b * c, h * w)
    offs = (jnp.arange(b * c, dtype=jnp.int32) * num_bins)[:, None]
    flat = (inds + offs).reshape(-1)
    hist = jnp.zeros((b * c * num_bins,), x.dtype).at[flat].add(1.0)
    return hist.reshape(b, c, num_bins) / (h * w)


def soft_color_histogram(x: jnp.ndarray, num_bins: int = 256) -> jnp.ndarray:
    """Differentiable soft histogram (linear / triangular binning).

    Each pixel splits its unit mass linearly between the two neighboring bin
    centers, so the histogram is piecewise-linear in pixel values and carries
    a real gradient — unlike the reference's bincount path. Implemented as a
    single scatter-add with differentiable fractional weights (no HWxbins
    blow-up).

    Returns: (B, C, num_bins) normalized histograms.
    """
    b, h, w, c = x.shape
    v = jnp.clip(x * (num_bins - 1), 0.0, num_bins - 1.0)
    v = jnp.transpose(v, (0, 3, 1, 2)).reshape(b * c, h * w)
    i0 = jnp.floor(v)
    frac = v - i0  # gradient flows through frac
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, num_bins - 1)
    offs = (jnp.arange(b * c, dtype=jnp.int32) * num_bins)[:, None]
    hist = jnp.zeros((b * c * num_bins,), x.dtype)
    hist = hist.at[(i0 + offs).reshape(-1)].add((1.0 - frac).reshape(-1))
    hist = hist.at[(i1 + offs).reshape(-1)].add(frac.reshape(-1))
    return hist.reshape(b, c, num_bins) / (h * w)
