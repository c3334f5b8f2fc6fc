"""Backward warping / grid-sample ops (TPU-native, NHWC).

Functional equivalents of `torch.nn.functional.grid_sample` with
``align_corners=True`` and ``padding_mode='zeros'`` — the exact semantics the
reference model relies on for flow-based backward warping
(reference: src/models/ema_vfi.py:149-170, src/utils/loss_functions.py:150-178).

Design notes (TPU):
- Channels-last (NHWC). The sampling itself is a 4-tap gather + weighted sum:
  pure VPU work; XLA lowers the flattened `take` to a TPU gather. The heavy
  FLOPs of the surrounding model live in convs (MXU), so the gather is not the
  bottleneck at typical resolutions; a fused Pallas kernel lives in
  `warp_pallas.py` for the hot inference path.
- Fully differentiable w.r.t. both `image` and `flow` (the bilinear weights
  are linear in the fractional coordinates; JAX autodiff produces the same
  gradients torch's grid_sampler backward computes).
- No data-dependent shapes: everything is static-shape gather/where, safe
  under `jit`/`pjit`/`shard_map`.

Known divergence: at a degenerate 1-pixel extent (H==1 or W==1),
grid_sample's align_corners normalization (the reference divides by
``max(dim-1, 1)``, ema_vfi.py:165-166) collapses — any flow component in
[0, 1] maps back to pixel 0 and samples in-bounds — whereas this
pixel-space implementation treats the fractional coordinate as partially
out-of-bounds (zero-padded tap). Real frames never have 1-pixel extents;
parity at extents >= 2 is tested exhaustively (tests/test_warp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(image: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels ``image[yi, xi]`` (single image, NHWC without batch).

    Args:
      image: (H, W, C)
      yi, xi: integer index arrays of shape (Ho, Wo), assumed in-bounds.
    Returns:
      (Ho, Wo, C)
    """
    h, w, c = image.shape
    flat = image.reshape(h * w, c)
    idx = yi * w + xi
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape(idx.shape + (c,))


def bilinear_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample a single image at absolute pixel coordinates.

    torch.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True) semantics: each of the four corner taps contributes 0
    when that corner lies outside the image.

    Args:
      image: (H, W, C)
      ys, xs: float sample coordinates, shape (Ho, Wo) (y=row, x=col).
    Returns:
      (Ho, Wo, C) sampled values.
    """
    h, w, _ = image.shape
    dtype = image.dtype

    # Coordinate math in f32: bf16 coordinates round whole pixels at
    # positions > 256 (8-bit mantissa).
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = (xs - x0f).astype(dtype)
    wy1 = (ys - y0f).astype(dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def inb(yi, xi):
        return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(dtype)[..., None]

    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    v00 = _gather_hw(image, y0c, x0c) * inb(y0, x0)
    v01 = _gather_hw(image, y0c, x1c) * inb(y0, x1)
    v10 = _gather_hw(image, y1c, x0c) * inb(y1, x0)
    v11 = _gather_hw(image, y1c, x1c) * inb(y1, x1)

    w00 = (wy0 * wx0)[..., None]
    w01 = (wy0 * wx1)[..., None]
    w10 = (wy1 * wx0)[..., None]
    w11 = (wy1 * wx1)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def nearest_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample at absolute pixel coords, zeros padding.

    torch's grid_sampler nearest mode rounds with round-half-to-even
    (std::nearbyint); `jnp.round` matches.
    """
    h, w, _ = image.shape
    dtype = image.dtype
    xi = jnp.round(xs.astype(jnp.float32)).astype(jnp.int32)
    yi = jnp.round(ys.astype(jnp.float32)).astype(jnp.int32)
    valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(dtype)[..., None]
    v = _gather_hw(image, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1))
    return v * valid


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """`F.grid_sample(align_corners=True, padding_mode='zeros')` equivalent.

    Args:
      image: (B, H, W, C) NHWC input.
      grid: (B, Ho, Wo, 2) normalized sampling grid in [-1, 1], last dim is
        (x, y) like torch.
      mode: 'bilinear' or 'nearest'.
    Returns:
      (B, Ho, Wo, C)
    """
    _, h, w, _ = image.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    # align_corners=True un-normalization: -1 -> 0, +1 -> size-1.
    xs = (gx + 1.0) * 0.5 * (w - 1)
    ys = (gy + 1.0) * 0.5 * (h - 1)
    sample = bilinear_sample if mode == "bilinear" else nearest_sample
    return jax.vmap(sample)(image, ys, xs)


def warp(image: jnp.ndarray, flow: jnp.ndarray, mode: str = "bilinear") -> jnp.ndarray:
    """Backward-warp `image` by a dense `flow` field (pixel units).

    Equivalent to the reference's mesh-grid + normalize + grid_sample chain
    (src/models/ema_vfi.py:149-170): output(y, x) = image(y + dy, x + dx)
    sampled bilinearly with zeros padding. The normalize→denormalize round
    trip under align_corners=True is the identity, so we sample directly at
    pixel coordinates.

    Args:
      image: (B, H, W, C)
      flow: (B, H, W, 2), channels (dx, dy) — matching the reference where
        flow channel 0 displaces x and channel 1 displaces y.
      mode: 'bilinear' (model warp) or 'nearest' (loss-side warp,
        loss_functions.py:177).
    Returns:
      (B, H, W, C) warped image.
    """
    b, h, w, _ = image.shape
    # f32 grid: bf16 cannot represent integer coordinates > 256.
    ygrid = jnp.arange(h, dtype=jnp.float32)[:, None]
    xgrid = jnp.arange(w, dtype=jnp.float32)[None, :]
    xs = xgrid + flow[..., 0].astype(jnp.float32)
    ys = ygrid + flow[..., 1].astype(jnp.float32)
    sample = bilinear_sample if mode == "bilinear" else nearest_sample
    return jax.vmap(sample)(image, ys, xs)
