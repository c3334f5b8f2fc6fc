"""Bilinear image resize matching `torch.nn.functional.interpolate`.

The reference resizes loss inputs to 224x224 with
`F.interpolate(mode='bilinear', align_corners=False)` and no antialiasing
(src/utils/loss_functions.py:55-56). `jax.image.resize` antialiases on
downscale, so we implement the exact non-antialiased semantics with an
edge-clamped 4-tap bilinear gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _source_coords(out_size: int, in_size: int, align_corners: bool, dtype) -> jnp.ndarray:
    i = jnp.arange(out_size, dtype=dtype)
    if align_corners:
        if out_size == 1:
            return jnp.zeros((out_size,), dtype)
        scale = (in_size - 1) / (out_size - 1)
        return i * scale
    scale = in_size / out_size
    # half-pixel centers; torch clamps negatives to 0 before interpolation
    src = (i + 0.5) * scale - 0.5
    return jnp.maximum(src, 0.0)


def resize_bilinear(
    image: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC images to `size` = (H', W') with torch bilinear semantics.

    Separable two-pass implementation: each pass is a small dense matmul
    (out_size x in_size interpolation matrix), which XLA maps onto the MXU —
    much friendlier than per-pixel gathers for the all-pairs resize pattern.
    """
    b, h, w, c = image.shape
    oh, ow = size
    dtype = image.dtype

    def interp_matrix(out_size: int, in_size: int) -> jnp.ndarray:
        src = _source_coords(out_size, in_size, align_corners, jnp.float32)
        i0 = jnp.floor(src).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, in_size - 1)
        i1 = jnp.clip(i0 + 1, 0, in_size - 1)
        w1 = src - i0.astype(jnp.float32)
        w0 = 1.0 - w1
        m = jnp.zeros((out_size, in_size), jnp.float32)
        rows = jnp.arange(out_size)
        m = m.at[rows, i0].add(w0)
        m = m.at[rows, i1].add(w1)
        return m.astype(dtype)

    mh = interp_matrix(oh, h)  # (oh, h)
    mw = interp_matrix(ow, w)  # (ow, w)
    # (b,h,w,c) -> rows: contract h
    out = jnp.einsum("oh,bhwc->bowc", mh, image,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,bowc->bopc", mw, out,
                     precision=jax.lax.Precision.HIGHEST)
    return out
