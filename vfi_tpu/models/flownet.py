"""SimpleFlowNet — a compact coarse-to-fine optical-flow estimator.

The reference's temporal-consistency loss requires an external flow
estimator that does not exist in its repo (`src.models.sepconv_enhanced` —
reference train.py:72-80 silently disables the loss). This module provides a
working TPU-native estimator so the 5th loss term is actually trainable:
a 3-level pyramid; each level warps frame2 by the upsampled coarse flow
(bounded warp — pyramid residuals are small by construction) and predicts a
residual flow from the concatenated frames.

Output matches the loss-side warp convention: (B, H, W, 2) flow with
channels (dx, dy) in pixels (reference loss_functions.py:150-178).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from vfi_tpu.models.layers import ConvBlock
from vfi_tpu.ops.resize import resize_bilinear
from vfi_tpu.ops.warp import warp


class _LevelNet(nn.Module):
    mid: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBlock(self.mid, dtype=self.dtype, name="c1")(x)
        x = ConvBlock(self.mid, dtype=self.dtype, name="c2")(x)
        return ConvBlock(2, act=False, dtype=self.dtype, name="flow")(x)


class SimpleFlowNet(nn.Module):
    """3-level pyramid flow estimator: `apply(params, f0, f1) -> flow` such
    that warp(f1, flow) ~ f0. Frames NHWC in any consistent range."""

    mid_channels: int = 32
    levels: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, frame0: jnp.ndarray, frame1: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = frame0.shape
        compute = self.dtype or frame0.dtype
        f0 = frame0.astype(compute)
        f1 = frame1.astype(compute)

        # build pyramids coarse->fine
        sizes = [(h >> k, w >> k) for k in range(self.levels - 1, -1, -1)]
        flow = None
        for lvl, (lh, lw) in enumerate(sizes):
            p0 = resize_bilinear(f0, (lh, lw)) if (lh, lw) != (h, w) else f0
            p1 = resize_bilinear(f1, (lh, lw)) if (lh, lw) != (h, w) else f1
            if flow is None:
                flow = jnp.zeros((b, lh, lw, 2), compute)
            else:
                scale_h = lh / flow.shape[1]
                flow = resize_bilinear(flow, (lh, lw)) * scale_h
            p1w = warp(p1, flow)
            residual = _LevelNet(self.mid_channels, dtype=self.dtype,
                                 name=f"level{lvl}")(
                jnp.concatenate([p0, p1w, flow], axis=-1))
            flow = flow + residual
        return flow.astype(jnp.promote_types(frame0.dtype, jnp.float32))
