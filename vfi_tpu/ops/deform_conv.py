"""Modulated deformable convolution (DCNv2) — TPU-native, NHWC.

Functional equivalent of `torchvision.ops.deform_conv2d` (the one hard
C++/CUDA kernel the reference depends on, src/models/ema_vfi.py:45-60),
re-designed for TPU rather than translated:

- The CUDA kernel does per-output-pixel fractional gathers then a small
  per-pixel matmul. Here each of the k*k taps becomes (a) one dense bilinear
  sample of the full feature map — VPU gather work shared across all output
  channels — and (b) one large (B*H*W, Cin) x (Cin, Cout) matmul that XLA
  tiles onto the MXU. The tap loop is a static Python unroll (k*k = 9), so
  the whole op is 9 gathers + 9 matmuls fused by XLA, with no im2col buffer
  of shape (..., k*k*Cin) ever materialized.
- Offset/mask tensor layouts follow torchvision exactly so converted
  checkpoints and the reference's quirky chunk/concat offset packing
  (ema_vfi.py:57-58) behave identically:
    offset: (B, Ho, Wo, 2*og*kh*kw), channel ((g*kh+i)*kw+j)*2+0 = dy,
            ...+1 = dx  (y first, like torchvision).
    mask:   (B, Ho, Wo, og*kh*kw).
- Differentiable w.r.t. input, offset, mask, weight, bias via JAX autodiff
  (bilinear taps are linear in the corner pixels and piecewise-linear in the
  offsets, matching the CUDA backward).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 1,
    dilation: int | Tuple[int, int] = 1,
) -> jnp.ndarray:
    """Modulated deformable 2D convolution (DCNv2), NHWC.

    Args:
      x: (B, H, W, Cin) input features.
      offset: (B, Ho, Wo, 2*og*kh*kw) learned offsets, torchvision layout
        (dy, dx interleaved per tap; offset groups og inferred).
      mask: (B, Ho, Wo, og*kh*kw) modulation mask (already sigmoid'ed), or
        None for DCNv1 behavior (mask == 1).
      weight: (kh, kw, Cin // groups, Cout) HWIO kernel. Weight groups are
        inferred as Cin // weight.shape[2].
      bias: (Cout,) or None.
      stride, padding, dilation: int or (h, w) pairs.

    Returns:
      (B, Ho, Wo, Cout) where Ho = (H + 2*ph - dh*(kh-1) - 1)//sh + 1.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    groups = cin // cin_g
    ho = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    wo = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    n_taps = kh * kw
    og = offset.shape[-1] // (2 * n_taps)
    cin_og = cin // og

    if offset.shape[1:3] != (ho, wo):
        raise ValueError(f"offset spatial shape {offset.shape[1:3]} != ({ho}, {wo})")

    dtype = x.dtype
    # Base sampling positions of each output pixel (top-left tap anchor).
    ybase = (jnp.arange(ho, dtype=dtype) * sh - ph)[:, None]  # (Ho, 1)
    xbase = (jnp.arange(wo, dtype=dtype) * sw - pw)[None, :]  # (1, Wo)

    # offset -> (B, Ho, Wo, og, taps, 2)
    off = offset.reshape(b, ho, wo, og, n_taps, 2)
    if mask is not None:
        msk = mask.reshape(b, ho, wo, og, n_taps)

    x0f = jnp.floor  # alias

    out = jnp.zeros((b, ho, wo, cout), dtype)
    w_taps = weight.reshape(kh, kw, cin_g, cout)

    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            dy = off[..., :, t, 0]  # (B, Ho, Wo, og)
            dx = off[..., :, t, 1]
            ys = ybase + i * dh + dy.transpose(3, 0, 1, 2)  # (og, B, Ho, Wo)
            xs = xbase + j * dw + dx.transpose(3, 0, 1, 2)

            # Bilinear sample with zeros padding, vectorized over (og, B).
            y0 = x0f(ys)
            x0 = x0f(xs)
            wy1 = ys - y0
            wx1 = xs - x0
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)

            sampled_og = []
            for g in range(og):
                xg = x[..., g * cin_og:(g + 1) * cin_og]  # (B, H, W, cin_og)
                xg_flat = xg.reshape(b, h * w, cin_og)
                acc = None
                for ddy, wy in ((0, 1.0 - wy1[g]), (1, wy1[g])):
                    for ddx, wx in ((0, 1.0 - wx1[g]), (1, wx1[g])):
                        yi = y0i[g] + ddy
                        xi = x0i[g] + ddx
                        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
                        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                        v = jnp.take_along_axis(
                            xg_flat, idx.reshape(b, ho * wo, 1), axis=1
                        ).reshape(b, ho, wo, cin_og)
                        wgt = (wy * wx * valid.astype(dtype))[..., None]
                        acc = v * wgt if acc is None else acc + v * wgt
                if mask is not None:
                    acc = acc * msk[..., g, t][..., None]
                sampled_og.append(acc)
            sampled = jnp.concatenate(sampled_og, axis=-1) if og > 1 else sampled_og[0]
            # (B, Ho, Wo, Cin) x tap-weight (Cin/groups, Cout) -> MXU matmul.
            if groups == 1:
                out = out + jnp.einsum(
                    "bhwc,co->bhwo", sampled, w_taps[i, j],
                    preferred_element_type=dtype,
                )
            else:
                cout_g = cout // groups
                parts = []
                for g in range(groups):
                    sg = sampled[..., g * cin_g:(g + 1) * cin_g]
                    wg = w_taps[i, j][:, g * cout_g:(g + 1) * cout_g]
                    parts.append(jnp.einsum("bhwc,co->bhwo", sg, wg,
                                            preferred_element_type=dtype))
                out = out + jnp.concatenate(parts, axis=-1)

    if bias is not None:
        out = out + bias.astype(dtype)
    return out
