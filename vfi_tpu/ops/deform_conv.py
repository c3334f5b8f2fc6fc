"""Modulated deformable convolution (DCNv2) — TPU-native, NHWC.

Functional equivalent of `torchvision.ops.deform_conv2d` (the one hard
C++/CUDA kernel the reference depends on, src/models/ema_vfi.py:45-60),
re-designed for TPU rather than translated:

- The CUDA kernel does per-output-pixel fractional gathers then a small
  per-pixel matmul. Here each of the k*k taps becomes (a) ONE dense XLA
  gather that fetches all four bilinear corners at once — indices are
  packed (B, N*4) so the whole tap is a single gather HLO (keeping gather
  count low matters enormously for TPU compile time), and (b) one large
  (B*Ho*Wo, Cin) x (Cin, Cout) matmul that XLA tiles onto the MXU. The tap
  loop is a static Python unroll (k*k = 9), so the op is 9 gathers + 9
  matmuls, with no (..., k*k*Cin) im2col buffer ever materialized.
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
    precision=None,
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
      precision: matmul precision for the tap contractions (None = backend
        default — bf16 passes on TPU MXU; use jax.lax.Precision.HIGHEST for
        strict f32 parity checks).

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
    n = ho * wo
    n_taps = kh * kw
    og = offset.shape[-1] // (2 * n_taps)
    cin_og = cin // og

    if offset.shape[1:3] != (ho, wo):
        raise ValueError(f"offset spatial shape {offset.shape[1:3]} != ({ho}, {wo})")

    dtype = x.dtype
    # Coordinate math is always f32: bf16 cannot represent integers > 256,
    # so bf16 base coordinates would round whole pixels at H/W > 256.
    ybase = (jnp.arange(ho, dtype=jnp.float32) * sh - ph)[:, None]  # (Ho, 1)
    xbase = (jnp.arange(wo, dtype=jnp.float32) * sw - pw)[None, :]  # (1, Wo)

    off = offset.astype(jnp.float32).reshape(b, n, og, n_taps, 2)
    msk = None if mask is None else mask.reshape(b, n, og, n_taps)

    out = jnp.zeros((b, n, cout), dtype)

    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            per_og = []
            for g in range(og):
                dy = off[:, :, g, t, 0]  # (B, N)
                dx = off[:, :, g, t, 1]
                yb = jnp.broadcast_to(ybase + i * dh, (ho, wo)).reshape(1, n)
                xb = jnp.broadcast_to(xbase + j * dw, (ho, wo)).reshape(1, n)
                ys = yb + dy
                xs = xb + dx

                y0f = jnp.floor(ys)
                x0f = jnp.floor(xs)
                wy1 = ys - y0f
                wx1 = xs - x0f
                y0 = y0f.astype(jnp.int32)
                x0 = x0f.astype(jnp.int32)

                # Pack the 4 bilinear corners into ONE gather: indices
                # (B, N, 4) -> (B, N*4). Weights carry the zeros-padding
                # semantics (out-of-bounds corners contribute 0).
                ws, idxs = [], []
                for ddy, wy in ((0, 1.0 - wy1), (1, wy1)):
                    for ddx, wx in ((0, 1.0 - wx1), (1, wx1)):
                        yi = y0 + ddy
                        xi = x0 + ddx
                        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
                        idxs.append(jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
                        ws.append((wy * wx * valid.astype(jnp.float32)).astype(dtype))
                idx4 = jnp.stack(idxs, axis=-1).reshape(b, n * 4, 1)
                wgt4 = jnp.stack(ws, axis=-1)  # (B, N, 4)
                if msk is not None:
                    wgt4 = wgt4 * msk[:, :, g, t][:, :, None]

                xg = x[..., g * cin_og:(g + 1) * cin_og].reshape(b, h * w, cin_og)
                v = jnp.take_along_axis(xg, idx4, axis=1).reshape(b, n, 4, cin_og)
                # corner reduce (VPU): (B, N, 4, C) x (B, N, 4) -> (B, N, C)
                per_og.append(jnp.einsum("bnqc,bnq->bnc", v, wgt4,
                                         preferred_element_type=dtype,
                                         precision=precision))
            sampled = per_og[0] if og == 1 else jnp.concatenate(per_og, axis=-1)
            # tap matmul (MXU): (B, N, Cin) x (Cin/g, Cout)
            if groups == 1:
                out = out + jnp.einsum("bnc,co->bno", sampled, weight[i, j],
                                       preferred_element_type=dtype,
                                       precision=precision)
            else:
                cout_g = cout // groups
                parts = [
                    jnp.einsum("bnc,co->bno",
                               sampled[..., g * cin_g:(g + 1) * cin_g],
                               weight[i, j][:, g * cout_g:(g + 1) * cout_g],
                               preferred_element_type=dtype,
                               precision=precision)
                    for g in range(groups)
                ]
                out = out + jnp.concatenate(parts, axis=-1)

    out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out
