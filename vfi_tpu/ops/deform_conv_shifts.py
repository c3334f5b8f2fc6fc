"""Gather-free modulated deformable conv (bounded offsets) — TPU fast path.

TPU has no fast random-access gather: XLA lowers per-pixel fractional
sampling to scalarized row gathers that dominate the whole model's runtime
(measured ~450 ms per 67-channel DCN layer at 640x480 on v5e). This
implementation removes gathers entirely by exploiting that bilinear
sampling at a *bounded* displacement is a small dense sum:

    sample(x, p + d)  =  sum_{s in [-R..R]^2}  tri(d_y - s_y) tri(d_x - s_x) x[p + s]

where tri(v) = max(0, 1 - |v|) is nonzero for at most 2 integers per axis.
With offsets clamped to [-R, R], every tap becomes (2R+1)^2 statically
shifted reads of the feature map weighted on the VPU, followed by one MXU
matmul per kernel tap — no gather HLOs, fully fusable, layout-friendly.

Semantics: identical to `deform_conv2d` (torchvision DCNv2,
reference src/models/ema_vfi.py:45-60) whenever every learned offset lies in
[-R, R]; larger offsets saturate at R (the exact op is the fallback for
unbounded parity). Zero-padding boundary semantics are preserved via an
explicit pad. Differentiable in x / offset / mask / weight / bias (clamp has
the usual saturating subgradient).

Supported config (the flagship model's): stride 1, dilation 1, one offset
group, one weight group. Anything else should use `deform_conv2d`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def deform_conv2d_shifts(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    max_offset: int = 3,
    padding: int = 1,
    precision=None,
    unroll: Optional[bool] = None,
) -> jnp.ndarray:
    """DCNv2 with offsets clamped to [-max_offset, max_offset], NHWC.

    Args:
      x: (B, H, W, Cin)
      offset: (B, H, W, 2*kh*kw) torchvision layout (dy, dx per tap).
      mask: (B, H, W, kh*kw) or None.
      weight: (kh, kw, Cin, Cout).
      bias: (Cout,) or None.
      max_offset: R — clamp radius in pixels.
      unroll: True = fully unrolled shifts (fastest when XLA fuses, but it
        materializes per-shift terms — OOMs beyond R=2 at video sizes);
        False = lax.scan over shifts (O(1) extra memory, differentiable,
        slower); None picks unroll for R <= 2.
    Returns: (B, H, W, Cout) (stride 1, 'same' spatial size).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    if cin_g != cin:
        raise ValueError("deform_conv2d_shifts supports groups == 1 only")
    n_taps = kh * kw
    if offset.shape[-1] != 2 * n_taps:
        raise ValueError("deform_conv2d_shifts supports one offset group only")
    R = int(max_offset)
    dtype = x.dtype

    # Halo: tap anchor (i - padding) in [-padding, kh-1-padding] plus clamped
    # offset in [-R, R] -> absolute integer shifts in [-padding-R, kh-1-padding+R].
    m_lo = padding + R
    m_hi = (kh - 1 - padding) + R
    xp = jnp.pad(x, ((0, 0), (m_lo, m_hi), (m_lo, m_hi), (0, 0)))

    off = offset.reshape(b, h, w, n_taps, 2)
    msk = None if mask is None else mask.reshape(b, h, w, n_taps)

    if unroll is None:
        unroll = R <= 2
    if not unroll:
        return _shifts_scan(xp, off, msk, weight, bias, R=R, padding=padding,
                            m_lo=m_lo, out_shape=(b, h, w, cout),
                            precision=precision)

    out = jnp.zeros((b, h, w, cout), dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            # total displacement of this tap relative to the output pixel
            # (weight math in f32 for bf16 inputs)
            ty = jnp.clip(off[..., t, 0].astype(jnp.float32), -R, R) + (i - padding)
            tx = jnp.clip(off[..., t, 1].astype(jnp.float32), -R, R) + (j - padding)
            acc = None
            for vy in range(i - padding - R, i - padding + R + 1):
                ay = jnp.clip(1.0 - jnp.abs(ty - vy), 0.0, 1.0)
                for vx in range(j - padding - R, j - padding + R + 1):
                    ax = jnp.clip(1.0 - jnp.abs(tx - vx), 0.0, 1.0)
                    wgt = (ay * ax).astype(dtype)
                    if msk is not None:
                        wgt = wgt * msk[..., t]
                    xs = xp[:, m_lo + vy:m_lo + vy + h,
                            m_lo + vx:m_lo + vx + w, :]
                    term = wgt[..., None] * xs
                    acc = term if acc is None else acc + term
            out = out + jnp.einsum("bhwc,co->bhwo", acc, weight[i, j],
                                   preferred_element_type=dtype,
                                   precision=precision)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def _shifts_scan(xp, off, msk, weight, bias, *, R, padding, m_lo, out_shape,
                 precision):
    """lax.scan formulation of the shift decomposition: one (tap, vy, vx)
    triple per step, each a dynamic_slice of the padded input + weighted
    accumulate. O(1) extra memory (XLA cannot blow up unrolled terms) and
    reverse-differentiable (static trip count). ~(2R+1)^2 * k^2 sequential
    steps — slower than the fused Pallas kernel but the safe fallback for
    large radii."""
    import jax
    from jax import lax

    b, h, w, cout = out_shape
    kh, kw, cin, _ = weight.shape
    dtype = xp.dtype
    nsh = 2 * R + 1
    n_taps = kh * kw

    # Precompute per-tap displacement fields once (f32 weight math).
    taps_ty = jnp.stack([
        jnp.clip(off[..., t, 0].astype(jnp.float32), -R, R) + (t // kw - padding)
        for t in range(n_taps)])  # (taps, B, H, W)
    taps_tx = jnp.stack([
        jnp.clip(off[..., t, 1].astype(jnp.float32), -R, R) + (t % kw - padding)
        for t in range(n_taps)])
    taps_msk = (jnp.ones((n_taps, b, h, w), dtype) if msk is None
                else jnp.moveaxis(msk, -1, 0).astype(dtype))
    w_taps = weight.reshape(n_taps, cin, cout)

    steps = jnp.arange(n_taps * nsh * nsh)

    def body(acc, k):
        t = k // (nsh * nsh)
        rem = k % (nsh * nsh)
        i = t // kw
        j = t % kw
        vy = rem // nsh + (i - padding - R)
        vx = rem % nsh + (j - padding - R)
        ty = taps_ty[t]
        tx = taps_tx[t]
        ay = jnp.clip(1.0 - jnp.abs(ty - vy.astype(jnp.float32)), 0.0, 1.0)
        ax = jnp.clip(1.0 - jnp.abs(tx - vx.astype(jnp.float32)), 0.0, 1.0)
        wgt = (ay * ax).astype(dtype) * taps_msk[t]
        xs = lax.dynamic_slice(
            xp, (0, m_lo + vy, m_lo + vx, 0), (b, h, w, cin))
        term = jnp.einsum("bhwc,co->bhwo", wgt[..., None] * xs, w_taps[t],
                          preferred_element_type=dtype, precision=precision)
        return acc + term, None

    acc0 = jnp.zeros((b, h, w, cout), dtype)
    acc, _ = lax.scan(body, acc0, steps)
    if bias is not None:
        acc = acc + bias.astype(dtype)
    return acc
