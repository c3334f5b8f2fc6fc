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


def deform_conv2d_shifts_bwd(x, offset, mask, weight, bias, g,
                             max_offset: int = 3, padding: int = 1):
    """Hand-written VJP of `deform_conv2d_shifts` (unrolled form).

    Returns (dx, doffset, dmask_or_None, dweight, dbias_or_None) for the
    cotangent `g` — the same gradients `jax.vjp` of the forward computes,
    WITHOUT re-running the forward's output accumulation: the Pallas DCN
    wrappers (ops/pallas/wrappers.py) previously paid Pallas forward +
    shifts forward (inside jax.vjp) + shifts backward per training step;
    this removes the middle term. The tri-weight fields and blends are
    recomputed here (they are the natural residuals either way); weight
    math in f32.

    Gradient conventions match XLA AD: clip passes cotangents inside the
    closed interval; tri(v) = clip(1-|v|,0,1) has slope -sign(v) on
    0 < |v| < 1 and 0 elsewhere (sign(0) = 0).
    """
    import jax.numpy as jnp

    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    n_taps = kh * kw
    R = int(max_offset)
    m_lo = padding + R
    m_hi = (kh - 1 - padding) + R
    xp = jnp.pad(x, ((0, 0), (m_lo, m_hi), (m_lo, m_hi), (0, 0)))
    off = offset.reshape(b, h, w, n_taps, 2)
    msk = None if mask is None else mask.reshape(b, h, w, n_taps)

    g32 = g.astype(jnp.float32)
    db = None if bias is None else jnp.sum(g32, axis=(0, 1, 2)).astype(
        bias.dtype)
    dxp = jnp.zeros(xp.shape, jnp.float32)
    dW = jnp.zeros(weight.shape, jnp.float32)
    doff = jnp.zeros((b, h, w, n_taps, 2), jnp.float32)
    dmask = None if msk is None else jnp.zeros((b, h, w, n_taps),
                                               jnp.float32)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            offy = off[..., t, 0].astype(jnp.float32)
            offx = off[..., t, 1].astype(jnp.float32)
            ty = jnp.clip(offy, -R, R) + (i - padding)
            tx = jnp.clip(offx, -R, R) + (j - padding)
            m_t = None if msk is None else msk[..., t].astype(jnp.float32)
            # q_t = g @ W_t^T
            q = jnp.einsum("bhwo,co->bhwc", g32,
                           weight[i, j].astype(jnp.float32))
            dsamp = q if m_t is None else q * m_t[..., None]
            samp = jnp.zeros((b, h, w, cin), jnp.float32)
            dty = jnp.zeros((b, h, w), jnp.float32)
            dtx = jnp.zeros((b, h, w), jnp.float32)
            for vy in range(i - padding - R, i - padding + R + 1):
                dy = ty - vy
                ay = jnp.clip(1.0 - jnp.abs(dy), 0.0, 1.0)
                day = -jnp.sign(dy) * ((jnp.abs(dy) < 1.0)
                                       & (jnp.abs(dy) > 0.0))
                for vx in range(j - padding - R, j - padding + R + 1):
                    dx_ = tx - vx
                    ax = jnp.clip(1.0 - jnp.abs(dx_), 0.0, 1.0)
                    dax = -jnp.sign(dx_) * ((jnp.abs(dx_) < 1.0)
                                            & (jnp.abs(dx_) > 0.0))
                    xs = xp[:, m_lo + vy:m_lo + vy + h,
                            m_lo + vx:m_lo + vx + w, :].astype(jnp.float32)
                    samp = samp + (ay * ax)[..., None] * xs
                    s_v = jnp.sum(dsamp * xs, axis=-1)
                    dty = dty + day * ax * s_v
                    dtx = dtx + ay * dax * s_v
                    # scatter-transpose of the shifted read
                    dxp = dxp.at[:, m_lo + vy:m_lo + vy + h,
                                 m_lo + vx:m_lo + vx + w, :].add(
                        (ay * ax)[..., None] * dsamp)
            macc = samp if m_t is None else samp * m_t[..., None]
            dW = dW.at[i, j].set(
                jnp.einsum("bhwc,bhwo->co", macc, g32))
            if dmask is not None:
                dmask = dmask.at[..., t].set(jnp.sum(q * samp, axis=-1))
            # clip passes gradient on the closed interval
            doff = doff.at[..., t, 0].set(
                dty * (jnp.abs(offy) <= R))
            doff = doff.at[..., t, 1].set(
                dtx * (jnp.abs(offx) <= R))
    dx = dxp[:, m_lo:m_lo + h, m_lo:m_lo + w, :].astype(x.dtype)
    return (dx,
            doff.reshape(offset.shape).astype(offset.dtype),
            None if dmask is None else dmask.astype(mask.dtype),
            dW.astype(weight.dtype),
            db)
