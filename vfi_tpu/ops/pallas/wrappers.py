"""Differentiable wrappers over the Pallas sampling kernels.

The Pallas kernels are forward-only; `deform_conv2d_shifts` computes the
exact same function (bounded shift decomposition) in differentiable XLA. The
custom_vjp below runs the Pallas kernel on the forward pass and takes the
backward pass through the XLA formulation — numerics agree because the two
forwards are the same function, so cotangents are consistent.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
from vfi_tpu.ops.pallas.sampling import (bounded_warp_pallas_v2,
                                         deform_conv2d_pallas_v4)
from vfi_tpu.ops.warp import warp as warp_xla


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_fast(x, offset, mask, weight, bias, max_offset: int = 3,
                       tile_w=None):
    """DCNv2 with bounded offsets: Pallas forward (v4 kernel),
    differentiable backward.

    Same contract as `deform_conv2d_shifts` (NHWC, stride 1, og=1, groups=1).
    `tile_w` forces a column-tile width on the forward kernel (None = the
    auto plan): per-tile skip predicates are tighter than full-width ones
    on real trained offsets — tw256 at 720p is ~8-18% faster per layer
    (docs/PERFORMANCE.md "Column-tiled predicates on trained offsets").
    Bit-identical to untiled for any tile width.
    """
    return deform_conv2d_pallas_v4(x, offset, mask, weight, bias,
                                   max_offset=max_offset, tile_w=tile_w)


def _dcn_fwd(x, offset, mask, weight, bias, max_offset, tile_w):
    out = deform_conv2d_pallas_v4(x, offset, mask, weight, bias,
                                  max_offset=max_offset, tile_w=tile_w)
    return out, (x, offset, mask, weight, bias)


def _dcn_bwd(max_offset, tile_w, res, g):
    # AD of the XLA shifts forward. Round-5 step-level A/B
    # (artifacts/train_step_bench_r5.json + runs/queueAF/train_step_320):
    # the round-4 hand-written backward (ops/deform_conv_shifts.py
    # deform_conv2d_shifts_bwd — still exported, gradient-identical,
    # tests/test_deform_conv_shifts.py) is 2.1x SLOWER per train step
    # than letting XLA differentiate the shifts op (crop 320 b16: 8175
    # vs 3910 ms/step; crop 128 b8: 533 vs 250) — XLA fuses the AD
    # backward's shift/blend chains better than the hand formulation's
    # explicit transposed ops, and the forward "recompute" it saves is
    # recomputed anyway under remat. The hand A/B that motivated round 4
    # measured compile+run on one layer, where compile dominated.
    x, offset, mask, weight, bias = res
    from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts

    def f(x_, o_, m_, w_, b_):
        return deform_conv2d_shifts(x_, o_, m_, w_, b_,
                                    max_offset=max_offset)

    _, vjp = jax.vjp(f, x, offset, mask, weight, bias)
    return vjp(g)


deform_conv2d_fast.defvjp(_dcn_fwd, _dcn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_fast(image, flow, max_flow: int = 16):
    """Bounded backward warp: Pallas forward (strip-packed v2 kernel),
    XLA-gather backward.

    Matches `ops.warp(image, clip(flow, -R, R))`.
    """
    return bounded_warp_pallas_v2(image, flow, max_flow=max_flow)


def _warp_fwd(image, flow, max_flow):
    return bounded_warp_pallas_v2(image, flow, max_flow=max_flow), (image,
                                                                    flow)


def _warp_bwd(max_flow, res, g):
    image, flow = res

    def f(im, fl):
        return warp_xla(im, jnp.clip(fl, -max_flow, max_flow))

    _, vjp = jax.vjp(f, image, flow)
    return vjp(g)


warp_fast.defvjp(_warp_fwd, _warp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_fast_v5(x, offset, mask, weight, bias, max_offset: int = 3,
                          tile_w=None):
    """DCNv2 with bounded offsets: v5 transposed-layout Pallas forward
    (C in sublanes — lane-dense at any channel count), differentiable
    backward through the XLA shifts formulation (same function).
    tile_w: optional column-tile width for the per-tile skip predicates
    (bit-identical output; see deform_conv2d_pallas_v5)."""
    from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

    return deform_conv2d_pallas_v5(x, offset, mask, weight, bias,
                                   max_offset=max_offset, tile_w=tile_w)


def _dcn5_fwd(x, offset, mask, weight, bias, max_offset, tile_w):
    from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

    out = deform_conv2d_pallas_v5(x, offset, mask, weight, bias,
                                  max_offset=max_offset, tile_w=tile_w)
    return out, (x, offset, mask, weight, bias)


def _dcn5_bwd(max_offset, tile_w, res, g):
    # AD of the shifts forward — see _dcn_bwd for the round-5 step-level
    # measurement that reverted the hand-written form.
    return _dcn_bwd(max_offset, None, res, g)


deform_conv2d_fast_v5.defvjp(_dcn5_fwd, _dcn5_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv2d_fast(x, weight, bias, act: bool = False,
                variant: str = "im2col"):
    """Stride-1 odd-k conv (+ bias + optional fused ReLU): Pallas forward
    (ops/pallas/conv.py), HAND-WRITTEN XLA backward.

    Unlike the DCN wrappers (whose backward re-runs the shifts forward
    inside jax.vjp), the conv backward is closed-form and saves only
    (x, weight, out): the ReLU mask comes from the saved output, dx is the
    spatially-flipped transposed conv, dw the x*g correlation expressed as
    a conv with the image as the filter — no forward recompute at all.
    Gradients match jax.vjp of the XLA conv+bias+relu composition
    (tests/test_pallas_conv.py).
    """
    return _conv_forward(x, weight, bias, act, variant)


def _conv_forward(x, weight, bias, act, variant):
    from vfi_tpu.ops.pallas.conv import (conv2d_pallas, conv2d_pallas_v2,
                                         conv_chain_pallas)

    if variant == "chain":  # L=1 rotation-staged chain kernel
        return conv_chain_pallas(
            x, (weight,),
            (bias if bias is not None
             else jnp.zeros((weight.shape[-1],), x.dtype),), (act,))
    if variant == "v2":
        return conv2d_pallas_v2(x, weight, bias, act=act)
    return conv2d_pallas(x, weight, bias, act=act, variant=variant)


def _conv_fwd(x, weight, bias, act, variant):
    out = _conv_forward(x, weight, bias, act, variant)
    return out, (x, weight, out if act else None, bias)


def _conv_bwd(act, variant, res, g):
    x, weight, out, bias = res
    k = weight.shape[0]
    m = k // 2
    g = g.astype(jnp.float32)
    if act:
        g = g * (out > 0)
    db = (None if bias is None
          else jnp.sum(g, axis=(0, 1, 2)).astype(bias.dtype))
    # dx: transposed conv = conv with the spatially-flipped, IO-swapped
    # kernel (stride 1, same padding).
    w_flip = jnp.flip(weight, (0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g, w_flip.astype(g.dtype), (1, 1), ((m, m), (m, m)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dw: correlation of x with g — a conv whose "filter" is the whole
    # cotangent image (batch <-> feature transposed operands).
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0).astype(jnp.float32),   # (Cin, H, W, B)
        g.transpose(1, 2, 0, 3),                        # (H, W, B, Cout)
        (1, 1), ((m, m), (m, m)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)             # (Cin, k, k, Cout)
    dw = dw.transpose(1, 2, 0, 3).astype(weight.dtype)
    return dx, dw, db


conv2d_fast.defvjp(_conv_fwd, _conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_chain_fast(x, weights, biases, acts):
    """Fused stride-1 3x3 conv chain: Pallas forward
    (ops/pallas/conv.conv_chain_pallas), backward through the equivalent
    XLA conv sequence (one recomputed forward chain — acceptable because
    training runs small crops; inference never takes the backward)."""
    from vfi_tpu.ops.pallas.conv import conv_chain_pallas

    return conv_chain_pallas(x, weights, biases, acts)


def _chain_xla(x, weights, biases, acts):
    o = x
    for w, b_, a in zip(weights, biases, acts):
        # Cast weights to the activation dtype like the Pallas forward
        # does (training stores f32 params under a bf16 activation
        # policy; lax.conv requires matching operand dtypes — and its
        # TRANSPOSE requires the cotangent dtype to match too, so the
        # f32 upcast happens via astype AFTER the conv rather than
        # preferred_element_type; the MXU still accumulates bf16 convs
        # in f32 internally). The cast's transpose returns dW in the
        # weight's own (param) dtype.
        o = jax.lax.conv_general_dilated(
            o, w.astype(o.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        o = o.astype(jnp.float32) + b_.astype(jnp.float32)
        if a:
            o = jnp.maximum(o, 0.0)
        o = o.astype(x.dtype)
    return o


def _chain_fwd(x, weights, biases, acts):
    from vfi_tpu.ops.pallas.conv import conv_chain_pallas

    return conv_chain_pallas(x, weights, biases, acts), (x, weights, biases)


def _chain_bwd(acts, res, g):
    x, weights, biases = res
    _, vjp = jax.vjp(lambda a, ws, bs: _chain_xla(a, ws, bs, acts),
                     x, weights, biases)
    return vjp(g.astype(x.dtype))


conv_chain_fast.defvjp(_chain_fwd, _chain_bwd)
