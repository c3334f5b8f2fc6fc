"""Reusable Flax layers (NHWC, TPU-first).

Covers the building blocks the reference composes its model from
(reference: src/models/ema_vfi.py:7-60): plain 3x3 convs, conv+ReLU blocks,
and the offset-predicting modulated deformable conv ("DCNv2 pack").

TPU notes:
- Everything is NHWC; convs lower to XLA `conv_general_dilated` which tiles
  channels onto the MXU (channels-last keeps the 128-lane dimension dense).
- `param_dtype` stays float32; `dtype` can be bfloat16 for activation compute
  (mixed-precision policy), matching fp32-master-weights practice.
- Initialization defaults reproduce PyTorch Conv2d's kaiming-uniform(a=sqrt5)
  + fan-in-uniform bias so from-scratch training dynamics match the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vfi_tpu.ops.deform_conv import deform_conv2d
from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts

Dtype = Any

# PyTorch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
# b = sqrt(1/fan_in); variance_scaling(1/3, fan_in, uniform) is exactly that.
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


_pallas_rejected_shapes: set = set()


_pallas_backend_warned = False


def _warn_pallas_backend() -> None:
    """Trace-time notice (once per process) that use_pallas=True fell back
    to the XLA shifts op because the default backend is not a TPU — Mosaic
    kernels cannot lower on CPU/GPU. Same numerics, no Pallas speedup."""
    global _pallas_backend_warned
    if not _pallas_backend_warned:
        _pallas_backend_warned = True
        import jax

        print(f"[vfi_tpu] use_pallas requested on non-TPU backend "
              f"'{jax.default_backend()}'; falling back to the XLA shifts "
              f"op (same numerics, no Pallas speedup)")


def _warn_pallas_rejected(h: int, w: int, c: int) -> None:
    """Trace-time notice (once per shape) that use_pallas=True fell back to
    the XLA shifts op because no VMEM-feasible row slab exists — e.g. a
    spatially-sharded slab height not divisible by 8, or 4K widths. The
    numerics are identical but the documented Pallas speedup is absent."""
    key = (h, w, c)
    if key not in _pallas_rejected_shapes:
        _pallas_rejected_shapes.add(key)
        print(f"[vfi_tpu] use_pallas requested but no feasible row slab for "
              f"input {h}x{w}x{c}; DCN falls back to the XLA shifts op "
              f"(same numerics, no Pallas speedup)")


def torch_bias_init(kernel_shape: Sequence[int]):
    """PyTorch Conv2d/Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    `kernel_shape` is the HWIO kernel shape (or (in, out) for dense); fan_in
    is the product of all dims except the last.
    """
    fan_in = int(np.prod(kernel_shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _PallasConv(nn.Module):
    """Drop-in for `nn.Conv` (identical "kernel"/"bias" param tree and
    init) whose forward runs the fused Pallas conv kernel
    (ops/pallas/conv.py: row-slab DMA + in-VMEM im2col + one MXU dot +
    fused bias/ReLU) through the hand-written-backward custom_vjp
    (ops/pallas/wrappers.conv2d_fast). Callers gate on
    `pallas_conv_feasible` + `pallas_backend_supported` first."""

    features: int
    kernel_size: int
    kernel_init: Any
    bias_init: Any
    use_bias: bool = True
    act: bool = False
    variant: str = "im2col"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel_shape = (k, k, x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kernel_shape,
                            jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dtype = self.dtype or x.dtype
        from vfi_tpu.ops.pallas.wrappers import conv2d_fast

        return conv2d_fast(x.astype(dtype), kernel.astype(dtype),
                           bias.astype(dtype) if bias is not None else None,
                           self.act, self.variant)


class ConvBlock(nn.Module):
    """3x3 conv (+ optional ReLU) with explicit torch-style padding.

    Equivalent of the reference's `conv`/`conv_block` helpers
    (src/models/ema_vfi.py:7-14). Explicit symmetric padding is used instead
    of 'SAME' because for stride-2 XLA's SAME picks (0,1) padding while torch
    pads (1,1) — sampling positions (and therefore converted-checkpoint
    outputs) would differ.

    `use_pallas=True` routes stride-1/dilation-1/groups-1 odd-k blocks
    through the fused Pallas conv kernel (same params, same numerics to
    bf16 rounding; ReLU fused in-kernel) when the backend and shape
    support it — this toolchain's XLA conv emitter runs 720p NHWC convs
    at ~8% MFU (docs/PERFORMANCE.md roofline), the kernel measured
    faster (tools/bench_conv.py). Falls back to `nn.Conv` otherwise.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    act: bool = True
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    # "auto" picks the packed v2 kernel when the shape supports it
    # (C in {64, 128} — 8 of the 10 trunk convs), else the v1 im2col
    # kernel, else falls back to nn.Conv.
    pallas_variant: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel_shape = (k, k, x.shape[-1] // self.groups, self.features)
        fast = (self.use_pallas and self.stride == 1 and self.dilation == 1
                and self.groups == 1 and k % 2 == 1
                and self.padding == k // 2)
        variant = self.pallas_variant
        if variant not in ("auto", "im2col", "direct", "v2", "chain"):
            raise ValueError(f"unknown pallas_variant {variant!r}; expected "
                             "auto | im2col | direct | v2 | chain")
        if fast:
            from vfi_tpu.ops.pallas.conv import (
                pallas_conv_chain_feasible, pallas_conv_feasible,
                pallas_conv_v2_feasible)
            from vfi_tpu.ops.pallas.sampling import pallas_backend_supported

            dtype = self.dtype or x.dtype
            isz = jnp.dtype(dtype).itemsize
            if not pallas_backend_supported():
                fast = False
            elif variant == "chain":
                # The L=1 fused chain has its own constraints (w % 16 == 0,
                # lane-packable first layer) that the generic picker does
                # not know — gate it through its real feasibility check
                # instead of silently passing the 'direct' budget math.
                fast = pallas_conv_chain_feasible(
                    x.shape[1], x.shape[2], (x.shape[-1], self.features),
                    isz)
            elif variant == "auto":
                if pallas_conv_v2_feasible(x.shape[1], x.shape[2],
                                           x.shape[-1], self.features, k,
                                           isz):
                    variant = "v2"
                elif pallas_conv_feasible(x.shape[1], x.shape[2],
                                          x.shape[-1], self.features, k,
                                          isz):
                    variant = "im2col"
                else:
                    fast = False
            else:
                fast = pallas_conv_feasible(
                    x.shape[1], x.shape[2], x.shape[-1], self.features, k,
                    isz, variant)
        if fast:
            # Identical param tree ("conv/kernel", "conv/bias") and init:
            # checkpoints are interchangeable between the two paths.
            return _PallasConv(
                self.features, k,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(kernel_shape),
                use_bias=self.use_bias,
                act=self.act,
                variant=variant,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(kernel_shape),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class ModulatedDeformConv(nn.Module):
    """Offset-predicting modulated deformable conv (DCNv2 "pack").

    Equivalent of the reference's `ModulatedDeformConvPack`
    (src/models/ema_vfi.py:23-60), including its parity-relevant quirks:

    - The offset conv outputs `og * 3 * k*k` channels, zero-initialized
      (weights AND bias, ema_vfi.py:42-43), chunked into three k*k groups
      (static-offset, mask, dynamic-offset); offsets are re-concatenated as
      cat(static, dynamic) and the mask is sigmoid'ed (ema_vfi.py:57-59).
      The concatenated 2*og*k*k channels are interpreted in torchvision's
      (dy, dx)-interleaved tap order by `deform_conv2d`.
    - Output channels == input channels (the reference assigns
      `self.out_channels = in_channels`, ignoring its own argument,
      ema_vfi.py:27). We expose `features` honestly; callers wanting
      reference behavior pass features == input channels.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    offset_groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # TPU fast path: clamp offsets to [-R, R] and use the gather-free
    # shift-decomposition kernel (ops/deform_conv_shifts.py). None = exact
    # unbounded sampling via the gather op (parity mode; much slower on TPU).
    max_offset: Optional[int] = None
    # With max_offset set: run the fused Pallas kernel (custom_vjp; forward
    # in ops/pallas/sampling.py, backward via the XLA shifts op). Identical
    # numerics to the shifts op; single HBM read of x per layer.
    use_pallas: bool = False
    # Optional explicit column-tile width for the Pallas kernel (None =
    # auto plan: untiled when feasible). Per-tile skip predicates are
    # tighter than full-width ones on real trained offsets — tw256 at 720p
    # measured ~8-18% faster per layer (bit-identical output). Ignored
    # (auto plan) when it does not divide this input's width or its slab
    # is VMEM-infeasible.
    tile_w: Optional[int] = None
    # Which Pallas DCN forward to use with use_pallas: "v4" (lane-major,
    # the round-2 production kernel) or "v5" (transposed layout — C in
    # sublanes, lane-dense blends at any channel count; tile_w selects
    # its column-tiled skip predicates, round 5). Falls back to v4 (then
    # shifts) when v5 is infeasible for the shape.
    pallas_kernel: str = "v4"
    # "pallas" routes the OFFSET-predicting conv (a full-res 3x3 stride-1
    # conv like the trunk blocks, reference src/models/ema_vfi.py:42-43)
    # through the packed Pallas conv kernel when feasible — same zero
    # init, same param tree.
    conv_kernel: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        og = self.offset_groups
        n_taps = k * k

        off_fast = (self.conv_kernel == "pallas" and self.stride == 1
                    and self.dilation == 1 and self.padding == k // 2)
        if off_fast:
            from vfi_tpu.ops.pallas.conv import pallas_conv_chain_feasible
            from vfi_tpu.ops.pallas.sampling import pallas_backend_supported

            dt_ = self.dtype or x.dtype
            off_fast = (pallas_backend_supported()
                        and pallas_conv_chain_feasible(
                            x.shape[1], x.shape[2],
                            (x.shape[-1], og * 3 * n_taps),
                            jnp.dtype(dt_).itemsize))
        if off_fast:
            raw = _PallasConv(
                og * 3 * n_taps, k,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                act=False,
                variant="chain",
                dtype=self.dtype,
                name="offset_conv",
            )(x)
        else:
            raw = nn.Conv(
                og * 3 * n_taps,
                (k, k),
                strides=(self.stride, self.stride),
                padding=((self.padding, self.padding), (self.padding, self.padding)),
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=True,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="offset_conv",
            )(x)

        off_static, mask, off_dynamic = jnp.split(raw, 3, axis=-1)
        offset = jnp.concatenate([off_static, off_dynamic], axis=-1)
        mask = jax.nn.sigmoid(mask)

        kernel_shape = (k, k, x.shape[-1], self.features)
        weight = self.param("kernel", torch_kernel_init, kernel_shape, jnp.float32)
        bias = (
            self.param("bias", torch_bias_init(kernel_shape), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        if (self.max_offset is not None and self.stride == 1
                and self.dilation == 1 and self.offset_groups == 1):
            if self.use_pallas:
                from vfi_tpu.ops.pallas.sampling import (
                    pallas_backend_supported, pallas_sampling_feasible)
                from vfi_tpu.ops.pallas.wrappers import deform_conv2d_fast

                if not pallas_backend_supported():
                    # Off-TPU (CPU/GPU backends) Mosaic can't lower; the
                    # shifts op below is numerically identical.
                    _warn_pallas_backend()
                    return deform_conv2d_shifts(
                        x.astype(dtype), offset.astype(dtype),
                        mask.astype(dtype), weight.astype(dtype),
                        bias.astype(dtype) if bias is not None else None,
                        max_offset=self.max_offset, padding=self.padding)
                isz = jnp.dtype(dtype).itemsize
                if self.pallas_kernel == "v5":
                    from vfi_tpu.ops.pallas.sampling import (
                        pallas_sampling_v5_feasible)
                    from vfi_tpu.ops.pallas.wrappers import (
                        deform_conv2d_fast_v5)

                    # Optional column-tiled predicates (tile_w): degrade
                    # to the untiled plan when the tile can't split this
                    # input's lane-padded width (same policy as v4's).
                    tw5 = self.tile_w
                    if tw5 is not None and not pallas_sampling_v5_feasible(
                            x.shape[1], x.shape[2], x.shape[3],
                            self.features, self.max_offset, isz,
                            tile_w=tw5):
                        tw5 = None
                    if pallas_sampling_v5_feasible(
                            x.shape[1], x.shape[2], x.shape[3],
                            self.features, self.max_offset, isz):
                        return deform_conv2d_fast_v5(
                            x.astype(dtype), offset.astype(dtype),
                            mask.astype(dtype), weight.astype(dtype),
                            bias.astype(dtype) if bias is not None else None,
                            self.max_offset, tw5)
                    # infeasible for this shape: degrade to the v4 plan
                # Requested explicit tile that can't apply to this width
                # (or slab) degrades to the auto plan, not to a failure:
                # the same model instance runs many input sizes.
                tw = self.tile_w
                if tw is not None and not pallas_sampling_feasible(
                        x.shape[1], x.shape[2], x.shape[3], self.features,
                        self.max_offset, isz, tile_w=tw):
                    tw = None
                if pallas_sampling_feasible(
                        x.shape[1], x.shape[2], x.shape[3], self.features,
                        self.max_offset, isz):
                    return deform_conv2d_fast(
                        x.astype(dtype), offset.astype(dtype),
                        mask.astype(dtype), weight.astype(dtype),
                        bias.astype(dtype) if bias is not None else None,
                        self.max_offset, tw)
                _warn_pallas_rejected(x.shape[1], x.shape[2], x.shape[3])
            return deform_conv2d_shifts(
                x.astype(dtype), offset.astype(dtype), mask.astype(dtype),
                weight.astype(dtype),
                bias.astype(dtype) if bias is not None else None,
                max_offset=self.max_offset, padding=self.padding)
        return deform_conv2d(
            x.astype(dtype),
            offset.astype(dtype),
            mask.astype(dtype),
            weight.astype(dtype),
            bias.astype(dtype) if bias is not None else None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
        )


class _ConvParamsInner(nn.Module):
    """Creates nn.Conv-identical {kernel, bias} params and returns them."""

    kernel_shape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, self.kernel_shape,
                            jnp.float32)
        bias = (self.param("bias", torch_bias_init(self.kernel_shape),
                           (self.kernel_shape[-1],), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class ConvBlockParams(nn.Module):
    """Parameter-only twin of ConvBlock: builds the identical
    ``<name>/conv/{kernel, bias}`` tree (same shapes, same torch-parity
    init) and returns the arrays instead of applying the conv — so a fused
    multi-layer kernel (ops/pallas/conv.conv_chain_pallas) can consume
    several blocks' parameters in one call while checkpoints remain
    interchangeable with the ConvBlock path."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        ks = (self.kernel_size, self.kernel_size, cin, self.features)
        return _ConvParamsInner(ks, use_bias=self.use_bias, name="conv")()


def apply_conv_chain(x, kbs, acts, dtype=None):
    """Apply a chain of stride-1 3x3 conv(+ReLU) layers given explicit
    (kernel, bias) pairs: the fused Pallas chain kernel when the backend
    and shape support it, else the numerically matching XLA sequence.
    ConvBlock semantics per layer (zeros padding 1, f32 accumulation)."""
    import jax

    compute = dtype or x.dtype
    x = x.astype(compute)
    ws = tuple(k.astype(compute) for k, _ in kbs)
    bs = tuple(b.astype(compute) if b is not None else None for _, b in kbs)
    chans = (x.shape[-1],) + tuple(w.shape[-1] for w in ws)

    from vfi_tpu.ops.pallas.conv import pallas_conv_chain_feasible
    from vfi_tpu.ops.pallas.sampling import pallas_backend_supported

    if (pallas_backend_supported() and all(b is not None for b in bs)
            and pallas_conv_chain_feasible(
                x.shape[1], x.shape[2], chans,
                jnp.dtype(compute).itemsize)):
        from vfi_tpu.ops.pallas.wrappers import conv_chain_fast

        return conv_chain_fast(x, ws, bs, tuple(acts))
    o = x
    for w, b_, a in zip(ws, bs, acts):
        o = jax.lax.conv_general_dilated(
            o, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        if b_ is not None:
            o = o + b_.astype(jnp.float32)
        if a:
            o = jnp.maximum(o, 0.0)
        o = o.astype(compute)
    return o
