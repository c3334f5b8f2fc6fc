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


class ConvBlock(nn.Module):
    """3x3 conv (+ optional ReLU) with explicit torch-style padding.

    Equivalent of the reference's `conv`/`conv_block` helpers
    (src/models/ema_vfi.py:7-14). Explicit symmetric padding is used instead
    of 'SAME' because for stride-2 XLA's SAME picks (0,1) padding while torch
    pads (1,1) — sampling positions (and therefore converted-checkpoint
    outputs) would differ.
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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel_shape = (k, k, x.shape[-1] // self.groups, self.features)
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
    # sublanes, lane-dense blends at any channel count; tile_w is ignored).
    # Falls back to v4 (then shifts) when v5 is infeasible for the shape.
    pallas_kernel: str = "v4"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        og = self.offset_groups
        n_taps = k * k

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

                    if pallas_sampling_v5_feasible(
                            x.shape[1], x.shape[2], x.shape[3],
                            self.features, self.max_offset, isz):
                        return deform_conv2d_fast_v5(
                            x.astype(dtype), offset.astype(dtype),
                            mask.astype(dtype), weight.astype(dtype),
                            bias.astype(dtype) if bias is not None else None,
                            self.max_offset)
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
