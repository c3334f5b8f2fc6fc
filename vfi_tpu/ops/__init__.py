"""Core numerical ops (NHWC, TPU-native)."""

from vfi_tpu.ops.warp import warp, grid_sample, bilinear_sample, nearest_sample
from vfi_tpu.ops.deform_conv import deform_conv2d
from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
from vfi_tpu.ops.resize import resize_bilinear
from vfi_tpu.ops.sobel import sobel_gradients
from vfi_tpu.ops.histogram import color_histogram, soft_color_histogram

__all__ = [
    "warp",
    "grid_sample",
    "bilinear_sample",
    "nearest_sample",
    "deform_conv2d",
    "deform_conv2d_shifts",
    "resize_bilinear",
    "sobel_gradients",
    "color_histogram",
    "soft_color_histogram",
]
