"""Flax model zoo (NHWC, TPU-native)."""

from vfi_tpu.models.layers import ConvBlock, ModulatedDeformConv, torch_kernel_init, torch_bias_init
from vfi_tpu.models.ema_vfi import EMAVFI

__all__ = [
    "ConvBlock",
    "ModulatedDeformConv",
    "EMAVFI",
    "torch_kernel_init",
    "torch_bias_init",
]
