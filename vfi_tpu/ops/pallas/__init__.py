"""Pallas TPU kernels (hot-path implementations of the sampling ops)."""

from vfi_tpu.ops.pallas.sampling import bounded_warp_pallas, deform_conv2d_pallas

__all__ = ["bounded_warp_pallas", "deform_conv2d_pallas"]
