"""Inference: frame-pair interpolation and video frame-rate upconversion."""

from vfi_tpu.infer.pair import FrameInterpolator, pick_interpolation_factor
from vfi_tpu.infer.video import interpolate_video

__all__ = ["FrameInterpolator", "pick_interpolation_factor", "interpolate_video"]
