"""Utilities: typed config, metrics, checkpoint conversion, profiling."""

from vfi_tpu.utils.config import TrainConfig, InferConfig, load_train_config
from vfi_tpu.utils.metrics import psnr, ssim

__all__ = ["TrainConfig", "InferConfig", "load_train_config", "psnr", "ssim"]
