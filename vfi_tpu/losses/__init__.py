"""Loss stack: Charbonnier + VGG-perceptual + color-histogram + gradient
(+ temporal consistency), matching the reference's training objective."""

from vfi_tpu.losses.losses import (
    l1_loss,
    l2_loss,
    charbonnier_loss,
    gradient_loss,
    color_histogram_loss,
    temporal_consistency_loss,
    total_loss,
    LossWeights,
)
from vfi_tpu.losses.perceptual import VGGPerceptualLoss

__all__ = [
    "l1_loss",
    "l2_loss",
    "charbonnier_loss",
    "gradient_loss",
    "color_histogram_loss",
    "temporal_consistency_loss",
    "total_loss",
    "LossWeights",
    "VGGPerceptualLoss",
]
