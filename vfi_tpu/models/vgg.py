"""VGG16 feature extractor (Flax, NHWC) for perceptual loss.

Mirrors torchvision's `vgg16().features` staging used by the reference's
`VGGPerceptualLoss` (reference: src/utils/loss_functions.py:24-69): four
feature taps at relu1_2 / relu2_2 / relu3_3 / relu4_3 (torchvision feature
indices [:4], [4:9], [9:16], [16:23]).

Pretrained weights are NOT bundled (no network egress in this environment;
the reference downloads them via torchvision at run time). Use
`vfi_tpu.utils.convert.convert_vgg16_torch` to import a torchvision
`vgg16` state_dict once, save it as npz, and pass it to
`VGGPerceptualLoss`. Without pretrained weights the perceptual loss still
runs with fixed random features (a documented degradation, flagged loudly
at load time) — random-projection feature losses remain a usable training
signal, but parity evals should always use imported weights.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# Channel plan of VGG16 "features" (cfg D) up to relu4_3, grouped into the
# four perceptual-loss stages. 'M' = 2x2 max pool (stride 2).
VGG16_STAGES: Sequence[Sequence[Any]] = (
    (64, 64),                # -> relu1_2
    ("M", 128, 128),         # -> relu2_2
    ("M", 256, 256, 256),    # -> relu3_3
    ("M", 512, 512, 512),    # -> relu4_3
)

# ImageNet normalization constants (reference: loss_functions.py:40-41).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

LAYER_INDEX = {"relu1_2": 0, "relu2_2": 1, "relu3_3": 2, "relu4_3": 3}


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the four perceptual-loss feature maps.

    Only stages up to `max_stage` (inclusive) are materialized, so a loss
    pinned to relu2_2 (the reference training config, train.py:85) never
    pays for the 256/512-channel stages.
    """

    max_stage: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        conv_idx = 0
        for stage_idx, stage in enumerate(VGG16_STAGES):
            if stage_idx > self.max_stage:
                break
            for item in stage:
                if item == "M":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.Conv(
                        item,
                        (3, 3),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"conv{conv_idx}",
                    )(x)
                    x = nn.relu(x)
                    conv_idx += 1
            feats.append(x)
        return feats
