"""VGG16 perceptual loss (reference: src/utils/loss_functions.py:24-69).

Semantics preserved exactly:
- Both images are resized to 224x224 with non-antialiased bilinear
  interpolation, align_corners=False (:55-56) — `vfi_tpu.ops.resize_bilinear`
  reproduces torch's `F.interpolate` math.
- ImageNet mean/std normalization is applied to the (already model-space)
  inputs (:57-59).
- L1 distance at ONE selected feature tap (relu1_2/relu2_2/relu3_3/relu4_3),
  then stop (:63-68). The training config of record uses relu2_2
  (reference train.py:85).

TPU-first difference: the VGG trunk is only built up to the selected tap, so
a relu2_2 loss never computes the 256/512-channel stages the reference runs
`break` on AFTER constructing all four.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from vfi_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD, LAYER_INDEX, VGG16Features
from vfi_tpu.ops.resize import resize_bilinear


class VGGPerceptualLoss:
    """Callable `(pred, target) -> scalar` perceptual loss.

    Args:
      params: Flax params for `VGG16Features` (import pretrained torchvision
        weights with `vfi_tpu.utils.convert.convert_vgg16_torch`). If None,
        fixed random features are used (clearly a degradation — fine for
        smoke tests, NOT for parity evals).
      layer: which tap to compare at ('relu1_2'|'relu2_2'|'relu3_3'|'relu4_3').
      resize: resize inputs to 224x224 first (reference default True).
      normalize: apply ImageNet normalization (reference default True).
    """

    def __init__(
        self,
        params: Optional[Any] = None,
        layer: str = "relu2_2",
        resize: bool = True,
        normalize: bool = True,
        dtype: Optional[Any] = None,
        rng_seed: int = 0,
    ):
        self.layer_index = LAYER_INDEX[layer]
        self.resize = resize
        self.normalize = normalize
        self.module = VGG16Features(max_stage=self.layer_index, dtype=dtype)
        if params is None:
            import warnings

            import jax

            warnings.warn(
                "VGGPerceptualLoss initialized WITHOUT pretrained weights; "
                "using fixed random features. Import torchvision vgg16 "
                "weights via vfi_tpu.utils.convert.convert_vgg16_torch for "
                "reference-parity training/eval.",
                stacklevel=2,
            )
            dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
            params = self.module.init(jax.random.PRNGKey(rng_seed), dummy)
        self.params = params
        self._mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3)
        self._std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.resize:
            pred = resize_bilinear(pred, (224, 224), align_corners=False)
            target = resize_bilinear(target, (224, 224), align_corners=False)
        if self.normalize:
            mean = self._mean.astype(pred.dtype)
            std = self._std.astype(pred.dtype)
            pred = (pred - mean) / std
            target = (target - mean) / std
        fp = self.module.apply(self.params, pred)[self.layer_index]
        ft = self.module.apply(self.params, target)[self.layer_index]
        return jnp.mean(jnp.abs(fp - ft))
