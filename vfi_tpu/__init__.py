"""vfi_tpu — a TPU-native video frame interpolation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the
`424635328/video-frame-interpolation` (EMA-VFI) reference project, designed
TPU-first:

- NHWC (channels-last) layouts everywhere, bf16-friendly compute.
- XLA convolutions for the conv trunk; custom ops (backward warping /
  grid_sample, modulated deformable convolution) implemented as
  MXU/VPU-friendly JAX ops with optional Pallas fast paths.
- `jax.sharding.Mesh` + NamedSharding for data-parallel (and spatially
  sharded) training and batch inference across chips.
- optax optimizer stack, Orbax checkpointing with resume, typed config.

Layout:
  ops/      core numerical ops (warp, deform_conv, resize, sobel, histogram)
  models/   Flax modules (EMAVFI flagship model, VGG16 features)
  losses/   loss stack (charbonnier/VGG-perceptual/color-hist/gradient/temporal)
  data/     triplet dataset + synchronized augmentations + prefetching loader
  parallel/ device mesh + sharding helpers
  train/    train state, plateau scheduler, training loop
  infer/    frame-pair and video interpolation pipelines
  utils/    config, PSNR/SSIM metrics, PyTorch checkpoint converter
"""

__version__ = "0.1.0"
