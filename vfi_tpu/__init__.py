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
  ops/      core numerical ops (warp, deform_conv exact/shifts/pallas,
            resize, sobel, histogram) + ops/pallas/ fused TPU kernels
  models/   Flax modules (EMAVFI flagship, VGG16 features, SimpleFlowNet)
  losses/   loss stack (charbonnier/VGG-perceptual/color-hist/gradient/temporal)
  data/     triplet dataset + synchronized augmentations + prefetching loader
  native/   C++ loader core (PNG decode + fused preprocess, ctypes)
  parallel/ device mesh + sharding helpers
  train/    train state, plateau scheduler, orbax checkpoints, training loop
  infer/    frame-pair and video interpolation pipelines
  utils/    config, PSNR/SSIM metrics, .flo IO, converter, profiling
"""

__version__ = "0.1.0"
