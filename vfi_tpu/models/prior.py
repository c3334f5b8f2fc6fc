"""Flow-prior pre-warp — the large-motion lever for the flagship model.

Round-2 measurement (docs/PERFORMANCE.md "Large-motion (Grove) clamp
ablation"): the EMAVFI stride-1 trunk's receptive field — not the kernel
offset/flow bounds — caps large-displacement scenes (Grove 16.4 dB vs Army
31.0 on the round-1 checkpoint; warp_max_flow=32 is bit-identical to 16
because the trained motion estimator never predicts >16 px). The standard
coarse-to-fine remedy: estimate the large motion with a pyramid flow network
(SimpleFlowNet, models/flownet.py — jointly trained since round 1 for the
temporal-consistency term, reference loss_functions.py:180-205) and feed the
midpoint model a frame2 PRE-ALIGNED halfway along that flow. The main model
then only needs to resolve the small residual — inside its receptive field
and inside the bounded Pallas warp/DCN fast paths.

Composition semantics: ``warp(warp(f1, p), r)(x) = f1(x + r(x) + p(x +
r(x))) ~ f1(x + r + p)`` for smooth priors — the usual pyramid-refinement
approximation. The EMAVFI parameter shapes are UNCHANGED (the prior is a
preprocessing warp), so round-1 checkpoints load into flow-prior mode for
fine-tuning.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from vfi_tpu.ops.warp import warp


def prior_prewarp(flow_apply: Callable, frame0: jnp.ndarray,
                  frame1: jnp.ndarray, scale: float = 0.5
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-align `frame1` toward the temporal midpoint.

    `flow_apply(frame0, frame1)` must return flow such that
    ``warp(frame1, flow) ~ frame0`` (SimpleFlowNet's convention, trained by
    the photometric term in train/loop.py). Scaling by 0.5 aims the warp at
    the midpoint. Returns ``(prewarped_frame1, flow01)`` — the full flow is
    returned so callers (the temporal/photometric losses) can reuse it
    without a second flow forward.

    The warp is the exact unbounded XLA-gather warp (ops/warp.py): the prior
    can be arbitrarily large, which is the whole point. Cost: one bilinear
    gather on `in_channels` (=3) channels — ~2% of a flagship forward at
    720p (docs/PERFORMANCE.md cost attribution), vs the bounded Pallas fast
    paths which keep serving the small-residual stages.
    """
    flow01 = flow_apply(frame0, frame1)
    prior = (flow01 * scale).astype(frame1.dtype)
    return warp(frame1, prior, mode="bilinear"), flow01
