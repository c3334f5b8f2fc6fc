"""Training loop (jit'd step, DP mesh, checkpoints, metrics).

Equivalent of the reference's `train.py` driver (reference: train.py:99-194)
with the TPU-native upgrades the north star requires:

- one jit'd, donated train step (fwd + loss + bwd + AdamW update) instead of
  eager per-op dispatch;
- data parallelism over a ('data','spatial') mesh: params replicated, batch
  sharded — XLA inserts the gradient psum over ICI (the reference is
  single-device);
- prefetching threaded loader (the reference decodes PNGs on the training
  thread, num_workers=0);
- Orbax checkpoint/resume incl. optimizer/scheduler state (the reference
  cannot resume), with the best-model save actually gated on val loss — the
  reference's comparison is broken and saves every epoch (train.py:180-182);
- per-epoch val PSNR/SSIM (the metrics the reference names but never
  computes) and per-term loss breakdown;
- per-epoch sample image dump, like train.py:138-152 (inverse-ImageNet
  denormalized, clipped — including the reference's quirk of denormalizing
  the model's already-[0,1] output).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfi_tpu.data import AugmentConfig, DataLoader, TripletDataset
from vfi_tpu.losses import LossWeights, total_loss
from vfi_tpu.models import EMAVFI
from vfi_tpu.models.vgg import VGG16Features, LAYER_INDEX
from vfi_tpu.parallel import batch_sharding, make_mesh, replicated, shard_batch
from vfi_tpu.train.checkpoints import CheckpointManager
from vfi_tpu.train.state import (CosineScheduler, PlateauScheduler, TrainState,
                                 create_train_state, set_learning_rate)
from vfi_tpu.utils.config import TrainConfig
from vfi_tpu.utils.convert import load_params_npz
from vfi_tpu.utils.metrics import psnr, ssim

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _unit_range(ft):
    """Invert the ImageNet normalization of the target -> [0,1]."""
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3).astype(ft.dtype)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3).astype(ft.dtype)
    return jnp.clip(ft * std + mean, 0.0, 1.0)


def make_train_step(model: EMAVFI, vgg_module, vgg_layer_index: int,
                    weights: LossWeights, soft_histogram: bool = False,
                    remat: bool = False, flow_module=None,
                    target_unit_range: bool = False,
                    flow_prior: bool = False,
                    flow_prior_scale: float = 0.5,
                    accum_steps: int = 1,
                    flow_photo_pyramid: bool = False,
                    flow_photo_occlusion: bool = False):
    """Build the jit-able train step: (state, vgg_params, f0, ft, f1) ->
    (state, metrics). vgg_params passed explicitly so its sharding is
    controlled by the caller (not baked in as jit constants). `remat`
    rematerializes the forward during backprop (trades FLOPs for HBM —
    lets batch/resolution scale past activation-memory limits).

    `flow_module` (a SimpleFlowNet) activates the temporal-consistency term
    with JOINT training of the flow estimator — the state's params tree is
    then {"model": ..., "flow": ...}. The reference never could run this
    term (its estimator module is missing, reference train.py:72-80).

    `flow_prior` (requires flow_module) pre-warps frame1 halfway along the
    estimator's flow before the main model (models/prior.py — the
    large-motion lever); gradients flow through the prior warp into the
    estimator, so it trains end-to-end on the reconstruction loss on top of
    its photometric term."""

    def vgg_loss_fn(vgg_params, a, b):
        from vfi_tpu.ops.resize import resize_bilinear

        a = resize_bilinear(a, (224, 224))
        b = resize_bilinear(b, (224, 224))
        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3).astype(a.dtype)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3).astype(a.dtype)
        fa = vgg_module.apply(vgg_params, (a - mean) / std)[vgg_layer_index]
        fb = vgg_module.apply(vgg_params, (b - mean) / std)[vgg_layer_index]
        return jnp.mean(jnp.abs(fa - fb))

    apply_fn = jax.checkpoint(model.apply) if remat else model.apply

    def loss_fn(params, vgg_params, f0, ft, f1):
        model_params = params["model"] if flow_module is not None else params
        flow_fn = None
        if flow_module is not None:
            flow_fn = partial(flow_module.apply, params["flow"])
        flow01 = None
        if flow_prior:
            from vfi_tpu.models.prior import prior_prewarp

            f1_in, flow01 = prior_prewarp(flow_fn, f0, f1,
                                          scale=flow_prior_scale)
        else:
            f1_in = f1
        pred = apply_fn(model_params, f0, f1_in)
        if target_unit_range:
            ft = _unit_range(ft)
        vfn = partial(vgg_loss_fn, vgg_params) if vgg_module is not None else None
        tot, terms = total_loss(pred, ft, vfn, weights,
                                soft_histogram=soft_histogram,
                                flow_estimator=flow_fn, frame0=f0, frame1=f1)
        if flow_module is not None:
            # Auxiliary photometric loss that actually trains the estimator:
            # the temporal term's nearest-mode warp (reference
            # loss_functions.py:177) has zero gradient w.r.t. flow, so the
            # estimator would never learn from it — a latent design flaw of
            # the reference inherited by its loss definition.
            from vfi_tpu.ops.warp import warp as warp_op

            if flow01 is None:
                flow01 = flow_fn(f0, f1)
            occ_w = None
            if flow_photo_occlusion:
                # Forward-backward consistency occlusion mask (Sundaram et
                # al. 2010): where warp(f1, flow01) cannot match f0 because
                # the pixel is occluded, the photometric error is pure
                # noise as supervision — the round-4 flow_levels=4 negative
                # result (docs/PERFORMANCE.md) argued the estimator's
                # failure on Urban is supervision quality, not capacity.
                # Non-occluded pixels satisfy flow01 ~= -flow10(warped):
                # mask out |fw + bw_w|^2 > a1*(|fw|^2 + |bw_w|^2) + a2.
                # stop_gradient: the mask gates, it does not train.
                flow10 = flow_fn(f1, f0)
                bw_w = warp_op(flow10, flow01, mode="bilinear")
                incons = jnp.sum(jnp.square(flow01 + bw_w), -1, keepdims=True)
                mag2 = (jnp.sum(jnp.square(flow01), -1, keepdims=True)
                        + jnp.sum(jnp.square(bw_w), -1, keepdims=True))
                occ_w = jax.lax.stop_gradient(
                    (incons <= 0.01 * mag2 + 0.5).astype(f0.dtype))
                terms["flow_occ_frac"] = 1.0 - jnp.mean(occ_w)

            def masked_photo(err, w_=None):
                """Mean |err| over non-occluded pixels (plain mean when
                masking is off)."""
                if w_ is None:
                    return jnp.mean(err)
                return (jnp.sum(err * w_)
                        / (jnp.sum(w_) * err.shape[-1] + 1e-6))

            photo = masked_photo(
                jnp.abs(warp_op(f1, flow01, mode="bilinear") - f0), occ_w)
            terms["flow_photo"] = photo
            tot = tot + weights.temporal * photo
            if flow_photo_pyramid:
                # Multi-scale photometric supervision (config
                # flow_photo_pyramid): the same term at 1/2 and 1/4 scale
                # with the flow magnitude rescaled — direct gradient for
                # the pyramid's coarse levels on large displacements.
                from vfi_tpu.ops.resize import resize_bilinear as _rb

                hh, ww = f0.shape[1], f0.shape[2]
                for s_ in (2, 4):
                    sh, sw = hh // s_, ww // s_
                    fl_s = _rb(flow01, (sh, sw)) / s_
                    w_s = (None if occ_w is None
                           else jax.lax.stop_gradient(_rb(occ_w, (sh, sw))))
                    p_s = masked_photo(jnp.abs(
                        warp_op(_rb(f1, (sh, sw)), fl_s, mode="bilinear")
                        - _rb(f0, (sh, sw))), w_s)
                    terms[f"flow_photo_s{s_}"] = p_s
                    tot = tot + weights.temporal * p_s / s_
        return tot, terms

    def train_step(state: TrainState, vgg_params, f0, ft, f1):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps <= 1:
            (tot, terms), grads = grad_fn(state.params, vgg_params, f0, ft, f1)
        else:
            # Gradient accumulation: lax.scan over accum_steps microbatches.
            # Activations live one microbatch at a time (scan reuses the
            # buffer); only the param-sized grad accumulator persists — the
            # path past the DCN-backward activation wall
            # (docs/PERFORMANCE.md "Flow-prior training memory").
            def split(x):
                return x.reshape((accum_steps, x.shape[0] // accum_steps)
                                 + x.shape[1:])

            xs = (split(f0), split(ft), split(f1))
            terms_shape = jax.eval_shape(
                lambda: loss_fn(state.params, vgg_params,
                                *(x[0] for x in xs))[1])
            zero = ((jnp.zeros(()),
                     jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  terms_shape)),
                    jax.tree.map(jnp.zeros_like, state.params))

            def body(carry, mb):
                (tot_a, terms_a), grads_a = carry
                (tot, terms), grads = grad_fn(state.params, vgg_params, *mb)
                return ((tot_a + tot,
                         jax.tree.map(jnp.add, terms_a, terms)),
                        jax.tree.map(jnp.add, grads_a, grads)), None

            ((tot, terms), grads), _ = jax.lax.scan(body, zero, xs)
            inv = 1.0 / accum_steps
            tot = tot * inv
            terms = jax.tree.map(lambda t: t * inv, terms)
            grads = jax.tree.map(lambda g: g * inv, grads)
        state = state.apply_gradients(grads)
        metrics = {"loss": tot, **terms,
                   "grad_norm": jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)))}
        return state, metrics

    return train_step


def make_eval_step(model: EMAVFI, vgg_module, vgg_layer_index: int,
                   weights: LossWeights, soft_histogram: bool = False,
                   target_unit_range: bool = False,
                   flow_module=None, flow_prior: bool = False,
                   flow_prior_scale: float = 0.5):
    """Val step: loss + prediction + PSNR/SSIM (vs the target un-normalized
    back to [0,1] space for the quality metrics). With `flow_prior`,
    `params` is the joint {"model", "flow"} tree and validation runs the
    same prior pre-warp as training; otherwise `params` is the model tree."""

    def eval_step(params, vgg_params, f0, ft, f1):
        if flow_prior:
            from vfi_tpu.models.prior import prior_prewarp

            f1, _ = prior_prewarp(partial(flow_module.apply, params["flow"]),
                                  f0, f1, scale=flow_prior_scale)
            params = params["model"]
        pred = model.apply(params, f0, f1)
        gt01 = _unit_range(ft)
        # loss in the training convention (reference default: pred [0,1]
        # vs normalized target)
        tot, terms = total_loss(pred, gt01 if target_unit_range else ft,
                                None, weights, soft_histogram=soft_histogram)
        return {"loss": tot, **terms,
                "psnr": jnp.mean(psnr(pred, gt01)),
                "ssim": jnp.mean(ssim(pred, gt01))}

    return eval_step


def denormalize_to_uint8(img01: np.ndarray) -> np.ndarray:
    """The reference's sample-dump path (train.py:143-152): treat the [0,1]
    output as if it were ImageNet-normalized, invert, clip, scale to u8."""
    img = img01 * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


class Trainer:
    """End-to-end training driver. `Trainer(config).run()`."""

    def __init__(self, config: TrainConfig):
        self.cfg = config
        cfg = config
        if cfg.best_metric not in ("val_loss", "val_psnr"):
            raise ValueError(f"unknown best_metric {cfg.best_metric!r} "
                             "(expected 'val_loss' or 'val_psnr')")
        self.mesh = make_mesh(cfg.mesh.data, cfg.mesh.spatial)
        if cfg.batch_size % self.mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"'data' mesh axis ({self.mesh.shape['data']}); set "
                f"mesh.data explicitly (e.g. --mesh.data "
                f"{max(1, cfg.batch_size)}) or raise batch_size")
        if cfg.accum_steps < 1:
            raise ValueError(f"accum_steps must be >= 1, got {cfg.accum_steps}")
        if cfg.accum_steps > 1 and (
                cfg.batch_size % (cfg.accum_steps * self.mesh.shape["data"])):
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by "
                f"accum_steps * data-axis "
                f"({cfg.accum_steps} * {self.mesh.shape['data']}) so each "
                "microbatch still shards evenly over the mesh")
        dtype = jnp.bfloat16 if cfg.bf16 else None
        self.model = EMAVFI(in_channels=cfg.in_channels,
                            mid_channels=cfg.mid_channels,
                            num_blocks=cfg.num_blocks, dtype=dtype,
                            dcn_max_offset=cfg.dcn_max_offset,
                            warp_max_flow=cfg.warp_max_flow,
                            use_pallas=cfg.use_pallas,
                            dcn_tile_w=cfg.dcn_tile_w,
                            dcn_kernel=cfg.dcn_kernel,
                            conv_kernel=cfg.conv_kernel,
                            cascade_levels=cfg.cascade_levels,
                            fuse_project=cfg.fuse_project)
        self.vgg_layer_index = LAYER_INDEX[cfg.vgg_layer]
        # vgg_weight == 0 -> skip building/running VGG entirely
        self.vgg_module = (VGG16Features(max_stage=self.vgg_layer_index,
                                         dtype=dtype)
                           if cfg.vgg_weight > 0 else None)

        rng = jax.random.PRNGKey(cfg.seed)
        small = jnp.zeros((1, 64, 64, cfg.in_channels), jnp.float32)
        # jit the init: eager dispatch is minutes-slow through this
        # environment's remote TPU relay
        params = jax.jit(self.model.init)(rng, small, small)

        # Joint flow-estimator training activates the temporal term.
        self.flow_module = None
        if cfg.temporal_weight > 0 and cfg.train_flow_estimator:
            from vfi_tpu.models.flownet import SimpleFlowNet

            self.flow_module = SimpleFlowNet(
                mid_channels=cfg.flow_mid_channels, levels=cfg.flow_levels,
                dtype=dtype)
            flow_params = jax.jit(self.flow_module.init)(
                jax.random.PRNGKey(cfg.seed + 2), small, small)
            params = {"model": params, "flow": flow_params}
        if cfg.flow_prior and self.flow_module is None:
            raise ValueError(
                "flow_prior=true requires train_flow_estimator=true and "
                "temporal_weight > 0 — the prior network IS the jointly-"
                "trained flow estimator (models/prior.py)")

        # Warm-start (fine-tuning) from exported npz checkpoints: fresh
        # optimizer/epoch, pretrained weights. E.g. adapting a trained
        # checkpoint to flow_prior mode without retraining from scratch.
        def _load_init(path: str, like, what: str):
            loaded = jax.tree.map(jnp.asarray, load_params_npz(path))

            def chk(a, b):
                if a.shape != b.shape:
                    raise ValueError(
                        f"init_{what}_path {path!r}: shape {b.shape} does "
                        f"not match configured {what} param {a.shape} — "
                        "check mid_channels/num_blocks/flow_* settings")
                return b.astype(a.dtype)

            try:
                return jax.tree.map(chk, like, loaded)
            except ValueError as e:
                raise ValueError(
                    f"init_{what}_path {path!r} does not match the "
                    f"configured {what} params: {e}") from None

        if cfg.init_model_path:
            if self.flow_module is not None:
                params["model"] = _load_init(cfg.init_model_path,
                                             params["model"], "model")
            else:
                params = _load_init(cfg.init_model_path, params, "model")
        if cfg.init_flow_path:
            if self.flow_module is None:
                raise ValueError("init_flow_path requires "
                                 "train_flow_estimator=true")
            params["flow"] = _load_init(cfg.init_flow_path, params["flow"],
                                        "flow")
        if self.vgg_module is None:
            self.vgg_params = None
        elif cfg.vgg_weights_path:
            self.vgg_params = jax.tree.map(
                jnp.asarray, load_params_npz(cfg.vgg_weights_path))
        else:
            self.vgg_params = jax.jit(self.vgg_module.init)(
                jax.random.PRNGKey(cfg.seed + 1), small)

        self.state = create_train_state(params, cfg.learning_rate,
                                        cfg.weight_decay, cfg.grad_clip_norm)
        if cfg.lr_schedule == "cosine":
            self.scheduler = CosineScheduler(
                lr0=cfg.learning_rate, total=cfg.num_epochs,
                period=cfg.cosine_restart_period, min_lr=cfg.cosine_min_lr)
        elif cfg.lr_schedule == "plateau":
            self.scheduler = PlateauScheduler(lr=cfg.learning_rate,
                                              factor=cfg.plateau_factor,
                                              patience=cfg.plateau_patience,
                                              min_lr=cfg.plateau_min_lr)
        else:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r} "
                             "(expected 'plateau' or 'cosine')")
        self.weights = LossWeights(
            charbonnier=cfg.charbonnier_weight, vgg=cfg.vgg_weight,
            color=cfg.color_weight, gradient=cfg.gradient_weight,
            temporal=cfg.temporal_weight)
        if cfg.temporal_weight > 0 and self.flow_module is None:
            # Loud, unlike the reference's silent disable (train.py:72-80).
            print("[vfi_tpu] temporal_weight > 0 with train_flow_estimator "
                  "disabled — the temporal term is inactive (this matches "
                  "the reference's shipped behavior).")

        aug = AugmentConfig(
            crop_size=tuple(cfg.crop_size), random_rotation=cfg.random_rotation,
            horizontal_flip=cfg.horizontal_flip,
            brightness=cfg.color_jitter.brightness if cfg.color_jitter else 0.0,
            contrast=cfg.color_jitter.contrast if cfg.color_jitter else 0.0,
            saturation=cfg.color_jitter.saturation if cfg.color_jitter else 0.0,
            hue=cfg.color_jitter.hue if cfg.color_jitter else 0.0,
            color_jitter=cfg.color_jitter is not None,
            random_grayscale=cfg.random_grayscale,
            consistent_jitter=cfg.consistent_jitter)
        self.train_data = TripletDataset(cfg.train_data_dir, cfg.frame_interval, aug)
        # NOTE: the reference augments val identically to train
        # (train.py:53-59) making val loss noisy; we evaluate deterministic
        # center-crop-free full frames cropped to crop_size for speed.
        val_aug = AugmentConfig(crop_size=tuple(cfg.crop_size),
                                random_rotation=False, horizontal_flip=False,
                                color_jitter=False, random_grayscale=0.0)
        self.val_data = TripletDataset(cfg.val_data_dir, cfg.frame_interval, val_aug)
        self.train_loader = DataLoader(self.train_data, cfg.batch_size,
                                       shuffle=True, seed=cfg.seed)
        self.val_loader = DataLoader(self.val_data, cfg.batch_size,
                                     shuffle=False, seed=cfg.seed, drop_last=False)

        # jit with explicit shardings: state+vgg replicated, batch sharded.
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        raw_train = make_train_step(self.model, self.vgg_module,
                                    self.vgg_layer_index, self.weights,
                                    cfg.soft_histogram, remat=cfg.remat,
                                    flow_module=self.flow_module,
                                    target_unit_range=cfg.target_unit_range,
                                    flow_prior=cfg.flow_prior,
                                    flow_prior_scale=cfg.flow_prior_scale,
                                    accum_steps=cfg.accum_steps,
                                    flow_photo_pyramid=cfg.flow_photo_pyramid,
                                    flow_photo_occlusion=cfg.flow_photo_occlusion)
        self.train_step = jax.jit(
            raw_train,
            in_shardings=(rep, rep, bsh, bsh, bsh),
            out_shardings=(rep, rep),
            donate_argnums=(0,))
        raw_eval = make_eval_step(self.model, self.vgg_module,
                                  self.vgg_layer_index, self.weights,
                                  cfg.soft_histogram,
                                  target_unit_range=cfg.target_unit_range,
                                  flow_module=self.flow_module,
                                  flow_prior=cfg.flow_prior,
                                  flow_prior_scale=cfg.flow_prior_scale)
        self.eval_step = jax.jit(raw_eval,
                                 in_shardings=(rep, rep, bsh, bsh, bsh),
                                 out_shardings=rep)

        # epoch sample dumps (with the prior pre-warp when it's on, so the
        # samples show what the trained pipeline actually produces)
        if cfg.flow_prior:
            from vfi_tpu.models.prior import prior_prewarp

            def _sample(params, f0, f1):
                f1p, _ = prior_prewarp(
                    partial(self.flow_module.apply, params["flow"]), f0, f1,
                    scale=cfg.flow_prior_scale)
                return self.model.apply(params["model"], f0, f1p)

            self._sample_fwd = jax.jit(_sample)
        else:
            self._sample_fwd = jax.jit(self.model.apply)
        # params-tree accessor: joint flow training nests the model params
        self._model_params = ((lambda p: p["model"]) if self.flow_module
                              else (lambda p: p))
        # eval/sample input tree: flow-prior consumes the joint tree
        self._fwd_params = ((lambda p: p) if cfg.flow_prior
                            else self._model_params)
        # Parameter EMA (cfg.ema_decay > 0): a shadow tree updated on-device
        # after every step; validation/export then use the shadow. Kept
        # OUTSIDE TrainState so orbax checkpoints stay layout-compatible
        # with runs that predate the feature — persisted as a plain npz
        # alongside the orbax step (restored on resume when present).
        self.ema_params = None
        self._ema_update = None
        if cfg.ema_decay > 0.0:
            if not 0.0 < cfg.ema_decay < 1.0:
                raise ValueError(f"ema_decay must be in (0, 1), got "
                                 f"{cfg.ema_decay}")
            d = float(cfg.ema_decay)
            # jnp.copy, NOT asarray: asarray aliases the live param buffers,
            # and the donated train step would delete them out from under
            # the shadow on the first step (single-device CPU jit ignores
            # donation, so only multi-device meshes hit it).
            self.ema_params = jax.tree.map(jnp.copy, params)

            def _ema(ema, p):
                return jax.tree.map(lambda e, q: d * e + (1.0 - d) * q, ema, p)

            self._ema_update = jax.jit(_ema, donate_argnums=(0,),
                                       in_shardings=(rep, rep),
                                       out_shardings=rep)

        self.ckpt = CheckpointManager(cfg.checkpoint_path, keep=cfg.keep_checkpoints)
        self.start_epoch = 0
        self.best_val = float("inf")
        if cfg.resume and self.ckpt.latest_epoch() is not None:
            self.state, last_epoch = self.ckpt.restore(self.state, self.scheduler)
            self.start_epoch = last_epoch + 1
            # carry the best-val watermark across resumes, else the best-model
            # file could be overwritten by a worse post-resume epoch
            restored_best = float(self.ckpt.last_meta.get("best_val", float("nan")))
            # score spaces: best_metric=val_psnr stores -PSNR (negative),
            # val_loss stores the (non-negative) loss. If the run resumes
            # under a DIFFERENT best_metric than it was trained with, the
            # watermark is in the wrong space — e.g. val_loss 0.3 < -25.9
            # never fires, silently freezing best-model export. Detect the
            # mismatch by sign and reset the watermark instead.
            wrong_space = (restored_best < 0.0) != (cfg.best_metric == "val_psnr")
            if np.isfinite(restored_best) and not wrong_space:
                self.best_val = restored_best
            elif np.isfinite(restored_best):
                print("[vfi_tpu] best_val watermark from the checkpoint is in "
                      f"a different score space than best_metric={cfg.best_metric!r}"
                      " — resetting (first post-resume epoch becomes the best)")
            print(f"[vfi_tpu] resumed from epoch {last_epoch} "
                  f"(step {int(self.state.step)}, lr {self.scheduler.lr:.6f}, "
                  f"best val {self.best_val:.4f})")
            if self.ema_params is not None:
                ema_path = os.path.join(cfg.checkpoint_path, "ema_latest.npz")
                if os.path.exists(ema_path):
                    self.ema_params = jax.tree.map(
                        lambda a, b: jnp.asarray(b, a.dtype),
                        self.ema_params, load_params_npz(ema_path))
                else:  # EMA newly enabled on an old run: restart the shadow
                    self.ema_params = jax.tree.map(jnp.copy,
                                                   self.state.params)

        self.state = jax.device_put(self.state, rep)
        if self.ema_params is not None:
            self.ema_params = jax.device_put(self.ema_params, rep)
        self.vgg_params = jax.device_put(self.vgg_params, rep)
        os.makedirs(cfg.output_image_path, exist_ok=True)

    def _eval_tree(self):
        """Params used for validation / sample dumps / exports: the EMA
        shadow when enabled, the live params otherwise."""
        return (self.ema_params if self.ema_params is not None
                else self.state.params)

    def _save_ema(self):
        """Persist the EMA shadow next to the orbax step (plain npz keeps
        old-checkpoint layouts restorable; last-write-wins is fine — the
        shadow is a smooth function of recent steps)."""
        if self.ema_params is not None:
            from vfi_tpu.train.checkpoints import save_params_npz
            save_params_npz(self.ema_params,
                            os.path.join(self.cfg.checkpoint_path,
                                         "ema_latest.npz"))

    def _device_batches(self, loader):
        """Iterate a host loader with one batch of device-transfer lookahead:
        the next batch ships to the mesh while the current one computes.
        Remainder batches are padded (last sample replicated) to the full
        batch so shardings stay static; yields (device_batch, true_size)."""
        full = loader.batch_size

        def prep(host_batch):
            n = host_batch[0].shape[0]
            if n < full:
                host_batch = tuple(
                    np.concatenate([a, np.repeat(a[-1:], full - n, axis=0)])
                    for a in host_batch)
            return shard_batch(host_batch, self.mesh), n

        it = iter(loader)
        try:
            pending = prep(next(it))
        except StopIteration:
            return
        for host_batch in it:
            nxt = prep(host_batch)
            yield pending
            pending = nxt
        yield pending

    def _log_metrics(self, record: dict) -> None:
        """Append one JSON line per epoch to <checkpoint_path>/metrics.jsonl
        (machine-readable observability; the reference only has tqdm)."""
        import json

        path = os.path.join(self.cfg.checkpoint_path, "metrics.jsonl")
        os.makedirs(self.cfg.checkpoint_path, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _dump_sample(self, pred: jnp.ndarray, epoch: int) -> None:
        from PIL import Image

        img = denormalize_to_uint8(np.asarray(pred[0], np.float32))
        Image.fromarray(img).save(
            os.path.join(self.cfg.output_image_path,
                         f"epoch_{epoch + 1}_generated.png"))

    def run(self, num_epochs: Optional[int] = None,
            log: Callable[[str], None] = print) -> dict:
        cfg = self.cfg
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        history = {"train_loss": [], "val_loss": [], "psnr": [], "ssim": []}
        try:
            self._run_epochs(num_epochs, history, log)
        except KeyboardInterrupt:
            # failure containment the reference lacks: persist state so the
            # run is resumable from the interruption point
            log("[vfi_tpu] interrupted — saving checkpoint for resume")
            # index = the in-progress epoch (start_epoch + completed count);
            # a plain len(history) forgets the resume offset and collides
            # with an already-saved orbax step. Carry best_val so resume
            # keeps the best-model watermark instead of re-exporting a
            # worse checkpoint over <best_model_path>.npz.
            done = len(history["val_loss"])
            last_val = history["val_loss"][-1] if done else float("nan")
            self.ckpt.save(self.start_epoch + done, self.state, self.scheduler,
                           extra={"val_loss": last_val,
                                  "best_val": self.best_val})
            self._save_ema()
            self.ckpt.wait()
            raise
        return history

    def _run_epochs(self, num_epochs, history, log):
        cfg = self.cfg
        profile_started = False
        for epoch in range(self.start_epoch, num_epochs):
            if cfg.profile_dir and not profile_started:
                jax.profiler.start_trace(cfg.profile_dir)
                profile_started = True
            # ---- train ----
            t0 = time.time()
            running, nb = 0.0, 0
            self.train_loader.epoch = epoch
            for i, (batch, _) in enumerate(self._device_batches(self.train_loader)):
                self.state, metrics = self.train_step(self.state, self.vgg_params, *batch)
                if self._ema_update is not None:
                    self.ema_params = self._ema_update(self.ema_params,
                                                       self.state.params)
                running += float(metrics["loss"])
                nb += 1
                if i == 0:
                    pred = self._sample_fwd(self._fwd_params(self._eval_tree()),
                                            batch[0][:1], batch[2][:1])
                    self._dump_sample(np.asarray(pred), epoch)
                if i % cfg.log_every == 0:
                    terms = {k: round(float(v), 4) for k, v in metrics.items()}
                    log(f"[epoch {epoch + 1}/{num_epochs}] step {i}/{len(self.train_loader)} {terms}")
            train_loss = running / max(nb, 1)

            # ---- validate (weight remainder batches by their true size) ----
            # pin the val loader's epoch so val crops are identical across
            # epochs (deterministic val loss; the reference's val is as noisy
            # as train — SURVEY §3.1 note)
            self.val_loader.epoch = 0
            val_running, vp, vs, vn = 0.0, 0.0, 0.0, 0
            for batch, true_n in self._device_batches(self.val_loader):
                m = self.eval_step(self._fwd_params(self._eval_tree()),
                                   self.vgg_params, *batch)
                w = true_n
                val_running += float(m["loss"]) * w; vp += float(m["psnr"]) * w
                vs += float(m["ssim"]) * w; vn += w
            val_loss = val_running / max(vn, 1)
            val_psnr, val_ssim = vp / max(vn, 1), vs / max(vn, 1)
            dt = time.time() - t0
            log(f"[epoch {epoch + 1}/{num_epochs}] train {train_loss:.4f} "
                f"val {val_loss:.4f} PSNR {val_psnr:.2f} SSIM {val_ssim:.4f} "
                f"lr {self.scheduler.lr:.6f} ({dt:.1f}s)")
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            history["psnr"].append(val_psnr)
            history["ssim"].append(val_ssim)
            self._log_metrics({"epoch": epoch + 1, "train_loss": train_loss,
                               "val_loss": val_loss, "val_psnr": val_psnr,
                               "val_ssim": val_ssim, "lr": self.scheduler.lr,
                               "seconds": round(dt, 2),
                               "step": int(self.state.step)})

            # ---- best-model save (actually gated, unlike train.py:180-182) ----
            # Gate on the configured metric. The reference gates on val loss;
            # but the multi-term loss on augmented val crops can drift UP
            # while PSNR/SSIM improve (observed: round-2 EMA fine-tune, val
            # loss 0.290->0.298 over 50 epochs with PSNR +0.06 dB), so
            # quality runs can gate on val PSNR instead (best_metric).
            score = -val_psnr if self.cfg.best_metric == "val_psnr" else val_loss
            if score < self.best_val:
                self.best_val = score
                from vfi_tpu.train.checkpoints import save_params_npz
                save_params_npz(self._model_params(self._eval_tree()),
                                cfg.best_model_path + ".npz")
                if self.flow_module is not None:
                    # jointly-trained flow estimator: exported alongside so
                    # `eval.py --gt_flow_dir` can score it against the
                    # bundled Middlebury GT .flo fields
                    save_params_npz(self._eval_tree()["flow"],
                                    cfg.best_model_path + ".flow.npz")
                what = (f"val PSNR {val_psnr:.3f}"
                        if cfg.best_metric == "val_psnr"
                        else f"val loss {val_loss:.4f}")
                log(f"  new best {what} -> {cfg.best_model_path}.npz")

            if cfg.snapshot_every > 0 and (epoch + 1) % cfg.snapshot_every == 0:
                from vfi_tpu.train.checkpoints import save_params_npz
                snap_dir = os.path.join(cfg.checkpoint_path, "snapshots")
                os.makedirs(snap_dir, exist_ok=True)
                save_params_npz(self._model_params(self._eval_tree()),
                                os.path.join(snap_dir, f"epoch_{epoch + 1}.npz"))

            # ---- schedule + checkpoint ----
            new_lr = self.scheduler.step(val_loss)
            self.state = set_learning_rate(self.state, new_lr)
            self.ckpt.save(epoch, self.state, self.scheduler,
                           extra={"val_loss": val_loss, "best_val": self.best_val})
            self._save_ema()
        if profile_started:
            jax.profiler.stop_trace()
        self.ckpt.wait()
        return history
