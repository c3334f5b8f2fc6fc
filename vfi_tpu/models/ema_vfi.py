"""EMAVFI — the flagship two-frame video-frame-interpolation model.

A stage-for-stage TPU-native (NHWC, Flax) re-design of the reference's
`EMA_VFI` CNN (reference: src/models/ema_vfi.py:63-171). Parity-relevant
behaviors preserved:

- Stage structure and channel plan: feature extraction (2*C_in -> M, then
  `num_blocks` M->M blocks, ema_vfi.py:73-76), context encoding
  (M->2M s2 ->4M s2 ->4M -> global-avg-pool -> dense 4M->M, :79-86), motion
  estimation on cat(feat, broadcast ctx) (2M->M->M->2 flow, :89-93),
  bilinear backward warp of *frame2 RGB* by the flow (:130, 149-170),
  `num_blocks` modulated deformable convs on cat(feat, warped) at M+C_in
  channels (:96-99, 134-138), reconstruction M+C_in->M->M/2->C_in with tanh
  then (x+1)/2 (:102-107, 144-146).
- The flow tensor's channels are (dx, dy) — channel 0 displaces x —
  matching the reference's grid construction (:153-162).
- Deformable blocks keep channels (the reference's out_channels==in_channels
  quirk, :27) and use a single offset group (its `deformable_groups = 8` is
  dead code, :70).

TPU-first choices (not in the reference):
- NHWC layout end-to-end; every conv is an XLA MXU matmul over the 128-lane
  channel dimension.
- Optional bfloat16 activation compute (`dtype=jnp.bfloat16`) with float32
  params.
- All control flow static: safe under jit / pjit / shard_map, any mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from vfi_tpu.models.layers import (ConvBlock, ConvBlockParams,
                                   ModulatedDeformConv, apply_conv_chain,
                                   torch_bias_init, torch_kernel_init)
from vfi_tpu.ops.resize import resize_bilinear
from vfi_tpu.ops.warp import warp


class EMAVFI(nn.Module):
    """Two-frame midpoint interpolation CNN (~1.43M params at defaults).

    Call: ``model.apply(params, frame1, frame2)`` with NHWC frames
    (B, H, W, in_channels); returns the predicted middle frame in [0, 1].
    """

    in_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 3
    dtype: Optional[Any] = None
    # TPU fast path for the fusion DCNs: clamp learned offsets to [-R, R]
    # pixels and sample gather-free (ops/deform_conv_shifts.py). None keeps
    # the exact unbounded torchvision semantics (needed for converted-
    # checkpoint parity; ~10x slower on TPU). Trained offsets in this
    # architecture are zero-initialized and stay small, so a modest R is
    # numerically identical in practice.
    dcn_max_offset: Optional[int] = None
    # Bound the backward-warp flow to [-R, R] px and use the fused Pallas
    # warp. None = exact unbounded grid_sample-style warp.
    warp_max_flow: Optional[int] = None
    # Run bounded sampling through the Pallas kernels (fused, single HBM
    # read) instead of the XLA shift decomposition. Same numerics.
    use_pallas: bool = False
    # Self-cascade depth (>= 1). At k > 1 the model runs its OWN motion
    # stages (feature extraction + context + motion estimation, shared
    # weights) on 2^(k-1)..2x-downsampled copies of the pair coarse-to-fine;
    # each level's flow is upsampled (magnitude-rescaled) and applied as an
    # exact unbounded pre-warp of frame2 before the next-finer level — the
    # composition semantics of models/prior.py, but with the trained motion
    # estimator instead of SimpleFlowNet. Halving resolution halves apparent
    # motion, so large displacements fall back inside the stride-1 trunk's
    # receptive field (the measured Grove/Mequon ceiling — docs/
    # PERFORMANCE.md "Scale-adaptive inference") while the finest level
    # keeps full detail. The parameter tree is INDEPENDENT of
    # cascade_levels: checkpoints trained at k=1 warm-start k=2 directly.
    # Extra cost for k=2: one stages-1..3 pass at quarter area (~15% of a
    # forward). Under manual spatial sharding the coarse pass + pre-warp
    # run globally via all_gather (exact; see the cascade loop).
    cascade_levels: int = 1
    # TPU lane-alignment variant: 1x1-project the fusion concat
    # cat(feat M, warped C_in) = M + C_in channels (67 at defaults —
    # reference src/models/ema_vfi.py:96-99) down to M channels BEFORE the
    # deformable stack, so every DCN sample buffer, blend and matmul runs
    # at a power-of-two channel count (M=64) instead of 67. 67 and 64 both
    # pad to 128 lanes in isolation, but 64 enables dense layouts
    # (sublane-major kernels, packed reshapes) and removes the odd-channel
    # relayout copies XLA inserts around the custom DCN ops. The projection
    # is linear (no ReLU) so a converted 67-channel checkpoint can be
    # warm-started near-losslessly (tools/project_checkpoint.py).
    # Changes the parameter tree: NOT checkpoint-compatible with the
    # reference topology; off by default.
    fuse_project: bool = False
    # Pallas DCN kernel generation with use_pallas: "v4" (lane-major
    # production kernel) or "v5" (transposed layout, lane-dense at any
    # channel count — pairs naturally with fuse_project). Per-layer
    # fallback to v4/shifts when infeasible.
    dcn_kernel: str = "v4"
    # Conv trunk kernel: "xla" lowers every ConvBlock through
    # lax.conv_general_dilated; "pallas" routes the stride-1 odd-k blocks
    # (feature extraction, motion estimation, reconstruction, ctx_conv3 —
    # the ~62 ms/frame at 720p this toolchain's conv emitter spends at ~8%
    # MFU, docs/PERFORMANCE.md roofline) through the fused Pallas conv
    # kernel (ops/pallas/conv.py). Same params and numerics to bf16
    # rounding; per-shape fallback to XLA when infeasible.
    conv_kernel: str = "xla"
    # Explicit column-tile width for the Pallas DCN kernels (None = auto).
    # Real trained offsets are spatially heterogeneous, so per-tile skip
    # predicates drop ~15% of (tap, shift) pair work that full-width
    # bounds cannot (256 at 720p: ~8-18%/layer measured, bit-identical;
    # docs/PERFORMANCE.md "Column-tiled predicates"). Silently ignored for
    # input widths it does not divide.
    dcn_tile_w: Optional[int] = None
    # --- manual spatial (H) sharding, for use inside jax.shard_map ---
    # When `spatial_axis` is set, the inputs are halo-extended H-slabs of a
    # globally `spatial_global_h`-row image (slab row 0 = global row
    # s*H_local - spatial_halo for shard s): every row-mixing stage masks
    # out-of-image rows to zero (reproducing the single-device zero-padding
    # semantics exactly) and the context global-average-pool becomes a
    # masked owned-rows pool + psum over the axis. The caller slices the
    # center H_local rows of the output. See vfi_tpu/parallel/spatial.py,
    # which owns the halo-size/divisibility contract.
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0
    spatial_global_h: Optional[int] = None

    def _row_tools(self):
        """Spatial-mode helpers: (mask, owner_mask). `mask(x, scale)` zeroes
        slab rows outside the global image at full resolution (scale 1) or a
        ctx stride (2, 4) — out-of-image rows must read as exact zeros so
        each following layer sees the single-device zero-padding semantics.
        `owner_mask(x, scale)` additionally keeps only the rows THIS shard
        owns (disjoint partition of the global image across shards), for the
        pooled-context reduction."""
        import jax
        from jax import lax

        s = lax.axis_index(self.spatial_axis)
        n = lax.axis_size(self.spatial_axis)
        h_local = self.spatial_global_h // n
        origin = s * h_local - self.spatial_halo  # global row of slab row 0

        def _valid(x, scale, lo, hi):
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1, 1), 1)
            g = rows + origin // scale
            return x * ((g >= lo) & (g < hi)).astype(x.dtype)

        def mask(x: jnp.ndarray, scale: int = 1) -> jnp.ndarray:
            return _valid(x, scale, 0, self.spatial_global_h // scale)

        def owner_mask(x: jnp.ndarray, scale: int) -> jnp.ndarray:
            return _valid(x, scale, s * (h_local // scale),
                          (s + 1) * (h_local // scale))

        return mask, owner_mask

    @nn.compact
    def __call__(self, frame1: jnp.ndarray, frame2: jnp.ndarray) -> jnp.ndarray:
        m = self.mid_channels
        dt = self.dtype
        compute_dtype = dt or frame1.dtype
        f1 = frame1.astype(compute_dtype)
        f2 = frame2.astype(compute_dtype)

        if self.cascade_levels < 1:
            raise ValueError(f"cascade_levels must be >= 1, got "
                             f"{self.cascade_levels}")
        if self.spatial_axis is not None:
            mask, owner_mask = self._row_tools()
            f1, f2 = mask(f1), mask(f2)
        else:
            mask = lambda x, scale=1: x  # noqa: E731 — identity off-mesh
            owner_mask = None

        # Submodules are created ONCE and applied at every cascade scale —
        # Flax shares the parameters across calls, so the parameter tree
        # (names and shapes) is identical for every cascade_levels value.
        pc = self.conv_kernel == "pallas"
        # Fused-chain mode: the stride-1 trunk stages (feature blocks,
        # motion estimation, reconstruction) each run as ONE fused Pallas
        # kernel over explicit parameters (identical tree — see
        # ConvBlockParams). Off under manual spatial sharding, whose
        # per-layer row masks the fused kernel does not reproduce.
        fused_mode = pc and self.spatial_axis is None
        # 6-channel input conv: the packed kernel does not support C=6 and
        # the v1 kernel measures slower than XLA there — keep XLA.
        feat_conv1 = ConvBlock(m, dtype=dt, name="feat_ext_conv1")
        if fused_mode:
            feat_blocks_p = [ConvBlockParams(m, name=f"feat_ext_block{i}")
                             for i in range(self.num_blocks)]
        else:
            feat_blocks = [ConvBlock(m, dtype=dt, use_pallas=pc,
                                     name=f"feat_ext_block{i}")
                           for i in range(self.num_blocks)]
        ctx_conv1 = ConvBlock(2 * m, stride=2, dtype=dt, name="ctx_conv1")
        ctx_conv2 = ConvBlock(4 * m, stride=2, dtype=dt, name="ctx_conv2")
        ctx_conv3 = ConvBlock(4 * m, dtype=dt, name="ctx_conv3")
        ctx_dense = nn.Dense(
            m,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init((4 * m, m)),
            dtype=dt,
            param_dtype=jnp.float32,
            name="ctx_dense",
        )
        if fused_mode:
            motion_p = [ConvBlockParams(m, name="motion_conv1"),
                        ConvBlockParams(m, name="motion_conv2"),
                        ConvBlockParams(2, name="motion_conv3")]
        else:
            motion_conv1 = ConvBlock(m, dtype=dt, use_pallas=pc,
                                     name="motion_conv1")
            motion_conv2 = ConvBlock(m, dtype=dt, use_pallas=pc,
                                     name="motion_conv2")
            motion_conv3 = ConvBlock(2, act=False, dtype=dt, use_pallas=pc,
                                     name="motion_conv3")

        def motion_stages(a, b2, mask=mask, sharded=None):
            """Stages 1-3 (feature extraction, context encoding, motion
            estimation) on a frame pair -> (features, dense flow).

            `mask`/`sharded` default to the instance's spatial mode; the
            cascade's coarse pass under spatial sharding overrides them
            (identity mask, sharded=False) because it runs on the GLOBAL
            gathered pair, replicated on every shard."""
            if sharded is None:
                sharded = self.spatial_axis is not None
            # 1. Feature extraction (stride-1 trunk at this scale).
            feat = jnp.concatenate([a, b2], axis=-1)
            feat = mask(feat_conv1(feat))
            if fused_mode:
                kbs = [p(m) for p in feat_blocks_p]
                feat = apply_conv_chain(feat, kbs,
                                        (True,) * self.num_blocks, dt)
            else:
                for blk in feat_blocks:
                    feat = mask(blk(feat))

            # 2. Context encoding -> one global M-dim vector per pair.
            ctx = mask(ctx_conv1(feat), 2)
            ctx = mask(ctx_conv2(ctx), 4)
            ctx = ctx_conv3(ctx)
            if sharded:
                # Exact global average pool across shards: sum the rows this
                # shard owns (each computed exactly thanks to the halo), psum
                # over the axis, divide by the global pooled extent.
                import jax

                pooled = jnp.sum(owner_mask(ctx, 4), axis=(1, 2))
                pooled = jax.lax.psum(pooled, self.spatial_axis)
                count = (self.spatial_global_h // 4) * ctx.shape[2]
                ctx = pooled / jnp.asarray(count, pooled.dtype)
            else:
                ctx = jnp.mean(ctx, axis=(1, 2))  # global avg pool -> (B, 4M)
            ctx = ctx_dense(ctx)

            # 3. Motion estimation: features + broadcast context -> flow.
            b, h, w, _ = feat.shape
            ctx_map = jnp.broadcast_to(ctx[:, None, None, :], (b, h, w, m))
            # (spatial mode: the broadcast ctx is nonzero on out-of-image
            # slab rows — mask the concatenation so conv padding matches)
            flow = mask(jnp.concatenate([feat, ctx_map], axis=-1))
            if fused_mode:
                kbs = [motion_p[0](2 * m), motion_p[1](m), motion_p[2](m)]
                flow = apply_conv_chain(flow, kbs, (True, True, False), dt)
            else:
                flow = mask(motion_conv1(flow))
                flow = mask(motion_conv2(flow))
                flow = mask(motion_conv3(flow))
            return feat, flow

        # 0. Self-cascade coarse-to-fine prior: run the motion stages on
        #    downsampled copies (shared weights), upsample each level's flow
        #    (per-axis magnitude rescale), and pre-warp frame2 by it with the
        #    exact unbounded warp — the prior can be large; the bounded fast
        #    paths below only ever see the small residual.
        #
        #    Under manual spatial sharding the coarse pass and the pre-warp
        #    are GLOBAL: each shard all_gathers the owned rows (cheap at
        #    1/4-area coarse scales; the full-res gather for the pre-warp is
        #    one frame over ICI), computes the identical global coarse flow,
        #    warps the global frame2, and re-slices its own halo slab — the
        #    unbounded pre-warp therefore keeps exact single-device
        #    semantics (a halo could never bound it).
        if self.spatial_axis is not None:
            import jax
            from jax import lax

            n_sp = lax.axis_size(self.spatial_axis)
            h_local = self.spatial_global_h // n_sp
            s_idx = lax.axis_index(self.spatial_axis)

            def gather_global(x):
                owned = lax.dynamic_slice_in_dim(
                    x, self.spatial_halo, h_local, axis=1)
                return lax.all_gather(owned, self.spatial_axis, axis=1,
                                      tiled=True)

            def reslab(xg):
                padded = jnp.pad(xg, ((0, 0),
                                      (self.spatial_halo, self.spatial_halo),
                                      (0, 0), (0, 0)))
                return lax.dynamic_slice_in_dim(
                    padded, s_idx * h_local,
                    h_local + 2 * self.spatial_halo, axis=1)

            h_full, w_full = self.spatial_global_h, f1.shape[2]
        else:
            gather_global = reslab = None
            h_full, w_full = f1.shape[1], f1.shape[2]
        for lvl in range(self.cascade_levels - 1, 0, -1):
            s = 2 ** lvl
            ch, cw = -(-h_full // s), -(-w_full // s)  # ceil: any input size
            if self.spatial_axis is not None:
                g1, g2 = gather_global(f1), gather_global(f2)
            else:
                g1, g2 = f1, f2
            c1 = resize_bilinear(g1, (ch, cw))
            c2 = resize_bilinear(g2, (ch, cw))
            _, cflow = motion_stages(c1, c2,
                                     mask=lambda x, scale=1: x, sharded=False)
            # flow coordinates need sub-pixel precision at large magnitudes:
            # upsample + rescale in f32 (bf16 ulp at 16 px is 0.0625 px)
            up = resize_bilinear(cflow.astype(jnp.float32), (h_full, w_full))
            scale_vec = jnp.asarray([w_full / cw, h_full / ch], jnp.float32)
            warped_g2 = warp(g2, up * scale_vec, mode="bilinear")
            if self.spatial_axis is not None:
                f2 = mask(reslab(warped_g2))
            else:
                f2 = warped_g2

        feat, flow = motion_stages(f1, f2)

        # 4. Backward-warp frame2 (RGB) by the flow; bilinear, zeros padding,
        #    align_corners=True semantics.
        use_pallas_warp = False
        if self.warp_max_flow is not None and self.use_pallas:
            from vfi_tpu.ops.pallas.sampling import (
                pallas_backend_supported, pallas_warp_v2_feasible)

            use_pallas_warp = pallas_backend_supported() and (
                pallas_warp_v2_feasible(
                    f2.shape[1], f2.shape[2], f2.shape[3],
                    self.warp_max_flow, jnp.dtype(compute_dtype).itemsize))
        if use_pallas_warp:
            from vfi_tpu.ops.pallas.wrappers import warp_fast

            warped2 = warp_fast(f2, flow, self.warp_max_flow)
        elif self.warp_max_flow is not None:
            warped2 = warp(f2, jnp.clip(flow, -self.warp_max_flow,
                                        self.warp_max_flow), mode="bilinear")
        else:
            warped2 = warp(f2, flow, mode="bilinear")

        # 5. Fusion: deformable conv stack over cat(features, warped frame).
        fused = mask(jnp.concatenate([feat, warped2], axis=-1))
        if self.fuse_project:
            # Lane-alignment projection (see the field docstring): linear
            # 1x1 to M channels; the DCN stack below then runs lane-dense.
            fused = mask(ConvBlock(m, kernel_size=1, padding=0, act=False,
                                   dtype=dt, name="fuse_proj")(fused))
            fused_ch = m
        else:
            fused_ch = m + self.in_channels
        for i in range(self.num_blocks):
            fused = mask(ModulatedDeformConv(fused_ch, dtype=dt,
                                             max_offset=self.dcn_max_offset,
                                             use_pallas=self.use_pallas,
                                             tile_w=self.dcn_tile_w,
                                             pallas_kernel=self.dcn_kernel,
                                             conv_kernel=self.conv_kernel,
                                             name=f"fusion_dcn{i}")(fused))

        # 6. Reconstruction head -> [0, 1] frame.
        if fused_mode:
            rec_kbs = [ConvBlockParams(m, name="rec_conv1")(fused_ch),
                       ConvBlockParams(m // 2, name="rec_conv2")(m),
                       ConvBlockParams(self.in_channels,
                                       name="rec_conv3")(m // 2)]
            out = apply_conv_chain(fused, rec_kbs, (True, True, False), dt)
        else:
            out = mask(ConvBlock(m, dtype=dt, use_pallas=pc,
                                 name="rec_conv1")(fused))
            out = mask(ConvBlock(m // 2, dtype=dt, use_pallas=pc,
                                 name="rec_conv2")(out))
            out = ConvBlock(self.in_channels, act=False, dtype=dt,
                            use_pallas=pc, name="rec_conv3")(out)
        out = jnp.tanh(out)
        return ((out + 1.0) * 0.5).astype(jnp.promote_types(frame1.dtype, jnp.float32))
