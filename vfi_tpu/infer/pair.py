"""Frame-pair interpolation engine.

Wraps the model in a jit'd, batched pipeline:

- inputs are [0,1] RGB, NHWC; normalization to the model's training
  convention (ImageNet stats, reference train.py:40-43) happens on-device
  inside the jit graph, so the host only ever ships uint8-scaled frames;
- `midpoints` inserts 1 frame per pair; `recursive` inserts 2^k - 1 by
  repeated bisection — a real temporal hierarchy, unlike the reference which
  re-emits the SAME midpoint `factor` times (its `alpha` is computed and
  never used, reference inference.py:173-177);
- `reference_compat=True` reproduces the duplicate-midpoint behavior for
  output parity with the reference CLI;
- batch over a ('data',) mesh: pairs shard across chips (BASELINE config 5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfi_tpu.models import EMAVFI
from vfi_tpu.parallel import batch_sharding, make_mesh, replicated

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def pick_interpolation_factor(src_fps: float, target_fps: Optional[float],
                              max_factor: int = 4) -> tuple[int, float]:
    """Reference's factor selection (inference.py:101-124).

    auto mode (target None): argmin over f in [1, max] of |fps*(f+1) - 60|;
    manual: round(target/src - 1) clamped to [1, max]; actual output fps is
    src*(factor+1). Returns (factor, output_fps).
    """
    if target_fps is None:
        best_f, best_err = 1, float("inf")
        for f in range(1, max_factor + 1):
            err = abs(src_fps * (f + 1) - 60.0)
            if err < best_err:
                best_f, best_err = f, err
        factor = best_f
    else:
        factor = int(round(target_fps / src_fps - 1))
        factor = max(1, min(factor, max_factor))
    return factor, src_fps * (factor + 1)


class FrameInterpolator:
    """Batched two-frame interpolator with a persistent jit cache.

    Args:
      params: Flax params for EMAVFI ({'params': ...}).
      mesh: optional Mesh for data-parallel batch inference; default single
        ('data',) mesh over all visible devices.
    """

    def __init__(self, params, in_channels: Optional[int] = None,
                 mid_channels: Optional[int] = None,
                 num_blocks: Optional[int] = None, bf16: bool = True,
                 mesh=None, reference_compat: bool = False,
                 dcn_max_offset: Optional[int] = None,
                 warp_max_flow: Optional[int] = None,
                 use_pallas: bool = False,
                 dcn_tile_w: Optional[int] = None,
                 dcn_kernel: str = "v4",
                 conv_kernel: str = "xla",
                 spatial: bool = False,
                 flow_params=None,
                 flow_prior_scale: float = 0.5,
                 flow_mid_channels: int = 32,
                 flow_levels: int = 3,
                 tta: bool = False,
                 io_uint8: bool = False,
                 auto_scale: Optional[float] = None,
                 cascade_levels: int = 1,
                 max_px_per_launch="auto"):
        """`spatial=True` additionally shards frame height over the mesh's
        'spatial' axis (single-clip 1080p/4K mode; XLA inserts the conv/
        shift halo exchanges — see tests/test_parallel.py).

        `flow_params` (a SimpleFlowNet tree, e.g. loaded from the trainer's
        `<best>.flow.npz`) enables flow-prior inference: frame1 is
        pre-warped halfway along the estimated flow before the main model
        (models/prior.py, the large-motion lever). Only valid on checkpoints
        TRAINED with flow_prior — the pre-warp changes the input
        distribution. Not supported together with `spatial` sharding (the
        pyramid flow net is global).

        `tta=True` averages the prediction over 4 symmetry-transformed
        forwards inside one jit graph — identity, horizontal flip, vertical
        flip, and temporal swap (the midpoint of (f1, f0) is the midpoint of
        (f0, f1)) — each inverse-transformed back before averaging. ~4x the
        compute for a fraction-of-a-dB PSNR gain; an inference-time quality
        lever the reference does not have. Composes with flow_prior (the
        prior net sees the transformed pair, so its flow is consistent) and
        with DP batch sharding; not with manual `spatial` sharding.

        `io_uint8=True` moves the u8<->float conversion onto the device:
        `midpoints` then takes and returns uint8 [0,255] frames, quartering
        host<->device transfer bytes (the dominant per-request cost through
        a relay-attached TPU — docs/PERFORMANCE.md "Serving"). Numerically
        identical to host-side conversion for u8-sourced frames (PNG/video
        decode), which is every serving input.

        `cascade_levels` > 1 enables the model's self-cascade: its own
        motion stages run coarse-to-fine on downsampled copies (shared
        weights) and pre-warp frame2 by each level's upsampled flow inside
        the jit graph — the trained, per-pixel counterpart of the binary
        `auto_scale` switch. Only valid on checkpoints FINE-TUNED with the
        matching cascade_levels (the pre-warp changes the fine level's input
        distribution). Not supported with `spatial` sharding.

        `auto_scale=<pixels>` enables scale-adaptive inference: per
        `midpoints` call, the SimpleFlowNet estimates the pair's flow and,
        when the 95th-percentile magnitude exceeds the threshold, the model
        runs on 2x-downsampled frames and the midpoint is upsampled back.
        Halving the resolution halves the apparent motion — large-motion
        content moves back inside the stride-1 trunk's receptive field (the
        measured Grove/Urban ceiling, docs/PERFORMANCE.md "Scale-adaptive
        inference"), while small-motion content keeps the full-detail
        native path. Requires `flow_params`; probe cost is one flow-net
        forward (~2% of a full forward)."""
        from vfi_tpu.utils.convert import infer_model_dims

        if flow_params is not None and spatial:
            raise ValueError("flow-prior inference is not supported with "
                             "spatial sharding (global pyramid flow)")
        if io_uint8 and spatial:
            raise ValueError("io_uint8 is not supported with spatial "
                             "sharding (the halo pipeline is float-typed)")
        if auto_scale is not None and flow_params is None:
            raise ValueError("auto_scale needs flow_params (the flow "
                             "estimator provides the motion-magnitude probe)")
        if auto_scale is not None and io_uint8:
            raise ValueError("auto_scale is not supported with io_uint8")
        self._auto_scale = auto_scale
        # routing observability: per-call probe values + scaled-path count
        self.auto_scale_stats = {"probes": [], "scaled": 0}
        self.io_dtype = np.uint8 if io_uint8 else np.float32
        # Graph-aware HBM guard: the flow-prior graph (pyramid estimator +
        # prewarp + model in one jit) holds far more live full-res tensors
        # than the plain forward — hardware-bisected at 1080p: plain b4
        # (8.3M px) runs, flow-prior b3 (6.2M px) CRASHES the TPU worker
        # while b2 (4.1M px) runs (round 3, docs/PERFORMANCE.md "1080p
        # worker-crash bisection"). The default is the sentinel "auto"
        # (resolved here to 8M plain / 4M flow-prior / halved for TTA) so
        # ANY explicit integer — including 8_000_000 itself — is honored
        # verbatim; None disables the guard.
        if max_px_per_launch == "auto":
            max_px_per_launch = 8_000_000
            if flow_params is not None:
                max_px_per_launch = 4_000_000
            if tta:
                max_px_per_launch //= 2
        self.max_px_per_launch = max_px_per_launch
        dims = infer_model_dims(params)
        self.model = EMAVFI(
            in_channels=in_channels if in_channels is not None else dims["in_channels"],
            mid_channels=mid_channels if mid_channels is not None else dims["mid_channels"],
            num_blocks=num_blocks if num_blocks is not None else dims["num_blocks"],
            dtype=jnp.bfloat16 if bf16 else None,
            dcn_max_offset=dcn_max_offset, warp_max_flow=warp_max_flow,
            use_pallas=use_pallas, dcn_tile_w=dcn_tile_w,
            dcn_kernel=dcn_kernel, conv_kernel=conv_kernel,
            cascade_levels=cascade_levels,
            # auto-detected off the tree (utils/convert.infer_model_dims):
            # checkpoints carry their own topology, no side-channel flag.
            fuse_project=dims.get("fuse_project", False))
        self.mesh = mesh if mesh is not None else make_mesh()
        self.reference_compat = reference_compat
        rep = replicated(self.mesh)
        if spatial:
            from vfi_tpu.parallel import spatial_sharding

            bsh = spatial_sharding(self.mesh)
        else:
            bsh = batch_sharding(self.mesh)
        self.flow_module = None
        tree = jax.tree.map(jnp.asarray, params)
        if flow_params is not None:
            from vfi_tpu.models.flownet import SimpleFlowNet

            self.flow_module = SimpleFlowNet(
                mid_channels=flow_mid_channels, levels=flow_levels,
                dtype=jnp.bfloat16 if bf16 else None)
            # joint tree so the flow params ride the jit argument (not a
            # baked-in graph constant)
            tree = {"model": tree,
                    "flow": jax.tree.map(jnp.asarray, flow_params)}
        self.params = jax.device_put(tree, rep)

        def single(p, f0, f1):
            mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3)
            std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3)
            n0 = (f0 - mean) / std
            n1 = (f1 - mean) / std
            if self.flow_module is not None:
                from vfi_tpu.models.prior import prior_prewarp

                n1, _ = prior_prewarp(
                    partial(self.flow_module.apply, p["flow"]),
                    n0, n1, scale=flow_prior_scale)
                p = p["model"]
            return self.model.apply(p, n0, n1)

        if tta:
            if spatial:
                raise ValueError("tta is not supported with spatial sharding")
            # (transform, inverse) pairs; flips commute with the per-channel
            # normalize so they apply to the raw [0,1] frames.
            syms = (
                (lambda a, b: (a, b), lambda o: o),
                (lambda a, b: (jnp.flip(a, 2), jnp.flip(b, 2)),
                 lambda o: jnp.flip(o, 2)),
                (lambda a, b: (jnp.flip(a, 1), jnp.flip(b, 1)),
                 lambda o: jnp.flip(o, 1)),
                (lambda a, b: (b, a), lambda o: o),
            )

            def fwd(p, f0, f1):
                outs = [inv(single(p, *tf(f0, f1))) for tf, inv in syms]
                # mean in f32: the branches are bf16 under the default policy
                return jnp.mean(jnp.stack([o.astype(jnp.float32)
                                           for o in outs]), axis=0)
        else:
            fwd = single

        if io_uint8:
            # u8 in, u8 out: both conversions live inside the jit graph so
            # the wire/relay only ever carries one byte per channel.
            inner_fwd = fwd

            def fwd(p, f0, f1):
                out = inner_fwd(p, f0.astype(jnp.float32) / 255.0,
                                f1.astype(jnp.float32) / 255.0)
                return jnp.clip(out.astype(jnp.float32) * 255.0 + 0.5,
                                0.0, 255.0).astype(jnp.uint8)

        n_data = self.mesh.shape["data"]
        self._spatial_manual = bool(
            spatial and use_pallas and self.mesh.shape["spatial"] > 1)
        self._spatial_fwd_cache: dict = {}
        if use_pallas and not spatial and n_data > 1:
            # Pallas custom calls have no GSPMD partitioning rule, so the
            # data-parallel batch axis is mapped explicitly: each chip runs
            # the kernels on its local shard (params replicated). H-sharding
            # uses GSPMD halo insertion on the XLA ops path, or — with
            # use_pallas — the manual halo-exchange shard_map pipeline
            # (parallel/spatial.py), built per frame height in `midpoints`.
            from jax.sharding import PartitionSpec as P

            fwd = jax.shard_map(fwd, mesh=self.mesh,
                                in_specs=(P(), P("data"), P("data")),
                                out_specs=P("data"), check_vma=False)
        self._fwd = jax.jit(fwd, in_shardings=(rep, bsh, bsh),
                            out_shardings=bsh)

        if auto_scale is not None:
            # Motion-magnitude probe for scale-adaptive inference: p95 of
            # the estimator's flow over the (normalized) batch. Scalar out,
            # decided host-side per midpoints() call — two static graphs
            # (native + half-res), no data-dependent shapes inside jit.
            def p95_flow(p, f0, f1):
                n0, n1 = self._normalize(f0), self._normalize(f1)
                fl = self.flow_module.apply(p["flow"], n0, n1)
                mag = jnp.sqrt(jnp.square(fl[..., 0]) + jnp.square(fl[..., 1]))
                return jnp.percentile(mag.astype(jnp.float32), 95.0)

            from vfi_tpu.ops.resize import resize_bilinear as _rb

            self._flow_p95 = jax.jit(p95_flow, in_shardings=(rep, bsh, bsh))
            self._resize = jax.jit(_rb, static_argnums=1)

    @staticmethod
    def _normalize(f):
        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 1, 1, 3)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 1, 1, 3)
        return (f - mean) / std

    def _spatial_pallas_fwd(self, global_h: int):
        """Per-height cache of the manual halo-exchange spatial forward."""
        fn = self._spatial_fwd_cache.get(global_h)
        if fn is None:
            from vfi_tpu.parallel.spatial import build_spatial_forward

            fn = build_spatial_forward(self.model, self.mesh, global_h,
                                       preprocess=self._normalize)
            self._spatial_fwd_cache[global_h] = fn
        return fn

    def midpoints_sequence(self, frames) -> jnp.ndarray:
        """Predict the midpoints of every CONSECUTIVE pair of an (N+1, H,
        W, 3) frame sequence -> (N, H, W, 3).

        The point is transfer, not compute: video workloads feed each
        interior frame to TWO pairs, so `midpoints(frames[:-1],
        frames[1:])` ships every frame twice over the host<->TPU relay —
        the measured serving bottleneck (~2 s per 720p item is bandwidth;
        docs/PERFORMANCE.md "Serving"). Here the sequence is transferred
        ONCE and the pair views are sliced on-device inside the jit graph,
        halving relay bytes for n >> 1. Same numerics as midpoints().
        """
        n1 = frames.shape[0]
        if n1 < 2:
            raise ValueError("midpoints_sequence needs >= 2 frames")
        # The HBM guard still applies: frames beyond the per-launch pixel
        # budget fall back to chunked midpoints() (shipping the chunk
        # boundaries twice — one frame per chunk, negligible).
        px = frames.shape[1] * frames.shape[2]
        if (self.max_px_per_launch is not None
                and n1 * px > self.max_px_per_launch):
            if 2 * px > self.max_px_per_launch:
                # Even one pair exceeds the budget: chunking by frame count
                # cannot shrink further (a 2-frame chunk re-trips this
                # guard — formerly a RecursionError at the real defaults:
                # 4K against the 8M auto budget, flow-prior 1080p against
                # 4M). Ship the pairs through midpoints(), whose guard
                # splits by batch and never recurses on frame count.
                return self.midpoints(np.asarray(frames[:-1]),
                                      np.asarray(frames[1:]))
            cap = max(2, self.max_px_per_launch // px)
            outs = [self.midpoints_sequence(frames[i:i + cap])
                    for i in range(0, n1 - 1, cap - 1)]
            return jnp.concatenate(outs, axis=0)
        if (self._auto_scale is not None or self._spatial_manual
                or self.mesh.shape["data"] > 1):
            # routed modes keep the pair path (probe/padding semantics)
            return self.midpoints(np.asarray(frames[:-1]),
                                  np.asarray(frames[1:]))
        if not hasattr(self, "_seq_fwd"):
            fwd = self._fwd

            def seq(p, fr):
                return fwd(p, fr[:-1], fr[1:])

            self._seq_fwd = jax.jit(seq)
        return self._seq_fwd(self.params, jnp.asarray(frames))

    def midpoints(self, f0: np.ndarray, f1: np.ndarray) -> jnp.ndarray:
        """Predict the temporal midpoint of each pair.

        Batches not divisible by the 'data' mesh axis are padded (replicating
        the last pair) and sliced back — shardings stay static under jit.

        Launches are bounded by `max_px_per_launch` (the engine-level HBM
        guard): a batch whose total pixel count exceeds the budget is split
        into sequential device launches and re-concatenated, so oversized
        requests (720p b16, 1080p/4K video batches) degrade to more
        launches instead of an XLA OOM — previously only the serving
        batcher enforced this (serve/batcher.py `launch_size`) and a 1080p
        video demo at the default batch killed the TPU worker.

        Args: f0, f1: (B, H, W, 3) in the engine's io dtype — float32 [0, 1]
          by default, uint8 [0, 255] with `io_uint8=True`.
        Returns: (B, H, W, 3) device array in the same convention.
        """
        b = f0.shape[0]
        # Scale-adaptive routing is decided ONCE per midpoints() call —
        # probed on the first HBM-guard chunk if the batch splits — so every
        # chunk of one video batch takes the same path (per-chunk probes
        # could mix native and half-res frames within a batch: temporal
        # flicker, and multiple probe entries per call).
        scaled = None
        if self._auto_scale is not None:
            scaled = self._probe_scaled(f0, f1)
        if self.max_px_per_launch is not None and b > 1:
            d = self.mesh.shape["data"]
            px = f0.shape[1] * f0.shape[2]
            cap = max(1, self.max_px_per_launch // px)
            cap = max(d, cap // d * d)  # keep chunks DP-divisible
            if b > cap:
                outs = [self._midpoints_launch(f0[i:i + cap], f1[i:i + cap],
                                               scaled=scaled)
                        for i in range(0, b, cap)]
                return jnp.concatenate(outs, axis=0)
        return self._midpoints_launch(f0, f1, scaled=scaled)

    def _probe_scaled(self, f0, f1) -> bool:
        """One auto_scale flow probe (on at most the first guard chunk's
        pairs, DP-padded): True = route this whole call half-res."""
        d = self.mesh.shape["data"]
        if self.max_px_per_launch is not None:
            px = f0.shape[1] * f0.shape[2]
            cap = max(d, max(1, self.max_px_per_launch // px) // d * d)
            f0, f1 = f0[:cap], f1[:cap]
        pad = (-f0.shape[0]) % d
        if pad:
            f0 = np.concatenate([f0, np.repeat(f0[-1:], pad, axis=0)])
            f1 = np.concatenate([f1, np.repeat(f1[-1:], pad, axis=0)])
        p95 = float(self._flow_p95(self.params, jnp.asarray(f0),
                                   jnp.asarray(f1)))
        self.auto_scale_stats["probes"].append(p95)
        if p95 > self._auto_scale:
            self.auto_scale_stats["scaled"] += 1
            return True
        return False

    def _midpoints_launch(self, f0, f1, scaled: Optional[bool] = None
                          ) -> jnp.ndarray:
        """One device launch (post-guard): DP padding + dispatch."""
        b = f0.shape[0]
        d = self.mesh.shape["data"]
        pad = (-b) % d
        if pad:
            f0 = np.concatenate([f0, np.repeat(f0[-1:], pad, axis=0)])
            f1 = np.concatenate([f1, np.repeat(f1[-1:], pad, axis=0)])
        if scaled:
            # large motion: halve the resolution (halves the apparent
            # flow, back inside the receptive field), upsample the
            # midpoint back to native size
            jf0, jf1 = jnp.asarray(f0), jnp.asarray(f1)
            h, w = f0.shape[1], f0.shape[2]
            out = self._fwd(self.params,
                            self._resize(jf0, (h // 2, w // 2)),
                            self._resize(jf1, (h // 2, w // 2)))
            out = self._resize(out, (h, w))
            return out[:b] if pad else out
        if self._spatial_manual:
            # The halo-exchange pipeline needs H % (4 * spatial) == 0
            # (strided context-encoder grid alignment) AND — for the Pallas
            # DCN gate — a per-shard slab height (h_local + 2*halo) divisible
            # by 8; with halo already a multiple of 8 that means
            # h_local % 8 == 0, i.e. H % (8 * spatial) == 0. Real resolutions
            # (1080 at spatial=2) don't comply: pad the bottom with edge
            # replication and crop. Rows further than the halo from the
            # padded boundary are exact; the last few rows see a slightly
            # displaced frame boundary.
            h = f0.shape[1]
            mult = 8 * self.mesh.shape["spatial"]
            hpad = (-h) % mult
            if hpad:
                f0 = np.concatenate([f0, np.repeat(f0[:, -1:], hpad, axis=1)], axis=1)
                f1 = np.concatenate([f1, np.repeat(f1[:, -1:], hpad, axis=1)], axis=1)
            out = self._spatial_pallas_fwd(f0.shape[1])(
                self.params, jnp.asarray(f0), jnp.asarray(f1))
            out = out[:, :h] if hpad else out
        else:
            out = self._fwd(self.params, jnp.asarray(f0), jnp.asarray(f1))
        return out[:b] if pad else out

    def recursive(self, f0: np.ndarray, f1: np.ndarray, factor: int) -> list[jnp.ndarray]:
        """Insert `factor` frames between each pair.

        For factor = 2^k - 1 this is true recursive bisection (1 -> midpoint;
        3 -> quarter points via two levels). Other factors round up to the
        next bisection level and the extra frames are dropped uniformly.
        With `reference_compat` the single midpoint is duplicated `factor`
        times instead (reference inference.py:173-177).
        """
        if factor < 1:
            return []
        mid = self.midpoints(f0, f1)
        if factor == 1:
            return [mid]
        if self.reference_compat:
            return [mid] * factor
        # pass the device array straight back in: midpoints only needs host
        # arrays when it pads, so np.asarray here cost a full-batch D2H+H2D
        # round trip per recursion level (the crash site of the 1080p demo
        # was exactly this transfer under HBM pressure)
        left = self.recursive(f0, mid, factor // 2)
        right = self.recursive(mid, f1, factor // 2)
        frames = left + [mid] + right
        if len(frames) > factor:  # drop extras uniformly (even factor)
            keep = np.linspace(0, len(frames) - 1, factor).round().astype(int)
            frames = [frames[i] for i in keep]
        return frames
