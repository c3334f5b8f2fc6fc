"""Manual spatial (H) sharding with explicit halo exchange — shard_map path.

The reference scales only by *downscaling* input (inference.py `--scale`,
default 0.5); it has no multi-device story at all (SURVEY §2). The
GSPMD/jit path in this package already H-shards the XLA ops (XLA inserts
halo exchanges automatically), but Pallas custom calls have no GSPMD
partitioning rule, so the fused production kernels could previously run
data-parallel only. This module is the TPU-native answer for single-clip
1080p/4K inference across a slice: an explicit `jax.shard_map` pipeline —

1. ONE halo exchange per frame pair: each shard `ppermute`s its boundary
   rows to its H-neighbors over ICI, building a (H_local + 2*halo)-row slab
   (out-of-mesh neighbors contribute zeros = out-of-image).
2. The FULL model forward runs shard-locally on the slab — Pallas kernels
   included, unchanged. `EMAVFI.spatial_axis` makes every row-mixing stage
   zero out-of-image rows (reproducing single-device zero-padding
   semantics exactly) and turns the context global-average-pool into a
   masked owned-rows pool + `psum` over the axis (the only other
   collective).
3. The center H_local rows are sliced back out.

Exactness (not approximation): the slab computation of any row differs
from the single-device computation only within the network's receptive
field of the slab EDGES. `required_halo` accumulates that receptive field
layer by layer; with halo >= that bound, every owned row is bit-equal
(modulo float reduction order). This requires the *bounded* sampling
configuration — with unbounded warp/DCN the receptive field is the whole
frame and no finite halo is exact (the architecture-level `warp_max_flow`
/ `dcn_max_offset` bounds, see models/ema_vfi.py, make it finite).
"""

from __future__ import annotations


from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vfi_tpu.parallel.mesh import spatial_sharding


def required_halo(num_blocks: int = 3, dcn_max_offset: Optional[int] = 2,
                  warp_max_flow: Optional[int] = 16) -> int:
    """Rows of halo needed for exact spatially-sharded inference.

    Accumulated receptive field toward the slab edge, stage by stage
    (reference architecture, src/models/ema_vfi.py:63-147):
      feature extraction   1 + num_blocks          (3x3 stride-1 convs)
      motion estimation    +3
      backward warp        reach = warp_max_flow + 1 (bilinear neighbor);
                           depth becomes max(flow_depth, reach)
      fusion DCNs          +(dcn_max_offset + 2) each (tap +-1, offset +-R,
                           bilinear +1; offset conv's +1 is dominated)
      reconstruction       +3
    Rounded up to a multiple of 8 (sublane tile; also satisfies the mod-4
    alignment the strided context encoder needs).
    """
    if dcn_max_offset is None or warp_max_flow is None:
        raise ValueError(
            "spatial sharding requires the bounded sampling configuration "
            "(dcn_max_offset / warp_max_flow set): unbounded warp/DCN can "
            "read any row of the frame, so no finite halo is exact")
    d = 1 + num_blocks          # feature extraction
    d += 3                      # motion estimation convs
    d = max(d, warp_max_flow + 1)
    d += num_blocks * (dcn_max_offset + 2)
    d += 3                      # reconstruction convs
    return -(-d // 8) * 8


def _exchange_halo(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """(B, H_local, W, C) -> (B, H_local + 2*halo, W, C) via neighbor
    ppermute. Out-of-mesh neighbors contribute zeros (== out-of-image)."""
    n = jax.lax.axis_size(axis)
    down = [(i, i + 1) for i in range(n - 1)]   # my bottom rows -> next shard's top halo
    up = [(i + 1, i) for i in range(n - 1)]     # my top rows -> previous shard's bottom halo
    top_halo = jax.lax.ppermute(x[:, -halo:], axis, down)
    bottom_halo = jax.lax.ppermute(x[:, :halo], axis, up)
    return jnp.concatenate([top_halo, x, bottom_halo], axis=1)


def build_spatial_forward(
    model,
    mesh: Mesh,
    global_h: int,
    halo: Optional[int] = None,
    preprocess=None,
):
    """Build (and jit) the spatially-sharded forward for one frame height.

    model: an EMAVFI instance (its bounded-sampling config determines the
      halo; `use_pallas=True` is supported — the kernels run shard-locally).
    preprocess: optional elementwise fn applied to each frame shard before
      the halo exchange (e.g. ImageNet normalization).
    Returns jitted `fn(params, frame0, frame1) -> midpoint`, all (B, H, W, C)
    with B divisible by the 'data' axis and H == global_h divisible by
    4 * 'spatial' (strided context-encoder grid alignment).
    """
    n_spatial = mesh.shape["spatial"]
    if halo is None:
        halo = required_halo(model.num_blocks, model.dcn_max_offset,
                             model.warp_max_flow)
    if global_h % (4 * n_spatial) != 0:
        raise ValueError(
            f"H={global_h} must divide by 4*spatial={4 * n_spatial} (strided "
            "context-encoder grid alignment); pad the frames")
    h_local = global_h // n_spatial
    if halo % 4 != 0:
        raise ValueError(f"halo={halo} must be a multiple of 4")
    if halo > h_local:
        raise ValueError(
            f"halo={halo} exceeds the per-shard rows {h_local}: use fewer "
            "'spatial' shards for this resolution")

    spatial_model = model.clone(spatial_axis="spatial", spatial_halo=halo,
                                spatial_global_h=global_h)

    def local_fn(p, f0, f1):
        if preprocess is not None:
            f0, f1 = preprocess(f0), preprocess(f1)
        f0 = _exchange_halo(f0, halo, "spatial")
        f1 = _exchange_halo(f1, halo, "spatial")
        out = spatial_model.apply(p, f0, f1)
        return out[:, halo:halo + h_local]

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P("data", "spatial"), P("data", "spatial")),
        out_specs=P("data", "spatial"),
        check_vma=False)  # Pallas custom calls don't declare vma
    sh = spatial_sharding(mesh)
    return jax.jit(sharded, in_shardings=(None, sh, sh), out_shardings=sh)


def spatial_interpolate(
    model,
    params: Any,
    frame0: jnp.ndarray,
    frame1: jnp.ndarray,
    mesh: Mesh,
    halo: Optional[int] = None,
):
    """One-shot spatially-sharded midpoint inference over `mesh`
    ('data','spatial'). See `build_spatial_forward` (which callers doing
    repeated inference should cache) for the contract."""
    fn = build_spatial_forward(model, mesh, frame0.shape[1], halo)
    sh = spatial_sharding(mesh)
    return fn(params, jax.device_put(frame0, sh), jax.device_put(frame1, sh))
