"""Device mesh + sharding helpers (the reference has no parallelism at all;
this is a first-class TPU-native addition — SURVEY §2 parallelism table)."""

from vfi_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    spatial_sharding,
)
from vfi_tpu.parallel.spatial import (
    build_spatial_forward,
    required_halo,
    spatial_interpolate,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "spatial_sharding",
    "build_spatial_forward",
    "required_halo",
    "spatial_interpolate",
]
