"""Device mesh construction and sharding rules.

The reference is strictly single-process single-GPU (SURVEY §2: no
torch.distributed / NCCL anywhere). Scale-out here is pure XLA: build a
`jax.sharding.Mesh`, annotate array shardings, and let jit insert the
collectives over ICI. Axes:

- 'data'    — data parallelism: batch dim of inputs, replicated params,
              psum'd grads (inserted automatically by jit from shardings).
- 'spatial' — optional H-dimension sharding for huge single frames
              (1080p/4K batch inference, BASELINE config 5 stretch goal).
              Convs/warps over an H-sharded array make XLA materialize halo
              exchanges; model code stays unchanged.

Works on any device set: real v5e slice, or CPU with
--xla_force_host_platform_device_count=N (the test 'fake backend').
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices.

    `data=-1` absorbs all devices not taken by `spatial`.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spatial <= 0:
        raise ValueError(f"spatial axis must be >= 1, got {spatial}")
    if data == -1:
        if n % spatial != 0:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(f"mesh {data}x{spatial} needs {data*spatial} devices, have {n}")
    grid = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) arrays: batch over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial: bool = False):
    """Device-put a pytree of (B, ...) host arrays with batch sharded over
    'data' (and optionally H over 'spatial')."""
    sh = spatial_sharding(mesh) if spatial else batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
