"""Shared CLI plumbing: logging, compilation cache, param loading."""

from __future__ import annotations

import logging
import os
from typing import Any


def setup(cache_dir: str | None = ".jax_cache") -> None:
    """Structured logging + persistent XLA compilation cache (compiles of the
    full-res model are expensive; the cache makes second runs instant)."""
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # This environment's sitecustomize registers the TPU backend at
        # interpreter startup, which makes jax ignore a JAX_PLATFORMS env
        # override (e.g. the 8-virtual-CPU-device fake backend used to test
        # multi-chip sharding without a slice) — re-apply it through config.
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def load_model_params(path: str) -> Any:
    """Load EMAVFI params from .npz (native), orbax checkpoint dir, or a
    reference .pth (converted on the fly)."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from vfi_tpu.utils.convert import convert_ema_vfi_torch

        return convert_ema_vfi_torch(path)
    if path.endswith(".npz"):
        from vfi_tpu.utils.convert import load_params_npz

        return load_params_npz(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint under {path}")
            restored = mgr.restore(step)
            return restored["params"]
    raise ValueError(f"unrecognized params path: {path}")
