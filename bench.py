"""Benchmark: interpolated frames/sec/chip at 720p (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the CPU reference estimate recorded in
BASELINE.md (the reference publishes no numbers; the north star is >=10x the
CPU baseline at 720p). CPU_BASELINE_FPS below is the measured PyTorch-CPU
reference throughput; see BASELINE.md for provenance.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# PyTorch reference on this host's CPU, 720p single pair, fp32 (measured via
# tools/measure_reference_cpu.py; see BASELINE.md "CPU baseline" section).
CPU_BASELINE_FPS = 0.0238


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vfi_tpu.models import EMAVFI

    B, H, W = 4, 720, 1280
    model = EMAVFI(dtype=jnp.bfloat16)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), small, small)
    fwd = jax.jit(model.apply)

    f0 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    f1 = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.float32)
    out = fwd(params, f0, f1)
    out.block_until_ready()  # compile

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = fwd(params, f0, f1)
        f0 = out  # chain to defeat any caching/overlap
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    fps = B / dt

    print(json.dumps({
        "metric": "interpolated_frames_per_sec_per_chip_720p",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
