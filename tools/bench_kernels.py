"""Kernel/component microbenchmarks on the live TPU.

Timing methodology for this environment (see docs/PERFORMANCE.md): the axon
relay makes `block_until_ready` unreliable, so every sample materializes a
host scalar; a fixed ~25 ms relay round-trip rides on each call. Run one
configuration at a time — concurrent processes contend for the single
remote-compile worker and the device grant.

Usage: python tools/bench_kernels.py [--height 480 --width 640 --iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def bench(name, fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *a: fn(*a).mean())
    t0 = time.time()
    float(g(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        float(g(*args))
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt * 1000:8.1f} ms/call   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--only", default=None,
                        help="substring filter of benchmark names")
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from vfi_tpu.ops import deform_conv2d, deform_conv2d_shifts, warp
    from vfi_tpu.ops.pallas.sampling import (bounded_warp_pallas,
                                             deform_conv2d_pallas)

    B, H, W, C, CO, k, R = 1, args.height, args.width, 67, 67, 3, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    off = jnp.asarray(np.clip(rng.standard_normal((B, H, W, 2 * k * k)) * 1.2,
                              -R + .01, R - .01), jnp.bfloat16)
    msk = jnp.asarray(rng.uniform(0, 1, (B, H, W, k * k)), jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((k, k, C, CO)) * 0.1, jnp.bfloat16)
    img = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    flow = jnp.asarray(np.clip(rng.standard_normal((B, H, W, 2)) * 5,
                               -15.9, 15.9), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, wgt.shape, ("NHWC", "HWIO", "NHWC"))

    cases = [
        ("conv3x3 67ch",
         lambda a: lax.conv_general_dilated(a, wgt, (1, 1), "SAME",
                                            dimension_numbers=dn), (x,)),
        ("dcn exact (gather)",
         lambda a, o, m: deform_conv2d(a, o, m, wgt, None), (x, off, msk)),
        ("dcn shifts R2 unrolled",
         lambda a, o, m: deform_conv2d_shifts(a, o, m, wgt, None,
                                              max_offset=2), (x, off, msk)),
        ("dcn shifts R3 scan",
         lambda a, o, m: deform_conv2d_shifts(a, o, m, wgt, None,
                                              max_offset=3, unroll=False),
         (x, off, msk)),
        ("dcn pallas R3",
         lambda a, o, m: deform_conv2d_pallas(a, o, m, wgt, None,
                                              max_offset=3), (x, off, msk)),
        ("warp xla (gather)", lambda a, f: warp(a, f), (img, flow)),
        ("warp pallas R16",
         lambda a, f: bounded_warp_pallas(a, f, max_flow=16), (img, flow)),
    ]
    for name, fn, operands in cases:
        if args.only and args.only not in name:
            continue
        try:
            bench(name, fn, *operands, iters=args.iters)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
