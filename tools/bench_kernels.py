"""Amortized per-layer DCN kernel benchmark (TPU).

The axon relay adds ~25 ms per host round-trip and `block_until_ready` is
unreliable, so single-call timings are useless for kernel work. This tool
chains K kernel invocations inside ONE jit (x_{k+1} = kernel(x_k), offsets
fixed) and materializes a single scalar — relay overhead is paid once and
divided by K.

Usage (on the TPU):
    python tools/bench_kernels.py [--size vga|720p] [--iters 16]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
from vfi_tpu.ops.pallas.sampling import (deform_conv2d_pallas,
                                         deform_conv2d_pallas_v4)

SIZES = {"vga": (480, 640), "720p": (720, 1280), "1080p": (1080, 1920),
         "4k": (2160, 3840)}


def make_inputs(h, w, c, r, regime, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
    if regime == "zero":
        off = np.zeros((1, h, w, 18), np.float32)
    elif regime == "trained":
        off = rng.uniform(-0.3, 0.3, (1, h, w, 18)).astype(np.float32)
    else:  # worst
        off = rng.uniform(-r, r, (1, h, w, 18)).astype(np.float32)
    offset = jnp.asarray(off, jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(0.3, 0.9, (1, h, w, 9)), jnp.bfloat16)
    weight = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
    bias = jnp.zeros((c,), jnp.bfloat16)
    return x, offset, mask, weight, bias


def chain(fn, k):
    """Return jit(f) that applies `fn` k times with x as carry."""
    @jax.jit
    def run(x, offset, mask, weight, bias):
        def body(xc, _):
            y = fn(xc, offset, mask, weight, bias)
            # keep magnitudes sane across iterations
            y = y * jnp.bfloat16(0.1)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.mean(y.astype(jnp.float32))
    return run


def measure(fn, args, k, reps=3):
    run = chain(fn, k)
    _ = float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return (best - 0.025) / k * 1000.0  # ms per layer, relay subtracted


def bench_warp(size: str, iters: int, max_flow: int = 16):
    """Warp benchmark: XLA gather vs the strip-packed Pallas kernel, over
    smooth and worst-case flow regimes."""
    import jax.image

    from vfi_tpu.ops.pallas.sampling import bounded_warp_pallas_v2
    from vfi_tpu.ops.warp import warp as warp_xla

    h, w = SIZES[size]
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3), jnp.bfloat16)
    R = max_flow

    def flows():
        for name, scale in (("smooth3", 3.0), ("smooth10", 10.0),
                            ("random", float(R))):
            if name.startswith("smooth"):
                base = rng.randn(1, 12, 20, 2).astype(np.float32) * scale
                f = jax.image.resize(jnp.asarray(base), (1, h, w, 2),
                                     "linear")
                yield name, jnp.asarray(f, jnp.bfloat16)
            else:
                yield name, jnp.asarray(
                    rng.uniform(-scale, scale, (1, h, w, 2)), jnp.bfloat16)

    def chain_warp(fn, flow):
        @jax.jit
        def run():
            def body(c, _):
                y = fn(img, flow + c.astype(jnp.bfloat16) * 0)
                return c + 1.0, jnp.mean(y.astype(jnp.float32))
            c, ys = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return jnp.sum(ys)
        return run

    for name, flow in flows():
        for kname, fn in (
                ("xla-gather", lambda i, f: warp_xla(
                    i, jnp.clip(f, -R, R))),
                ("pallas-v2", functools.partial(
                    bounded_warp_pallas_v2, max_flow=R))):
            run = chain_warp(fn, flow)
            _ = float(run())
            best = min(_timed(run) for _ in range(3))
            print(f"  warp {name:9s} {kname:12s} "
                  f"{(best - 0.025) / iters * 1000:8.2f} ms", flush=True)


def _timed(run):
    t0 = time.perf_counter()
    _ = float(run())
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="vga", choices=list(SIZES))
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--radius", type=int, default=2)
    p.add_argument("--channels", type=int, default=67)
    p.add_argument("--kernels", default="xla,pallas")
    p.add_argument("--tile_w", default="128",
                   help="column-tile width(s) for the v4t kernel variant "
                        "(comma list sweeps, e.g. 128,256,640)")
    p.add_argument("--offsets", default=None,
                   help="npz from tools/dump_offsets.py: bench with REAL "
                        "per-layer offset/mask planes instead of the "
                        "synthetic regimes (the synthetic 'trained' regime "
                        "is spatially homogeneous, so it cannot show the "
                        "per-tile-predicate sparsity of real offsets)")
    p.add_argument("--warp", action="store_true",
                   help="benchmark the warp kernels instead of DCN")
    args = p.parse_args()
    if args.warp:
        print(f"devices: {jax.devices()}  size={args.size}", flush=True)
        bench_warp(args.size, args.iters)
        return
    h, w = SIZES[args.size]
    r = args.radius
    print(f"devices: {jax.devices()}  size={args.size} ({h}x{w}) "
          f"C={args.channels} R={r} iters={args.iters}", flush=True)

    kernels = {}
    if "xla" in args.kernels:
        kernels["xla-shifts"] = functools.partial(
            deform_conv2d_shifts, max_offset=r)
    if "pallas" in args.kernels:
        kernels["pallas-v3"] = functools.partial(
            deform_conv2d_pallas, max_offset=r)
    if "v4" in args.kernels:
        kernels["pallas-v4"] = functools.partial(
            deform_conv2d_pallas_v4, max_offset=r)
    if "v4t" in args.kernels:  # column-tiled (the 4K path)
        for tw in (int(t) for t in str(args.tile_w).split(",")):
            kernels[f"v4-tw{tw}"] = functools.partial(
                deform_conv2d_pallas_v4, max_offset=r, tile_w=tw)
    if "v5" in args.kernels:  # transposed layout (C in sublanes)
        from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

        kernels["pallas-v5"] = functools.partial(
            deform_conv2d_pallas_v5, max_offset=r)
    if "v5t" in args.kernels:  # v5 column-tiled predicates (round 5)
        from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

        for tw in (int(t) for t in str(args.tile_w).split(",")):
            kernels[f"v5-tw{tw}"] = functools.partial(
                deform_conv2d_pallas_v5, max_offset=r, tile_w=tw)
    if "v5v" in args.kernels:  # v5 layout variants
        from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

        for v in ("base", "dot_nhwc", "bcast"):
            kernels[f"v5-{v}"] = functools.partial(
                deform_conv2d_pallas_v5, max_offset=r, variant=v)
    if "v5dbg" in args.kernels:  # v5 cost-split ablations (wrong results)
        from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

        for dbg in ("dma", "noblend", "nodot", "full"):
            kernels[f"v5-{dbg}"] = functools.partial(
                deform_conv2d_pallas_v5, max_offset=r, _dbg=dbg)
    if "v4b" in args.kernels:  # double-buffered sample scratch
        kernels["pallas-v4b2"] = functools.partial(
            deform_conv2d_pallas_v4, max_offset=r, samp_bufs=2)
    if "v4dbg" in args.kernels:  # cost-split ablations (wrong results)
        for dbg in ("empty", "noblend", "nowgt", "nodot"):
            kernels[f"v4-{dbg}"] = functools.partial(
                deform_conv2d_pallas_v4, max_offset=r, _dbg=dbg)

    if args.offsets:
        data = np.load(args.offsets)
        layers = sorted({k.split("_l")[1] for k in data.files})
        regimes = []
        for li in layers:
            off = np.asarray(data[f"offset_l{li}"], np.float32)
            msk = np.asarray(data[f"mask_l{li}"], np.float32)
            if off.shape[1] != h or off.shape[2] != w:
                raise SystemExit(
                    f"--offsets planes are {off.shape[1]}x{off.shape[2]} "
                    f"but --size {args.size} is {h}x{w}")
            base = make_inputs(h, w, args.channels, r, "zero")
            inp = (base[0], jnp.asarray(off, jnp.bfloat16),
                   jnp.asarray(msk, jnp.bfloat16), base[3], base[4])
            regimes.append((f"real:l{li}", inp))
    else:
        regimes = [(reg, make_inputs(h, w, args.channels, r, reg))
                   for reg in ("zero", "trained", "worst")]

    for regime, inp in regimes:
        for name, fn in kernels.items():
            try:
                ms = measure(fn, inp, args.iters)
                print(f"  {regime:8s} {name:12s} {ms:8.2f} ms/layer",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {regime:8s} {name:12s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
