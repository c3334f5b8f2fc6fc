"""Calibration probe for the round-4 Pallas conv kernel: measure the MXU
rate of every candidate GEMM formulation of a 3x3 stride-1 conv at 720p
(XLA level, no Mosaic risk), plus the XLA conv itself.

The conv kernel's ceiling is set by which dot shape/orientation this
toolchain's MXU actually sustains (the v5 lesson: orientations differ by
>4x). Run on the TPU:  timeout -k 5 420 python tools/conv_gemm_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    H, W, C, COUT = 720, 1280, 64, 64
    M = H * W
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    flops = 2 * M * 9 * C * COUT  # one 3x3 conv's FLOPs

    x2d = jnp.asarray(rng.standard_normal((M, 9 * C)), dt)
    w2d = jnp.asarray(rng.standard_normal((9 * C, COUT)), dt)
    x64 = jnp.asarray(rng.standard_normal((M, C)), dt)
    w64 = jnp.asarray(rng.standard_normal((C, COUT)), dt)
    w9 = jnp.asarray(rng.standard_normal((9, C, COUT)), dt)
    xim = jnp.asarray(rng.standard_normal((1, H, W, C)), dt)
    wc = jnp.asarray(rng.standard_normal((3, 3, C, COUT)), dt)

    def report(name, t):
        print(f"{name:42s} {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TF/s "
              f"({flops/t/197e12*100:4.1f}% MFU)", flush=True)

    # 0. reference peak: big square matmul
    a = jnp.asarray(rng.standard_normal((4096, 4096)), dt)
    f = jax.jit(lambda a: a @ a)
    t = bench(f, a)
    pk = 2 * 4096**3 / t
    print(f"{'peak check 4096^3':42s} {t*1e3:8.3f} ms  {pk/1e12:6.2f} TF/s "
          f"({pk/197e12*100:4.1f}% MFU)", flush=True)

    # 1. XLA conv (the baseline to beat)
    f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt))
    report("XLA conv3x3 720p 64->64", bench(f, xim, wc))

    # 2. flat im2col GEMM (M, 576) @ (576, 64)
    f = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.float32).astype(dt))
    report("GEMM (921600,576)@(576,64)", bench(f, x2d, w2d))

    # 3. 9 accumulated K=64 GEMMs
    def acc9(a, w9):
        o = jnp.zeros((M, COUT), jnp.float32)
        for t in range(9):
            o += jax.lax.dot(a, w9[t], preferred_element_type=jnp.float32)
        return o.astype(dt)
    report("9x GEMM (921600,64)@(64,64) accum", bench(jax.jit(acc9), x64, w9))

    # 4. N effect: (M,576)@(576,128)
    w128 = jnp.asarray(rng.standard_normal((9 * C, 128)), dt)
    f = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.float32).astype(dt))
    t = bench(f, x2d, w128)
    fl2 = 2 * M * 9 * C * 128
    print(f"{'GEMM (921600,576)@(576,128)':42s} {t*1e3:8.3f} ms  "
          f"{fl2/t/1e12:6.2f} TF/s ({fl2/t/197e12*100:4.1f}% MFU)",
          flush=True)

    # 5. 3D dot NHWC orientation: (TH,W,576)·(576,64), TH*nr = H
    x3d = jnp.asarray(rng.standard_normal((90, 8, W, 9 * C)), dt)

    def d3(a, b):
        o = jnp.einsum("rhwk,kn->rhwn", a, b,
                       preferred_element_type=jnp.float32)
        return o.astype(dt)
    report("3D dot (8,1280,576)@(576,64) x90", bench(jax.jit(d3), x3d, w2d))

    # 6. transposed orientation: (TH,192,W)·(192,64) -> (TH,W,64)
    xtr = jnp.asarray(rng.standard_normal((240, 3, 192, W)), dt)
    wtr = jnp.asarray(rng.standard_normal((192, COUT)), dt)

    def dtr(a, b):
        o = jnp.einsum("rdkw,kn->rwn", a, b,
                       preferred_element_type=jnp.float32)
        return o.astype(dt)
    report("tr dot (3,192,1280)@(192,64) x240", bench(jax.jit(dtr), xtr, wtr))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
