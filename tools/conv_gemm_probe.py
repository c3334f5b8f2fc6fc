"""Calibration probe for the round-4 Pallas conv kernel: measure the MXU
rate of every candidate GEMM formulation of a 3x3 stride-1 conv at 720p
(XLA level, no Mosaic risk), plus the XLA conv itself.

Iterations are CHAINED inside one jit with a data dependence THROUGH THE
WEIGHTS (w += 1e-30 * out[0,0] — a no-op numerically, but it makes every
step's operand depend on the previous result, so nothing collapses or
memoizes; naive repeat-the-same-dispatch loops report impossible TF/s on
this relay stack). The big operand stays constant, so the chain overhead is
a scalar extract + a tiny weight add per step.

Run on the TPU:  timeout -k 5 420 python tools/conv_gemm_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def bench(step, x, w):
    """step(x, w) -> out array. Chains ITERS steps through w; returns
    best-of-3 seconds per step."""

    def chain(x, w):
        def body(w, _):
            o = step(x, w)
            wn = w + (o.reshape(-1)[0].astype(jnp.float32) * 1e-30
                      ).astype(w.dtype)
            return wn, ()

        wf, _ = jax.lax.scan(body, w, None, length=ITERS)
        return wf.reshape(-1)[0]

    f = jax.jit(chain)
    float(f(x, w))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f(x, w))
        best = min(best, (time.time() - t0) / ITERS)
    return best


def main():
    H, W, C, COUT = 720, 1280, 64, 64
    M = H * W
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    flops = 2 * M * 9 * C * COUT  # one 3x3 conv's FLOPs

    def report(name, t, fl=None):
        fl = fl or flops
        print(f"{name:42s} {t*1e3:8.3f} ms  {fl/t/1e12:6.2f} TF/s "
              f"({fl/t/197e12*100:4.1f}% MFU)", flush=True)

    # 0. reference peak: big square matmul
    a = jnp.asarray(rng.standard_normal((4096, 4096)), dt)
    t = bench(lambda x, w: jax.lax.dot(
        x, w, preferred_element_type=jnp.float32).astype(dt), a, a + 0)
    report("peak check 4096^3", t, 2 * 4096**3)

    # 1. XLA conv (the baseline to beat)
    xim = jnp.asarray(rng.standard_normal((1, H, W, C)), dt)
    wc = jnp.asarray(rng.standard_normal((3, 3, C, COUT)) * 0.05, dt)
    report("XLA conv3x3 720p 64->64", bench(
        lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt), xim, wc))

    # 2. flat im2col GEMM (M, 576)@(576, 64)
    x2d = jnp.asarray(rng.standard_normal((M, 9 * C)), dt)
    w2d = jnp.asarray(rng.standard_normal((9 * C, COUT)) * 0.05, dt)
    report("GEMM (921600,576)@(576,64)", bench(
        lambda x, w: jax.lax.dot(
            x, w, preferred_element_type=jnp.float32).astype(dt), x2d, w2d))

    # 3. 9 accumulated K=64 GEMMs
    x64 = jnp.asarray(rng.standard_normal((M, C)), dt)
    w9 = jnp.asarray(rng.standard_normal((9, C, COUT)) * 0.05, dt)

    def acc9(x, w9):
        o = jnp.zeros((M, COUT), jnp.float32)
        for t in range(9):
            o += jax.lax.dot(x, w9[t], preferred_element_type=jnp.float32)
        return o.astype(dt)
    report("9x GEMM (921600,64)@(64,64) accum", bench(acc9, x64, w9))

    # 4. N effect: (M,576)@(576,128)
    w128 = jnp.asarray(rng.standard_normal((9 * C, 128)) * 0.05, dt)
    report("GEMM (921600,576)@(576,128)", bench(
        lambda x, w: jax.lax.dot(
            x, w, preferred_element_type=jnp.float32).astype(dt),
        x2d, w128), 2 * M * 9 * C * 128)

    # 5. 3D dot NHWC orientation: (TH,W,576)·(576,64) per row-slab
    x3d = jnp.asarray(rng.standard_normal((90, 8, W, 9 * C)), dt)
    report("3D dot (8,1280,576)@(576,64) x90", bench(
        lambda x, w: jnp.einsum(
            "rhwk,kn->rhwn", x, w,
            preferred_element_type=jnp.float32).astype(dt), x3d, w2d))

    # 6. transposed orientation: (3,192,W)·(192,64) -> (W,64) per row
    xtr = jnp.asarray(rng.standard_normal((240, 3, 192, W)), dt)
    wtr = jnp.asarray(rng.standard_normal((192, COUT)) * 0.05, dt)
    report("tr dot (3,192,1280)@(192,64) x240", bench(
        lambda x, w: jnp.einsum(
            "rdkw,kn->rwn", x, w,
            preferred_element_type=jnp.float32).astype(dt), xtr, wtr))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
