"""Per-layer microbench of the Pallas conv kernel vs the XLA conv at 720p.

Iterations chain through the weights (w += 1e-30 * out[0,0,0,0]) inside one
jit — the relay stack memoizes repeated identical dispatches, so naive
loops report impossible TF/s (see tools/conv_gemm_probe.py).

Usage: timeout -k 5 600 python tools/bench_conv.py [--b N] [--shapes all]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def bench(step, x, w, bs):
    def chain(x, w, bs):
        def body(w, _):
            o = step(x, w, bs)
            wn = w + (o[(0,) * o.ndim].astype(jnp.float32) * 1e-30
                      ).astype(w.dtype)
            return wn, ()

        wf, _ = jax.lax.scan(body, w, None, length=ITERS)
        return wf.reshape(-1)[0]

    f = jax.jit(chain)
    float(f(x, w, bs))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(f(x, w, bs))
        best = min(best, (time.time() - t0) / ITERS)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--shapes", default="64x64",
                    help="comma list of cinxcout, or 'all'")
    ap.add_argument("--kernels", default="xla,im2col,direct")
    args = ap.parse_args()

    shapes = ([(64, 64), (128, 64), (64, 32), (6, 64)]
              if args.shapes == "all" else
              [tuple(int(v) for v in s.split("x"))
               for s in args.shapes.split(",")])
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def xla_conv(x, w, bs):
        o = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(o + bs.astype(jnp.float32), 0.0).astype(dt)

    from vfi_tpu.ops.pallas.conv import conv2d_pallas

    for cin, cout in shapes:
        x = jnp.asarray(rng.standard_normal((args.b, args.h, args.w, cin)), dt)
        wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dt)
        bs = jnp.asarray(rng.standard_normal((cout,)), dt)
        fl = 2 * args.b * args.h * args.w * 9 * cin * cout
        for name in args.kernels.split(","):
            if name == "xla":
                step = xla_conv
            elif name.startswith("v2"):
                from vfi_tpu.ops.pallas.conv import conv2d_pallas_v2
                _, _, dbg = name.partition(":")
                step = (lambda dbg: lambda x, w, bs: conv2d_pallas_v2(
                    x, w, bs, act=True, _dbg=dbg or "full"))(dbg)
            else:
                n, _, dbg = name.partition(":")
                step = (lambda n, dbg: lambda x, w, bs: conv2d_pallas(
                    x, w, bs, act=True, variant=n,
                    _dbg=dbg or "full"))(n, dbg)
            try:
                t = bench(step, x, wt, bs)
                print(f"b{args.b} {cin:3d}->{cout:3d} {name:8s} "
                      f"{t*1e3:8.3f} ms  {fl/t/1e12:6.2f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"b{args.b} {cin:3d}->{cout:3d} {name:8s} FAIL "
                      f"{type(e).__name__}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
