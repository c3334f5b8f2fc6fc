"""Measure the inference cost of flow-prior mode vs the plain forward.

The flow-prior fine-tune (runs q3ft, round 2) is the quality leader
(25.63 dB vs 24.59 native-res val), but its forward adds a SimpleFlowNet
pyramid pass + one bilinear pre-warp in front of the main model
(vfi_tpu/models/prior.py). This tool prices that: steady-state chained
720p throughput (same harness as bench.py: `iters` forwards chained in
ONE jit so dispatch overhead amortizes) for both modes on the same
checkpoint shapes, printed as JSON lines.

Usage:  python tools/bench_flowprior.py [--b 4] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(flow_prior: bool, b: int, h: int, w: int, iters: int,
            use_pallas: bool = True) -> float:
    from functools import partial

    import jax
    import jax.numpy as jnp

    from vfi_tpu.models import EMAVFI
    from vfi_tpu.utils.convert import load_params_npz

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    params = load_params_npz(os.path.join(art, "emavfi_q3ft_best.npz"))
    model = EMAVFI(dtype=jnp.bfloat16, dcn_max_offset=2, warp_max_flow=16,
                   use_pallas=use_pallas)
    if flow_prior:
        from vfi_tpu.models.flownet import SimpleFlowNet
        from vfi_tpu.models.prior import prior_prewarp

        flow_params = load_params_npz(
            os.path.join(art, "emavfi_q3ft_best.flow.npz"))
        flow = SimpleFlowNet(dtype=jnp.bfloat16)

        def fwd(p, f0, f1):
            pre, _ = prior_prewarp(partial(flow.apply, p["flow"]),
                                   f0, f1, scale=0.5)
            return model.apply(p["model"], f0, pre)

        tree = {"model": params, "flow": flow_params}
    else:
        def fwd(p, f0, f1):
            return model.apply(p, f0, f1)

        tree = params

    def chain(p, a, b_):
        def body(x, _):
            return fwd(p, x, b_), None

        y, _ = jax.lax.scan(body, a, None, length=iters)
        return y.mean()

    jitted = jax.jit(chain)
    f0 = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3), jnp.float32)
    f1 = jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3), jnp.float32)
    float(jitted(tree, f0, f1))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(jitted(tree, f0, f1))
        best = min(best, time.time() - t0)
    return b * iters / best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no_pallas", action="store_true",
                    help="XLA shifts path (CPU smoke)")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    up = not args.no_pallas
    plain = measure(False, args.b, args.h, args.w, args.iters, use_pallas=up)
    prior = measure(True, args.b, args.h, args.w, args.iters, use_pallas=up)
    print(json.dumps({"mode": "plain", "fps": round(plain, 3)}))
    print(json.dumps({"mode": "flow_prior", "fps": round(prior, 3),
                      "overhead_pct": round(100 * (plain / prior - 1), 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
