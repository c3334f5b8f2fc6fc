"""Microbenchmark: Mosaic lowerings of the v4 DCN kernel's weighted blend.

The v4 kernel's cost is ~75% the per-term broadcast-multiply
`(ay * axm)[:, :, None] * rows` at (TH, W, C) (docs/PERFORMANCE.md cost
split: trained regime 19.7 ms of 33 across ~70 terms, ~2.7 us per
(8, 1280, 128) bf16 term — ~4x off a 1-vreg/cycle VPU multiply). The
suspicion is the weight plane's lane-broadcast relayout ((TH, W) lives
W-on-lanes; the multiply needs W-on-sublanes), not the multiply itself.

This tool times ONE kernel structure per variant — K sequential blend terms
accumulating into an output block, exactly the production pattern — in a
bounded subprocess each (Mosaic hang hygiene), and reports us/term:

  cur      (w2d_f32 -> mul -> [:, :, None] -> cast bf16) * rows  [production]
  precast  cast w2d to bf16 BEFORE the minor-dim insertion
  bcast    explicit jnp.broadcast_to(w[:, :, None], (TH, W, C))
  flat     rows.reshape(TH*W, C) * w.reshape(TH*W, 1) (2-D broadcast)
  mat3d    weights delivered pre-broadcast (TH, W, C) from host (upper
           bound: no relayout, 3x VMEM traffic)
  nomul    accumulate rows unweighted (floor: pure adds + slices)

Usage: python tools/blend_micro.py [--variant cur] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("cur", "precast", "bcast", "flat", "mat3d", "nomul")
# The terms MUST run inside a fori_loop like the production kernel: Mosaic
# does not reuse VMEM stack slots across statically-unrolled regions, so an
# unrolled K-term chain carries K (TH, W, C) temporaries (52 MB at K=20) —
# the original unrolled micro measured that stack-pressure serialization
# (~34 us/term, 10x production) instead of the blend. A fori body is one
# reused codegen frame, exactly the production structure
# (_sampling_kernel_v4's per-tap fori).
TH, W, C, K = 8, 1280, 128, 64


def build(variant: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(w_ref, x_ref, w3_ref, o_ref, samp):
        # K terms: samp += weight_k ⊙ rows_k; rows_k are dynamic row-offset
        # slices like the production kernel's shifted reads.
        samp[...] = jnp.zeros((TH, W, C), samp.dtype)

        def body(k, _):
            wk = w_ref[jax.lax.rem(k, 16)]  # (TH, W) f32
            rows = x_ref[pl.ds(jax.lax.rem(k, 8), TH), :, :]
            if variant == "cur":
                term = (wk * 0.5)[:, :, None].astype(samp.dtype) * rows
            elif variant == "precast":
                term = (wk * 0.5).astype(samp.dtype)[:, :, None] * rows
            elif variant == "bcast":
                wb = jnp.broadcast_to(
                    (wk * 0.5)[:, :, None].astype(samp.dtype), (TH, W, C))
                term = wb * rows
            elif variant == "flat":
                term = (rows.reshape(TH * W, C)
                        * (wk * 0.5).astype(samp.dtype).reshape(TH * W, 1)
                        ).reshape(TH, W, C)
            elif variant == "mat3d":
                term = w3_ref[jax.lax.rem(k, 8)] * rows
            elif variant == "nomul":
                term = rows
            else:
                raise ValueError(variant)
            samp[...] += term
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        o_ref[...] = samp[...]

    @jax.jit
    def run(w2d, x, w3d):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TH, W, C), x.dtype),
            scratch_shapes=[pltpu.VMEM((TH, W, C), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(w2d, x, w3d)

    return run


def measure(variant: str, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    # Weight banks are indexed modulo (16 planes / 8 pre-broadcast cubes) so
    # their HBM->VMEM input copy stays constant as K grows; the unused w3d is
    # a 1-element dummy for every variant but mat3d (the original benchmark
    # shipped the full (K, TH, W, C) = 52 MB cube to ALL variants, whose
    # per-call DMA flattened the variant differences).
    w2d = jnp.asarray(rng.random((16, TH, W)), jnp.float32)
    x = jnp.asarray(rng.random((TH + 8, W, C)), jnp.bfloat16)
    w3d = (jnp.asarray(rng.random((8, TH, W, C)), jnp.bfloat16)
           if variant == "mat3d"
           else jnp.zeros((8, 1, 1, 1), jnp.bfloat16))
    run = build(variant)

    # chain under one jit so the relay round trip amortizes
    @jax.jit
    def chained(w2d, x, w3d):
        def body(carry, _):
            out = run(w2d, carry, w3d)
            return jnp.concatenate([out, carry[TH:]], axis=0), 0.

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    float(chained(w2d, x, w3d).mean())  # compile + warm
    t0 = time.time()
    float(chained(w2d, x, w3d).mean())
    dt = time.time() - t0
    us_term = dt / iters / K * 1e6
    return {"variant": variant, "us_per_term": round(us_term, 2),
            "ms_per_call": round(dt / iters * 1e3, 3)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=VARIANTS, default=None)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--timeout", type=int, default=300)
    args = ap.parse_args(argv)

    if args.variant:
        print(json.dumps(measure(args.variant, args.iters)))
        return 0

    for v in VARIANTS:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--variant", v,
                 "--iters", str(args.iters)],
                capture_output=True, text=True, timeout=args.timeout, cwd=REPO)
            lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            print(lines[-1] if lines
                  else json.dumps({"variant": v, "error": proc.stderr[-300:]}),
                  flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"variant": v, "error": "timeout"}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
