"""Bisect the column-tiled v4 DCN kernel's compile-time cliff (round-2 item).

Round-1 finding (docs/PERFORMANCE.md "4K column tiling"): the tiled kernel
compiles + matches numerics at small shapes on real hardware, but at 4K size
(TW=1920, bf16) the compile did not finish in 25 minutes — twice — so 4K
falls back to the XLA shifts op. The untiled kernel at W=1920 (1080p)
compiles fine, so the cliff is somewhere in {TW magnitude, ncols > 1 / 5-D
pre-gathered input, bf16-vs-f32 at tile size}.

This tool measures AOT compile wall time (`jit(...).lower().compile()`, no
execution) for a grid of (w, tile_w, dtype) cases, each in a BOUNDED
subprocess (a looping Mosaic compile can wedge the shared remote compile
relay — docs/PERFORMANCE.md "Operational hazard"), smallest-first, and
appends results to artifacts/compile_bisect.jsonl.

Usage:
    python tools/compile_bisect.py                 # default case ladder
    python tools/compile_bisect.py --case 3840:384:bf16
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

# (w, tile_w, dtype[, h]) — smallest/cheapest first; 0 tile_w = untiled
# control; h defaults to 32 (the h=32 sweep showed NO cliff anywhere at
# bf16 — even TW=1920 compiled in 113 s — so the round-1 25-min hang must
# involve the real image height / its TH pick; the real4k ladder pins that).
LADDER = [
    (256, 128, "bf16"),     # bf16 at the f32-validated small tiled shape
    (1920, 960, "bf16"),    # 1080p tiled 2-col
    (3840, 128, "bf16"),    # 4K, smallest tile
    (3840, 384, "bf16"),
    (3840, 768, "bf16"),
    (3840, 1280, "bf16"),
    (3840, 1920, "bf16"),   # the known-25-min case
    (1920, 0, "bf16"),      # untiled 1080p control (known-good ~fast)
    (3840, 1920, "f32"),    # dtype control at the cliff shape
]

# Real-height 4K cases (h=2160 -> TH=16 instead of the sweep's TH=8/32).
LADDER_REAL4K = [
    (3840, 128, "bf16", 2160),
    (3840, 256, "bf16", 2160),
    (3840, 384, "bf16", 2160),
]


def compile_case(w: int, tile_w: int, dtype_name: str, h: int = 32) -> dict:
    import jax
    import jax.numpy as jnp

    from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v4

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    c = 67
    spec = lambda *s: jax.ShapeDtypeStruct(s, dtype)  # noqa: E731
    args = (spec(1, h, w, c), spec(1, h, w, 18), spec(1, h, w, 9),
            spec(3, 3, c, c), spec(c,))
    t0 = time.time()
    lowered = deform_conv2d_pallas_v4.lower(
        *args, max_offset=2, tile_w=(tile_w or None))
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    return {"w": w, "tile_w": tile_w, "dtype": dtype_name, "h": h,
            "lower_s": round(t_lower, 1), "compile_s": round(t_compile, 1)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None,
                    help="w:tile_w:dtype[:h] (subprocess)")
    ap.add_argument("--ladder", default="default",
                    choices=("default", "real4k"))
    ap.add_argument("--timeout", type=int, default=420)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "compile_bisect.jsonl"))
    args = ap.parse_args(argv)

    if args.case:
        parts = args.case.split(":")
        w, tw, dt = int(parts[0]), int(parts[1]), parts[2]
        h = int(parts[3]) if len(parts) > 3 else 32
        res = compile_case(w, tw, dt, h=h)
        print(json.dumps(res))
        return 0

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    ladder = LADDER_REAL4K if args.ladder == "real4k" else LADDER
    for case in ladder:
        w, tw, dt = case[:3]
        h = case[3] if len(case) > 3 else 32
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--case", f"{w}:{tw}:{dt}:{h}"],
                capture_output=True, text=True, timeout=args.timeout, cwd=REPO)
            lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
            res = (json.loads(lines[-1]) if lines else
                   {"w": w, "tile_w": tw, "dtype": dt, "h": h, "error":
                    f"rc={proc.returncode} {proc.stderr[-300:]}"})
        except subprocess.TimeoutExpired:
            res = {"w": w, "tile_w": tw, "dtype": dt, "h": h,
                   "error": f"compile timeout > {args.timeout}s",
                   "seconds": round(time.time() - t0, 1)}
        print(json.dumps(res), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
