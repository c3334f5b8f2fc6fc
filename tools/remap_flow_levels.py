"""Warm-start a deeper SimpleFlowNet pyramid from a shallower checkpoint.

SimpleFlowNet levels are coarse-to-fine with per-level parameters
(models/flownet.py `level{k}`): growing `levels` N -> N+1 inserts a NEW
COARSEST level at the front, so old `level{k}` weights belong at new
`level{k+1}`. The new level0 (one octave coarser) is seeded from the old
coarsest level0 — it sees the same kind of input (frames + zero/coarse
flow), so this is a sensible warm start for fine-tuning.

Usage: python tools/remap_flow_levels.py IN.flow.npz OUT.flow.npz [--add 1]
"""
import argparse

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--add", type=int, default=1,
                    help="number of new coarsest levels to insert")
    args = ap.parse_args()

    z = dict(np.load(args.src))
    out = {}
    n_old = 1 + max(int(k.split("level")[1].split("/")[0])
                    for k in z if "/level" in k)
    for k, v in z.items():
        if "/level" not in k:
            out[k] = v
            continue
        pre, rest = k.split("level", 1)
        idx, tail = rest.split("/", 1)
        out[f"{pre}level{int(idx) + args.add}/{tail}"] = v
    # seed the new coarsest level(s) from the old coarsest
    for a in range(args.add):
        for k, v in z.items():
            if "/level0/" in k:
                pre, rest = k.split("level0/", 1)
                out[f"{pre}level{a}/{rest}"] = v
    np.savez(args.dst, **out)
    n_new = 1 + max(int(k.split("level")[1].split("/")[0])
                    for k in out if "/level" in k)
    print(f"remapped {args.src} ({n_old} levels) -> {args.dst} "
          f"({n_new} levels), {len(out)} arrays")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
