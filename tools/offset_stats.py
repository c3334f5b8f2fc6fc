"""Active-(tap, shift)-pair statistics of a trained checkpoint's DCN offsets.

The v4 Pallas kernel's cost is proportional to the number of (tap, column
-shift) pairs whose per-slab offset bounds activate them (docs/
PERFORMANCE.md). This tool answers, from REAL data instead of synthetic
regimes: (a) how many pairs a trained checkpoint activates on real frames,
(b) whether finer-than-slab (W-subtiled) predicate granularity would skip
more — i.e. whether that kernel surgery would pay before anyone writes it.

Verdict recorded 2026-08-17 (artifacts/emavfi_long2_best.npz, Middlebury):
~21-24 of 45 pairs active at full-W slabs, ~19-21 at 128-column subtiles —
a ~9% reduction. Real offsets are small (|d| p99 ~0.5 px) but straddle
zero nearly everywhere, so bounds span both neighbors at any granularity.
W-subtiled predicates: rejected by measurement.

Usage: JAX_PLATFORMS=cpu python tools/offset_stats.py \
           --ckpt artifacts/emavfi_long2_best.npz --scene Urban
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

VAL_DIR = "/root/reference/data/processed/val"


def pair_stats(dx: np.ndarray, R: int, th: int, wchunk: int) -> float:
    """Mean active column-shift pairs per (th x wchunk) block (9 taps)."""
    H, W, T = dx.shape
    nr, nc = H // th, W // wchunk
    b = dx[:nr * th, :nc * wchunk].reshape(nr, th, nc, wchunk, T)
    mn = b.min(axis=(1, 3))
    mx = b.max(axis=(1, 3))
    sx = np.arange(-R, R + 1).reshape(1, 1, 1, -1)
    act = (mx[..., None] > sx - 1) & (mn[..., None] < sx + 1)
    return float(act.sum(axis=-1).sum(axis=-1).mean())


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/emavfi_long2_best.npz")
    p.add_argument("--scene", default="Urban")
    p.add_argument("--radius", type=int, default=2)
    p.add_argument("--th", type=int, default=8)
    p.add_argument("--wchunk", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from vfi_tpu.cli.common import load_model_params
    from vfi_tpu.models import EMAVFI

    params = load_model_params(args.ckpt)
    model = EMAVFI(dcn_max_offset=args.radius, warp_max_flow=16)

    def load(path):
        return np.asarray(PIL.Image.open(path), np.float32)[None] / 255.0

    f0 = load(f"{VAL_DIR}/{args.scene}/frame10.png")
    f1 = load(f"{VAL_DIR}/{args.scene}/frame11.png")
    _, inter = model.apply(params, jnp.asarray(f0), jnp.asarray(f1),
                           capture_intermediates=True)
    R = args.radius
    for li in range(model.num_blocks):
        raw = np.asarray(
            inter["intermediates"][f"fusion_dcn{li}"]["offset_conv"]
            ["__call__"][0])[0]
        o_s, _, o_d = np.split(raw, 3, axis=-1)
        off = np.concatenate([o_s, o_d], axis=-1)  # (dy, dx) interleaved
        dy = np.clip(off[..., 0::2], -R, R)
        dx = np.clip(off[..., 1::2], -R, R)
        W = dx.shape[1]
        print(f"{args.scene} dcn{li}: "
              f"dx pairs/slab full-W {pair_stats(dx, R, args.th, W):.1f}  "
              f"per-{args.wchunk} {pair_stats(dx, R, args.th, args.wchunk):.1f}"
              f"  (9 = zero-offset floor, 45 = worst case); "
              f"|dx| p99 {np.percentile(np.abs(dx), 99):.2f} "
              f"|dy| p99 {np.percentile(np.abs(dy), 99):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
