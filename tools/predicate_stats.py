"""Predicted v5-kernel skip rates from a checkpoint's REAL offset planes.

The v5 DCN kernel (ops/pallas/sampling.py `_sampling_kernel_v5`) skips a
(tap t, column-shift sx) pair when the row-slab's clipped-offset bounds
prove no pixel uses it, and — at R >= 2 — skips extra row shifts
(|v - R| > 1) the same way. Column-tiling those bounds (v4's tw256 lever,
VERDICT r4 #2) tightens them spatially. Whether that pays at the R=1
geometry is an empirical question about the TRAINED offset distribution:
R=1 has no extra row shifts at all (the 3-term core is unconditional once
a pair is active), so per-tile bounds can only retire whole (t, sx)
pairs whose dx range is one-signed within the tile.

This tool computes, host-side from one forward's captured offset planes:
per layer x {full-width, tw640, tw256, tw128} x {R of the checkpoint},
the mean active blend-term count per (row-slab, tile) — the quantity the
kernel's runtime is proportional to — so the kernel surgery can be
adjudicated BEFORE paying its Mosaic compile risk (memory: novel kernel
structures can wedge the compile relay for 45+ min).

Usage (CPU; one forward, minutes on this host):
  JAX_PLATFORMS=cpu python tools/predicate_stats.py \
      --ckpt artifacts/emavfi_qr1_best.npz --radius 1 --scene Urban
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

VAL_DIR = "/root/reference/data/processed/val"
SIZES = {"vga": (480, 640), "720p": (720, 1280)}


def active_terms(dy: np.ndarray, dx: np.ndarray, R: int, th: int,
                 tw: int) -> float:
    """Mean blend-term count per (row-slab, column-tile) region, summed
    over taps, under the kernel's bound predicates.

    dy/dx: (H, W, taps) clipped offsets. Terms per active (t, sx) pair:
    3 core row shifts + each active extra row shift (R >= 2 only).
    Mirrors `_sampling_kernel_v5`'s predicates exactly:
      pair (t, sx) active  iff dxmax > sx - 1 and dxmin < sx + 1
      extra v-R active     iff dymax > (v-R) - 1 and dymin < (v-R) + 1
    """
    h, w, taps = dy.shape
    nr, nc = h // th, w // tw
    d_y = dy[: nr * th, : nc * tw].reshape(nr, th, nc, tw, taps)
    d_x = dx[: nr * th, : nc * tw].reshape(nr, th, nc, tw, taps)
    ymin, ymax = d_y.min(axis=(1, 3)), d_y.max(axis=(1, 3))  # (nr, nc, taps)
    xmin, xmax = d_x.min(axis=(1, 3)), d_x.max(axis=(1, 3))

    total = np.zeros((nr, nc), np.float64)
    for sx in range(-R, R + 1):
        pair = (xmax > sx - 1) & (xmin < sx + 1)              # (nr, nc, taps)
        terms = np.full(pair.shape, 3.0)
        for v in list(range(R - 1)) + list(range(R + 2, 2 * R + 1)):
            terms += ((ymax > (v - R) - 1) & (ymin < (v - R) + 1))
        total += (pair * terms).sum(axis=-1)
    return float(total.mean())


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--radius", type=int, default=1)
    p.add_argument("--scene", default="Urban",
                   help="Middlebury val scene, or 'noise'")
    p.add_argument("--size", default="720p", choices=list(SIZES))
    p.add_argument("--th", type=int, default=16,
                   help="row-slab height (v5 picks 16 at 720p)")
    p.add_argument("--json_out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import PIL.Image

    # Pin CPU before any backend initialization: sitecustomize pins the
    # axon TPU platform and ignores the env var (memory: tpu-environment-
    # hazards); don't contend with the TPU queue for one forward.
    jax.config.update("jax_platforms", "cpu")

    from vfi_tpu.cli.common import load_model_params
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.utils.convert import infer_model_dims

    h, w = SIZES[args.size]
    if args.scene == "noise":
        rng = np.random.RandomState(1)
        f0 = rng.uniform(size=(1, h, w, 3)).astype(np.float32)
        f1 = rng.uniform(size=(1, h, w, 3)).astype(np.float32)
    else:
        def load(path):
            img = PIL.Image.open(path).resize((w, h), PIL.Image.BILINEAR)
            return np.asarray(img, np.float32)[None] / 255.0

        f0 = load(f"{VAL_DIR}/{args.scene}/frame10.png")
        f1 = load(f"{VAL_DIR}/{args.scene}/frame11.png")

    params = load_model_params(args.ckpt)
    dims = infer_model_dims(params)
    R = args.radius
    model = EMAVFI(dcn_max_offset=R, warp_max_flow=16,
                   fuse_project=dims.get("fuse_project", False))
    _, inter = model.apply(params, jnp.asarray(f0), jnp.asarray(f1),
                           capture_intermediates=True)

    report = {"ckpt": args.ckpt, "radius": R, "scene": args.scene,
              "th": args.th, "layers": {}}
    for li in range(model.num_blocks):
        raw = np.asarray(
            inter["intermediates"][f"fusion_dcn{li}"]["offset_conv"]
            ["__call__"][0])[0]
        o_s, m, o_d = np.split(raw, 3, axis=-1)
        off = np.concatenate([o_s, o_d], axis=-1)
        dy = np.clip(off[..., 0::2].astype(np.float32), -R, R)
        dx = np.clip(off[..., 1::2].astype(np.float32), -R, R)
        sat = float(np.mean(np.abs(off[..., : off.shape[-1]]) >= R))
        row = {"abs_dx_p50": round(float(np.percentile(np.abs(dx), 50)), 3),
               "abs_dx_p99": round(float(np.percentile(np.abs(dx), 99)), 3),
               "saturated_frac": round(sat, 4)}
        base = None
        for tw in (w, 640, 256, 128):
            if w % tw:
                continue
            a = active_terms(dy, dx, R, args.th, tw)
            key = "full" if tw == w else f"tw{tw}"
            row[key] = round(a, 2)
            if base is None:
                base = a
            else:
                row[key + "_vs_full"] = round(a / base, 4)
        # ceiling: every (t, sx) pair active with every extra term
        ceil = 9 * (2 * R + 1) * 3 + 9 * (2 * R + 1) * (2 * R + 1 - 3)
        row["ceiling_terms"] = ceil
        report["layers"][f"l{li}"] = row
        print(f"l{li}: {row}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
