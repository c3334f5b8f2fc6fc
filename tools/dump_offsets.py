"""Dump a trained checkpoint's per-DCN-layer offset/mask planes to npz.

The v4 Pallas kernel's cost is proportional to the active-(tap, shift)
pairs its per-(row-slab, column-tile) predicates cannot skip — a function
of the REAL offset planes a checkpoint produces, not of synthetic regimes
(tools/bench_kernels.py's uniform "trained" regime is spatially
homogeneous, so it cannot show the column-tiled-predicate effect at all).
This dumps the actual planes so bench_kernels --offsets measures the
production cost (see docs/PERFORMANCE.md "Headline drift 6.94 -> 6.10").

Input modes:
  --scene Urban      a Middlebury val frame pair, bilinear-resized to --size
  --scene noise      uniform-noise frames (what bench.py feeds)

Run on CPU (one forward, ~minutes): JAX_PLATFORMS=cpu python
    tools/dump_offsets.py --ckpt artifacts/emavfi_q2_best.npz \
        --scene noise --size 720p --out runs/offsets_q2_noise_720p.npz
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

VAL_DIR = "/root/reference/data/processed/val"
SIZES = {"vga": (480, 640), "720p": (720, 1280), "1080p": (1080, 1920)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/emavfi_q2_best.npz")
    p.add_argument("--scene", default="Urban",
                   help="Middlebury val scene name, or 'noise'")
    p.add_argument("--size", default="720p", choices=list(SIZES))
    p.add_argument("--out", required=True)
    p.add_argument("--radius", type=int, default=2)
    args = p.parse_args()

    import jax.numpy as jnp
    import PIL.Image

    from vfi_tpu.cli.common import load_model_params
    from vfi_tpu.models import EMAVFI

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
    # checkpoint topology (e.g. the q13/qr1 fuse_project lane-aligned
    # fusion) is auto-detected off the tree, like the engine does
    from vfi_tpu.utils.convert import infer_model_dims

    fuse = infer_model_dims(params).get("fuse_project", False)
    model = EMAVFI(dcn_max_offset=args.radius, warp_max_flow=16,
                   fuse_project=fuse)
    _, inter = model.apply(params, jnp.asarray(f0), jnp.asarray(f1),
                           capture_intermediates=True)

    out = {}
    for li in range(model.num_blocks):
        raw = np.asarray(
            inter["intermediates"][f"fusion_dcn{li}"]["offset_conv"]
            ["__call__"][0])
        o_s, m, o_d = np.split(raw, 3, axis=-1)
        # Same (dy, dx)-interleaved layout the DCN ops consume
        # (models/layers.py ModulatedDeformConv).
        out[f"offset_l{li}"] = np.concatenate(
            [o_s, o_d], axis=-1).astype(np.float16)
        out[f"mask_l{li}"] = (1.0 / (1.0 + np.exp(-m))).astype(np.float16)

    np.savez_compressed(args.out, **out)
    for li in range(model.num_blocks):
        off = out[f"offset_l{li}"].astype(np.float32)
        dx = np.clip(off[..., 1::2], -args.radius, args.radius)
        print(f"l{li}: shape {off.shape} |dx| p99 "
              f"{np.percentile(np.abs(dx), 99):.2f}")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
