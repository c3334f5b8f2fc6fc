"""`python eval.py` — Middlebury PSNR/SSIM evaluation harness.

The reference has NO evaluation (README lists PSNR/SSIM as future work,
reference README.md:203-220); this provides the north-star metric: per-scene
and mean PSNR/SSIM of predicted middle frames over a triplet dataset at
native resolution (BASELINE config 2).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="EMAVFI eval (PSNR/SSIM)")
    parser.add_argument("--data-dir", required=True,
                        help="scene-per-subdirectory dataset (Middlebury layout)")
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--frame_interval", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--json", action="store_true", help="machine-readable output")
    parser.add_argument("--dcn_max_offset", type=int, default=None,
                        help="bounded-offset fast DCN sampling radius (px)")
    parser.add_argument("--warp_max_flow", type=int, default=None,
                        help="bounded warp flow radius (px)")
    parser.add_argument("--use_pallas", action="store_true")
    args = parser.parse_args(argv)

    from vfi_tpu.cli.common import load_model_params, setup
    setup()

    import os
    from collections import defaultdict

    import numpy as np

    from vfi_tpu.data.dataset import TripletDataset, load_image
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.utils.metrics import psnr, ssim
    import jax

    params = load_model_params(args.model_path)
    interp = FrameInterpolator(params, bf16=not args.fp32,
                               dcn_max_offset=args.dcn_max_offset,
                               warp_max_flow=args.warp_max_flow,
                               use_pallas=args.use_pallas)
    ds = TripletDataset(args.data_dir, args.frame_interval, augment=None,
                        normalize=False)

    metric_fn = jax.jit(lambda p, t: (psnr(p, t), ssim(p, t)))
    per_scene = defaultdict(lambda: {"psnr": [], "ssim": []})
    # group triplets by spatial shape so batches stay static-shaped
    by_shape = defaultdict(list)
    for t in ds.triplets:
        shape = load_image(t[0]).shape
        by_shape[shape].append(t)

    for shape, triplets in by_shape.items():
        for i in range(0, len(triplets), args.batch_size):
            chunk = triplets[i:i + args.batch_size]
            f0 = np.stack([load_image(t[0]) for t in chunk])
            gt = np.stack([load_image(t[1]) for t in chunk])
            f1 = np.stack([load_image(t[2]) for t in chunk])
            pred = interp.midpoints(f0, f1)
            p, s = metric_fn(pred, gt)
            for k, t in enumerate(chunk):
                scene = os.path.basename(os.path.dirname(t[0]))
                per_scene[scene]["psnr"].append(float(p[k]))
                per_scene[scene]["ssim"].append(float(s[k]))

    rows = {scene: {"psnr": float(np.mean(v["psnr"])),
                    "ssim": float(np.mean(v["ssim"])),
                    "n": len(v["psnr"])}
            for scene, v in sorted(per_scene.items())}
    mean_psnr = float(np.mean([r["psnr"] for r in rows.values()]))
    mean_ssim = float(np.mean([r["ssim"] for r in rows.values()]))
    if args.json:
        print(json.dumps({"scenes": rows, "mean_psnr": mean_psnr,
                          "mean_ssim": mean_ssim}))
    else:
        for scene, r in rows.items():
            print(f"{scene:20s} PSNR {r['psnr']:6.2f} dB  SSIM {r['ssim']:.4f}  (n={r['n']})")
        print(f"{'MEAN':20s} PSNR {mean_psnr:6.2f} dB  SSIM {mean_ssim:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
