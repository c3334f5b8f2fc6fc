"""`python eval.py` — Middlebury PSNR/SSIM evaluation harness.

The reference has NO evaluation (README lists PSNR/SSIM as future work,
reference README.md:203-220); this provides the north-star metric: per-scene
and mean PSNR/SSIM of predicted middle frames over a triplet dataset at
native resolution (BASELINE config 2).
"""

from __future__ import annotations

import argparse
import json


def evaluate_flow(flow_fn, frames_dir: str, gt_flow_dir: str,
                  pair=("frame10", "frame11")) -> dict:
    """Score a flow estimator against the bundled Middlebury GT flows.

    The reference ships 8 GT flow fields (`data/processed/other-gt-flow/
    <scene>/flow10.flo`, frame10->frame11 at native 584x388) but never reads
    them. For each GT scene with frames under `frames_dir/<scene>/`, predicts
    flow_fn(frame10, frame11) at the frames' resolution, rescales it to the
    GT grid (bilinear resize + per-component magnitude scaling), and reports
    mean endpoint error over valid GT pixels.

    flow_fn: (f0, f1) [1,H,W,3] float32 in [0,1] -> (1,H,W,2) flow (dx, dy)
      in pixels, warp convention `warp(f1, flow) ~ f0`.
    Returns {"scenes": {name: epe}, "mean_epe": float}.
    """
    import glob
    import os

    import numpy as np

    from vfi_tpu.data.dataset import load_image
    from vfi_tpu.utils.flo import endpoint_error, read_flo

    results = {}
    for flo_path in sorted(glob.glob(os.path.join(gt_flow_dir, "*", "flow10.flo"))):
        scene = os.path.basename(os.path.dirname(flo_path))
        scene_dir = os.path.join(frames_dir, scene)
        f0p = _find_frame(scene_dir, pair[0])
        f1p = _find_frame(scene_dir, pair[1])
        if f0p is None or f1p is None:
            continue
        gt = read_flo(flo_path)                      # (gh, gw, 2)
        f0 = load_image(f0p)[None]                   # (1, h, w, 3) [0,1]
        f1 = load_image(f1p)[None]
        pred = np.asarray(flow_fn(f0, f1))[0]        # (h, w, 2) at frame res
        gh, gw = gt.shape[:2]
        h, w = pred.shape[:2]
        if (gh, gw) != (h, w):
            import jax.numpy as jnp

            from vfi_tpu.ops.resize import resize_bilinear
            pred = np.array(resize_bilinear(jnp.asarray(pred)[None],
                                            (gh, gw)))[0]
            pred[..., 0] *= gw / w
            pred[..., 1] *= gh / h
        results[scene] = endpoint_error(pred, gt)
    if not results:
        # An empty sweep must not read as a perfect 0.0 EPE — a wrong
        # --data-dir/--gt_flow_dir would otherwise look like a great score.
        raise FileNotFoundError(
            f"no (GT flow, frame pair) matches found under {gt_flow_dir!r} / "
            f"{frames_dir!r} — check the paths")
    mean = float(sum(results.values()) / len(results))
    return {"scenes": results, "mean_epe": mean}


def _flow_main(args) -> int:
    """Flow-EPE evaluation path of the eval CLI."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.cli.common import load_model_params
    from vfi_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from vfi_tpu.models.flownet import SimpleFlowNet

    flow_params = load_model_params(args.flow_model)
    net = SimpleFlowNet(mid_channels=args.flow_mid_channels,
                        levels=args.flow_levels,
                        dtype=None if args.fp32 else jnp.bfloat16)
    apply = jax.jit(net.apply)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def flow_fn(f0, f1):
        # the estimator trains on ImageNet-normalized frames (Trainer feeds
        # the dataset's normalized batches) — mirror that here
        f0n = (jnp.asarray(f0) - mean) / std
        f1n = (jnp.asarray(f1) - mean) / std
        return apply(flow_params, f0n, f1n).astype(jnp.float32)

    report = evaluate_flow(flow_fn, args.data_dir, args.gt_flow_dir)
    if args.json:
        print(json.dumps(report))
    else:
        for scene, epe in sorted(report["scenes"].items()):
            print(f"{scene:20s} EPE {epe:7.3f} px")
        print(f"{'MEAN':20s} EPE {report['mean_epe']:7.3f} px")
    return 0


def _find_frame(scene_dir: str, stem: str):
    import os

    for ext in (".png", ".jpg", ".jpeg"):
        p = os.path.join(scene_dir, stem + ext)
        if os.path.exists(p):
            return p
    return None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="EMAVFI eval (PSNR/SSIM)")
    parser.add_argument("--data-dir", required=True,
                        help="scene-per-subdirectory dataset (Middlebury layout)")
    parser.add_argument("--model_path", default=None,
                        help="EMAVFI params npz (required unless --flow_model)")
    parser.add_argument("--frame_interval", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--json", action="store_true", help="machine-readable output")
    parser.add_argument("--dcn_max_offset", type=int, default=None,
                        help="bounded-offset fast DCN sampling radius (px)")
    parser.add_argument("--warp_max_flow", type=int, default=None,
                        help="bounded warp flow radius (px)")
    parser.add_argument("--use_pallas", action="store_true")
    parser.add_argument("--dcn_tile_w", type=int, default=None,
                        help="explicit Pallas DCN column-tile width (e.g. 256): per-tile skip predicates are tighter on trained offsets; bit-identical, auto-ignored for widths it does not divide")
    parser.add_argument("--cascade_levels", type=int, default=1,
                        help="EMAVFI self-cascade depth: >1 runs the motion "
                             "stages coarse-to-fine (shared weights) — use "
                             "on checkpoints fine-tuned with the same depth")
    parser.add_argument("--tta", action="store_true",
                        help="average 4 symmetry-transformed forwards "
                             "(identity/hflip/vflip/temporal-swap); ~4x "
                             "compute for a small PSNR gain")
    parser.add_argument("--flow_model", default=None,
                        help="SimpleFlowNet params npz (saved as "
                             "<best_model_path>.flow.npz by joint training); "
                             "evaluates flow EPE against --gt_flow_dir "
                             "instead of PSNR/SSIM")
    parser.add_argument("--gt_flow_dir", default="data/processed/other-gt-flow",
                        help="Middlebury GT .flo directory (scene subdirs)")
    parser.add_argument("--flow_mid_channels", type=int, default=32)
    parser.add_argument("--flow_levels", type=int, default=3)
    parser.add_argument("--flow_prior", action="store_true",
                        help="pre-warp frame1 halfway along the SimpleFlowNet"
                             " flow before the model (large-motion mode; "
                             "checkpoint must be TRAINED with flow_prior). "
                             "Loads <model_path minus .npz>.flow.npz unless "
                             "--flow_model is given")
    parser.add_argument("--flow_prior_scale", type=float, default=0.5)
    parser.add_argument("--auto_scale", type=float, default=None,
                        metavar="PIXELS",
                        help="scale-adaptive inference: when the flow "
                             "estimator's p95 motion magnitude exceeds this "
                             "many pixels, infer at half resolution and "
                             "upsample (large-motion lever; needs "
                             "--flow_prior)")
    args = parser.parse_args(argv)

    from vfi_tpu.cli.common import load_model_params, setup
    setup()

    if args.auto_scale is not None and not args.flow_prior:
        parser.error("--auto_scale requires --flow_prior (the flow "
                     "estimator provides the motion-magnitude probe)")
    if args.flow_model and not args.flow_prior:
        return _flow_main(args)
    if not args.model_path:
        parser.error("--model_path is required (unless evaluating a flow "
                     "estimator via --flow_model)")

    import os
    from collections import defaultdict

    import numpy as np

    from vfi_tpu.data.dataset import TripletDataset, load_image
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.utils.metrics import psnr, ssim
    import jax

    params = load_model_params(args.model_path)
    flow_params = None
    if args.flow_prior:
        flow_path = args.flow_model or (
            args.model_path[:-4] if args.model_path.endswith(".npz")
            else args.model_path) + ".flow.npz"
        flow_params = load_model_params(flow_path)
    interp = FrameInterpolator(params, bf16=not args.fp32,
                               dcn_max_offset=args.dcn_max_offset,
                               warp_max_flow=args.warp_max_flow,
                               use_pallas=args.use_pallas,
                               dcn_tile_w=args.dcn_tile_w,
                               cascade_levels=args.cascade_levels,
                               tta=args.tta,
                               flow_params=flow_params,
                               flow_prior_scale=args.flow_prior_scale,
                               flow_mid_channels=args.flow_mid_channels,
                               flow_levels=args.flow_levels,
                               auto_scale=args.auto_scale)
    ds = TripletDataset(args.data_dir, args.frame_interval, augment=None,
                        normalize=False)

    # Scenes with too few frames to form a triplet (e.g. the bundled val
    # Teddy has only 2 frames) are necessarily excluded — state that in the
    # output instead of silently averaging over fewer scenes.
    all_scenes = sorted(d for d in os.listdir(args.data_dir)
                        if os.path.isdir(os.path.join(args.data_dir, d)))
    covered = {os.path.basename(os.path.dirname(t[0])) for t in ds.triplets}
    excluded = [s for s in all_scenes if s not in covered]

    metric_fn = jax.jit(lambda p, t: (psnr(p, t), ssim(p, t)))
    per_scene = defaultdict(lambda: {"psnr": [], "ssim": [], "scaled": 0,
                                     "batches": 0})
    # group triplets by spatial shape so batches stay static-shaped; with
    # auto_scale also by scene, so the per-batch motion-magnitude probe
    # never decides one scene's route from another scene's flow
    by_shape = defaultdict(list)
    for t in ds.triplets:
        key = load_image(t[0]).shape
        if args.auto_scale is not None:
            key = (os.path.basename(os.path.dirname(t[0])), key)
        by_shape[key].append(t)

    for _, triplets in by_shape.items():
        for i in range(0, len(triplets), args.batch_size):
            chunk = triplets[i:i + args.batch_size]
            f0 = np.stack([load_image(t[0]) for t in chunk])
            gt = np.stack([load_image(t[1]) for t in chunk])
            f1 = np.stack([load_image(t[2]) for t in chunk])
            scaled_before = (interp.auto_scale_stats["scaled"]
                             if args.auto_scale is not None else 0)
            pred = interp.midpoints(f0, f1)
            routed = (interp.auto_scale_stats["scaled"] - scaled_before
                      if args.auto_scale is not None else 0)
            p, s = metric_fn(pred, gt)
            for k, t in enumerate(chunk):
                scene = os.path.basename(os.path.dirname(t[0]))
                per_scene[scene]["psnr"].append(float(p[k]))
                per_scene[scene]["ssim"].append(float(s[k]))
            scene0 = os.path.basename(os.path.dirname(chunk[0][0]))
            per_scene[scene0]["scaled"] += routed
            per_scene[scene0]["batches"] += 1

    rows = {scene: {"psnr": float(np.mean(v["psnr"])),
                    "ssim": float(np.mean(v["ssim"])),
                    "n": len(v["psnr"]),
                    **({"auto_scaled": f'{v["scaled"]}/{v["batches"]}'}
                       if args.auto_scale is not None else {})}
            for scene, v in sorted(per_scene.items())}
    mean_psnr = float(np.mean([r["psnr"] for r in rows.values()]))
    mean_ssim = float(np.mean([r["ssim"] for r in rows.values()]))
    if args.json:
        print(json.dumps({"scenes": rows, "mean_psnr": mean_psnr,
                          "mean_ssim": mean_ssim,
                          "excluded_scenes": excluded}))
    else:
        for scene, r in rows.items():
            print(f"{scene:20s} PSNR {r['psnr']:6.2f} dB  SSIM {r['ssim']:.4f}  (n={r['n']})")
        print(f"{'MEAN':20s} PSNR {mean_psnr:6.2f} dB  SSIM {mean_ssim:.4f} "
              f"({len(rows)}/{len(all_scenes)} scenes)")
        if excluded:
            print(f"excluded (no triplet at interval "
                  f"{args.frame_interval}): {', '.join(excluded)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
