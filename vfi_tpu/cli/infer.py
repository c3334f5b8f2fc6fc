"""`python infer.py {two-frame,video}` — interpolation CLI.

`video` mirrors the reference's argparse surface (reference:
inference.py:23-35) plus TPU batch options; `two-frame` is the minimal
end-to-end slice (BASELINE config 1): two images in, midpoint out.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="EMAVFI inference (TPU-native)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    two = sub.add_parser("two-frame", help="interpolate the midpoint of two images")
    two.add_argument("--frame0", required=True)
    two.add_argument("--frame1", required=True)
    two.add_argument("--output", required=True)
    two.add_argument("--model_path", required=True)
    two.add_argument("--size", type=int, nargs=2, default=None,
                     metavar=("H", "W"), help="resize inputs (default: native)")
    two.add_argument("--fp32", action="store_true", help="disable bf16 compute")

    multi = sub.add_parser(
        "videos", help="multi-clip batch upconversion (BASELINE config 5): "
                       "pairs from all clips coalesce into shared device "
                       "batches over the data-parallel mesh")
    multi.add_argument("--inputs", nargs="+", required=True)
    multi.add_argument("--outputs", nargs="+", required=True)
    multi.add_argument("--model_path", required=True)
    multi.add_argument("--target_fps", type=float, default=None)
    multi.add_argument("--max_interpolation_factor", type=int, default=4)
    multi.add_argument("--frame_interval", type=int, default=1)
    multi.add_argument("--codec", default="mp4v")
    multi.add_argument("--scale", type=float, default=0.5)
    multi.add_argument("--batch_pairs", type=int, default=8)
    multi.add_argument("--max_delay_ms", type=float, default=50.0,
                       help="max wait for cross-clip batch-mates")
    multi.add_argument("--fp32", action="store_true")
    multi.add_argument("--reference-compat", action="store_true")

    vid = sub.add_parser("video", help="frame-rate upconversion of a video")
    vid.add_argument("--input_video", required=True)
    vid.add_argument("--output_video", required=True)
    vid.add_argument("--model_path", required=True)
    vid.add_argument("--target_fps", type=float, default=None)
    vid.add_argument("--max_interpolation_factor", type=int, default=4)
    vid.add_argument("--frame_interval", type=int, default=1)
    vid.add_argument("--codec", default="mp4v")
    vid.add_argument("--scale", type=float, default=0.5)
    # Drop-in parity with the reference CLI (inference.py:23-35): --bitrate
    # is parsed there but never used (its VideoWriter ignores it), and
    # --device picks cuda/cpu. Both are accepted and ignored here (the TPU
    # runtime owns device placement).
    vid.add_argument("--bitrate", default=None,
                     help="accepted for reference-CLI compatibility; unused "
                          "(the reference never used it either)")
    vid.add_argument("--device", default=None,
                     help="accepted for reference-CLI compatibility; ignored "
                          "(JAX owns device placement)")
    vid.add_argument("--batch_pairs", type=int, default=8)
    vid.add_argument("--fp32", action="store_true")
    vid.add_argument("--reference-compat", action="store_true",
                     help="bit-for-bit reproduce the reference CLI's output "
                          "quirks (BGR stats, trailing originals, duplicated "
                          "midpoints)")
    for p in (two, vid, multi):
        p.add_argument("--dcn_max_offset", type=int, default=None,
                       help="bounded-offset fast DCN sampling radius (px)")
        p.add_argument("--warp_max_flow", type=int, default=None,
                       help="bounded warp flow radius (px)")
        p.add_argument("--use_pallas", action="store_true",
                       help="fused Pallas kernels for bounded sampling")
        p.add_argument("--dcn_kernel", default="v4", choices=("v4", "v5"),
                       help="Pallas DCN kernel generation (v5: transposed "
                            "lane-dense layout)")
        p.add_argument("--conv_kernel", default="xla",
                       choices=("xla", "pallas"),
                       help="conv trunk kernel: 'pallas' runs the stride-1 "
                            "blocks through the fused packed conv kernel "
                            "(same numerics; faster on this toolchain)")
        p.add_argument("--dcn_tile_w", type=int, default=None,
                       help="explicit Pallas DCN column-tile width (e.g. 256): per-tile skip predicates are tighter on trained offsets; bit-identical, auto-ignored for widths it does not divide")
        p.add_argument("--max_px_per_launch", type=int, default=None,
                       help="engine HBM guard: split batches whose total "
                            "pixel count exceeds this into sequential "
                            "device launches (0 disables; default: "
                            "graph-aware auto — 8M plain, 4M flow-prior, "
                            "halved for TTA)")
        p.add_argument("--cascade_levels", type=int, default=1,
                       help="EMAVFI self-cascade depth: >1 runs the motion "
                            "stages coarse-to-fine (shared weights) — use "
                            "on checkpoints fine-tuned with the same depth")
        p.add_argument("--spatial", type=int, default=1,
                       help="shard frame height over this many devices "
                            "(single-clip 1080p/4K mode; with --use_pallas "
                            "this uses the manual halo-exchange shard_map, "
                            "see vfi_tpu/parallel/spatial.py). Remaining "
                            "devices form the data-parallel axis.")
        p.add_argument("--flow_prior", action="store_true",
                       help="pre-warp frame1 halfway along the SimpleFlowNet "
                            "flow before the model (large-motion mode; the "
                            "checkpoint must be trained with flow_prior). "
                            "Loads <model_path minus .npz>.flow.npz unless "
                            "--flow_model is given")
        p.add_argument("--flow_model", default=None,
                       help="SimpleFlowNet params npz for --flow_prior")
        p.add_argument("--flow_prior_scale", type=float, default=0.5)
        p.add_argument("--flow_mid_channels", type=int, default=32)
        p.add_argument("--flow_levels", type=int, default=3)
        p.add_argument("--tta", action="store_true",
                       help="average 4 symmetry-transformed forwards "
                            "(identity/hflip/vflip/temporal-swap); ~4x "
                            "compute for a small quality gain; not with "
                            "--spatial > 1")
        p.add_argument("--auto_scale", type=float, default=None,
                       metavar="PIXELS",
                       help="scale-adaptive inference: when the flow "
                            "estimator's p95 motion magnitude exceeds this "
                            "many pixels, infer at half resolution and "
                            "upsample (large-motion lever; needs "
                            "--flow_prior)")
    args = parser.parse_args(argv)

    from vfi_tpu.cli.common import load_model_params, setup
    setup()
    if getattr(args, "auto_scale", None) is not None:
        if args.cmd == "videos":
            # the multi-clip batcher coalesces pairs ACROSS clips into one
            # device batch; a single per-batch motion probe would route one
            # clip's frames by another clip's flow (the cross-scene
            # contamination eval.py avoids by grouping per scene)
            parser.error("--auto_scale is not supported with `videos` "
                         "(cross-clip batches share one motion probe); "
                         "run clips separately with `video`")
        if not args.flow_prior:
            parser.error("--auto_scale requires --flow_prior")
    params = load_model_params(args.model_path)
    flow_params = None
    if args.flow_prior:
        flow_path = args.flow_model or (
            args.model_path[:-4] if args.model_path.endswith(".npz")
            else args.model_path) + ".flow.npz"
        flow_params = load_model_params(flow_path)
    flow_kw = dict(flow_params=flow_params,
                   flow_prior_scale=args.flow_prior_scale,
                   flow_mid_channels=args.flow_mid_channels,
                   flow_levels=args.flow_levels,
                   tta=args.tta,
                   auto_scale=args.auto_scale)

    from vfi_tpu.infer.pair import FrameInterpolator

    mesh = None
    if args.spatial > 1:
        from vfi_tpu.parallel import make_mesh

        mesh = make_mesh(data=-1, spatial=args.spatial)

    if args.cmd == "two-frame":
        import numpy as np
        from PIL import Image

        def load(p):
            img = Image.open(p).convert("RGB")
            if args.size:
                img = img.resize((args.size[1], args.size[0]), Image.BILINEAR)
            return np.asarray(img, np.float32)[None] / 255.0

        interp = FrameInterpolator(params, bf16=not args.fp32,
                                   dcn_max_offset=args.dcn_max_offset,
                                   warp_max_flow=args.warp_max_flow,
                                   use_pallas=args.use_pallas,
                                   dcn_tile_w=args.dcn_tile_w,
                                   dcn_kernel=args.dcn_kernel,
                                   conv_kernel=args.conv_kernel,
                                   cascade_levels=args.cascade_levels,
                                   max_px_per_launch=("auto" if args.max_px_per_launch is None else args.max_px_per_launch or None),
                                   mesh=mesh, spatial=args.spatial > 1,
                                   **flow_kw)
        mid = np.asarray(interp.midpoints(load(args.frame0), load(args.frame1)))[0]
        Image.fromarray((np.clip(mid, 0, 1) * 255).astype(np.uint8)).save(args.output)
        print(f"wrote {args.output}")
        return 0

    if args.cmd == "videos":
        from vfi_tpu.infer.multi import interpolate_videos

        interp = FrameInterpolator(params, bf16=not args.fp32,
                                   dcn_max_offset=args.dcn_max_offset,
                                   warp_max_flow=args.warp_max_flow,
                                   use_pallas=args.use_pallas,
                                   dcn_tile_w=args.dcn_tile_w,
                                   dcn_kernel=args.dcn_kernel,
                                   conv_kernel=args.conv_kernel,
                                   cascade_levels=args.cascade_levels,
                                   max_px_per_launch=("auto" if args.max_px_per_launch is None else args.max_px_per_launch or None),
                                   mesh=mesh, spatial=args.spatial > 1,
                                   **flow_kw)
        all_stats = interpolate_videos(
            args.inputs, args.outputs, interp,
            target_fps=args.target_fps,
            max_interpolation_factor=args.max_interpolation_factor,
            frame_interval=args.frame_interval, codec=args.codec,
            scale=args.scale, batch_pairs=args.batch_pairs,
            reference_compat=args.reference_compat,
            max_delay_ms=args.max_delay_ms)
        for inp, st in zip(args.inputs, all_stats):
            print(inp, {k: v for k, v in st.items() if k != "batcher"})
        print("batching:", all_stats[0]["batcher"] if all_stats else {})
        return 0

    interp = FrameInterpolator(params, bf16=not args.fp32,
                               reference_compat=args.reference_compat,
                               dcn_max_offset=args.dcn_max_offset,
                               warp_max_flow=args.warp_max_flow,
                               use_pallas=args.use_pallas,
                               dcn_tile_w=args.dcn_tile_w,
                               dcn_kernel=args.dcn_kernel,
                               conv_kernel=args.conv_kernel,
                               cascade_levels=args.cascade_levels,
                               max_px_per_launch=("auto" if args.max_px_per_launch is None else args.max_px_per_launch or None),
                               mesh=mesh, spatial=args.spatial > 1,
                               **flow_kw)
    from vfi_tpu.infer.video import interpolate_video

    stats = interpolate_video(
        args.input_video, args.output_video, interp,
        target_fps=args.target_fps,
        max_interpolation_factor=args.max_interpolation_factor,
        frame_interval=args.frame_interval, codec=args.codec,
        scale=args.scale, batch_pairs=args.batch_pairs,
        reference_compat=args.reference_compat)
    print(stats)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
