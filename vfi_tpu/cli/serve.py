"""`python serve.py` — online interpolation serving (HTTP).

The reference has no serving mode (its inference.py:61 is an offline video
script); this entry point stands up the micro-batched HTTP server
(vfi_tpu/serve/) over the same FrameInterpolator configurations the batch
CLIs use, including the data-parallel mesh and Pallas kernels.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="EMAVFI online interpolation server (TPU-native)")
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=8,
                        help="device batch per launch; every launch is "
                             "padded to this so each (H, W) bucket compiles "
                             "exactly once")
    parser.add_argument("--max_delay_ms", type=float, default=5.0,
                        help="max time a request waits for batch-mates")
    parser.add_argument("--max_px_per_launch", type=int, default=5_000_000,
                        help="HBM guard: shrink a bucket's launch batch so "
                             "batch*H*W stays within this pixel budget "
                             "(0 = uncapped). Default from measurement: "
                             "batch 8 x 720p (7.4M px) needs 19.3G vs the "
                             "chip's 15.75G HBM; 5M px keeps 720p at batch "
                             "5 and 1080p at batch 2, both validated")
    parser.add_argument("--no_pad_to_max", action="store_true",
                        help="launch partial batches at their real size "
                             "(one compile per observed batch size)")
    parser.add_argument("--request_timeout", type=float, default=120.0)
    parser.add_argument("--warmup", default=None,
                        help="comma-separated buckets to pre-compile: HxW "
                             "pair buckets (720x1280,1080x1920) and/or "
                             "N@HxW sequence shapes (8@720x1280 = 9-frame "
                             "x-vfi-raw-seq requests)")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--dcn_max_offset", type=int, default=None)
    parser.add_argument("--warp_max_flow", type=int, default=None)
    parser.add_argument("--use_pallas", action="store_true")
    parser.add_argument("--dcn_tile_w", type=int, default=None,
                        help="explicit Pallas DCN column-tile width (e.g. 256): per-tile skip predicates are tighter on trained offsets; bit-identical, auto-ignored for widths it does not divide")
    parser.add_argument("--flow_prior", action="store_true")
    parser.add_argument("--flow_model", default=None)
    parser.add_argument("--flow_prior_scale", type=float, default=0.5)
    parser.add_argument("--flow_mid_channels", type=int, default=32)
    parser.add_argument("--flow_levels", type=int, default=3)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--f32_transfer", action="store_true",
                        help="ship float32 frames to the device instead of "
                             "the default uint8 on-device conversion "
                             "(io_uint8 quarters host<->device bytes)")
    parser.add_argument("--png_compress_level", type=int, default=1,
                        help="zlib level for response PNGs (0-9; default 1 "
                             "— level 6 dominated serving latency on a "
                             "1-core host). Raw-RGB requests skip the "
                             "codec entirely.")
    args = parser.parse_args(argv)

    from vfi_tpu.cli.common import load_model_params, setup
    setup()
    params = load_model_params(args.model_path)
    flow_params = None
    if args.flow_prior:
        flow_path = args.flow_model or (
            args.model_path[:-4] if args.model_path.endswith(".npz")
            else args.model_path) + ".flow.npz"
        flow_params = load_model_params(flow_path)

    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.serve import InterpolationServer

    engine = FrameInterpolator(params, bf16=not args.fp32,
                               dcn_max_offset=args.dcn_max_offset,
                               warp_max_flow=args.warp_max_flow,
                               use_pallas=args.use_pallas,
                               dcn_tile_w=args.dcn_tile_w,
                               flow_params=flow_params,
                               flow_prior_scale=args.flow_prior_scale,
                               flow_mid_channels=args.flow_mid_channels,
                               flow_levels=args.flow_levels,
                               io_uint8=not args.f32_transfer)
    server = InterpolationServer(engine, host=args.host, port=args.port,
                                 max_batch=args.max_batch,
                                 max_delay_ms=args.max_delay_ms,
                                 pad_to_max=not args.no_pad_to_max,
                                 request_timeout=args.request_timeout,
                                 verbose=args.verbose,
                                 png_compress_level=args.png_compress_level,
                                 max_px_per_launch=(args.max_px_per_launch
                                                    or None))
    if args.warmup:
        for spec in args.warmup.split(","):
            spec = spec.lower()
            if "@" in spec:  # sequence route: N@HxW = (N+1)-frame requests
                n, hw = spec.split("@")
                h, w = (int(v) for v in hw.split("x"))
                print(f"warmup: compiling {int(n) + 1}-frame {h}x{w} "
                      "sequence graphs")
                server.warmup([(int(n) + 1, h, w)])
                continue
            h, w = (int(v) for v in spec.split("x"))
            b = server.batcher.launch_size((h, w))
            print(f"warmup: compiling {h}x{w} bucket (batch {b})")
            server.warmup([(h, w)])
    print(f"serving on http://{args.host}:{server.port} "
          f"(POST /v1/interpolate, GET /healthz, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
