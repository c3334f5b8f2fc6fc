"""BASELINE config-4 demo: clip frame-rate upconversion, timed.

Synthesizes a moving-texture clip at the requested resolution/fps with
OpenCV (the reference's video IO, /root/reference/inference.py:80-99),
runs `infer.py video` on it (recursive-midpoint upconversion to
--target_fps, scale 1.0 so the model sees the full resolution), and
writes ONE json file with the wall-clock numbers:

  {"resolution": "1920x1080", "in_frames": N, "out_frames": M,
   "interpolated_frames": K, "wall_s": S,
   "interpolated_frames_per_sec": K/S, "output_fps": F}

The wall clock covers the whole CLI run — decode, model compile, device
transfers, interpolation, and encode — i.e. the end-to-end number a user
of the reference's inference.py would experience, not the bench.py
steady-state kernel number.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def synthesize_clip(path: str, h: int, w: int, frames: int, fps: float) -> None:
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not out.isOpened():
        raise RuntimeError(f"cannot open VideoWriter for {path}")
    # Textured content with global + local motion so interpolation is
    # non-trivial: a drifting sinusoidal texture plus two moving blocks.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(0)
    noise = rng.uniform(0, 255, size=(h, w)).astype(np.float32)
    for t in range(frames):
        base = (
            127 + 60 * np.sin(0.05 * (xx + 6.0 * t))
            + 40 * np.sin(0.08 * (yy - 4.0 * t))
        )
        frame = np.stack(
            [base, np.roll(noise, 3 * t, axis=1), np.roll(noise, -2 * t, axis=0)],
            axis=-1,
        )
        bx = int((0.2 * w + 9.0 * t) % (w - 160))
        by = int((0.3 * h + 5.0 * t) % (h - 160))
        frame[by : by + 160, bx : bx + 160] = (255, 64, 64)
        out.write(np.clip(frame, 0, 255).astype(np.uint8))
    out.release()


def count_frames(path: str) -> tuple:
    import cv2

    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return n, fps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--fps", type=float, default=15.0)
    ap.add_argument("--target_fps", type=float, default=60.0)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--flow_model", default=None)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--batch_pairs", type=int, default=4)
    ap.add_argument("--radius", type=int, default=2,
                    help="dcn_max_offset (1 = round-5 flagship)")
    ap.add_argument("--dcn_tile_w", type=int, default=None,
                    help="explicit Pallas column-tile width (smaller kernel "
                         "working set at large widths)")
    ap.add_argument("--workdir", default="runs/video_demo")
    ap.add_argument("--out_json", default="artifacts/video_upconv_demo.json")
    args = ap.parse_args(argv)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, args.workdir), exist_ok=True)
    src = os.path.join(repo, args.workdir, f"in_{args.height}p.mp4")
    dst = os.path.join(repo, args.workdir, f"out_{args.height}p.mp4")
    synthesize_clip(src, args.height, args.width, args.frames, args.fps)

    cmd = [
        sys.executable, os.path.join(repo, "infer.py"), "video",
        "--input_video", src, "--output_video", dst,
        "--model_path", args.model_path,
        "--target_fps", str(args.target_fps),
        "--scale", str(args.scale),
        "--batch_pairs", str(args.batch_pairs),
        "--use_pallas", "--dcn_max_offset", str(args.radius),
        "--warp_max_flow", "16",
    ]
    if args.flow_model:
        cmd += ["--flow_prior", "--flow_model", args.flow_model]
    if args.dcn_tile_w is not None:
        cmd += ["--dcn_tile_w", str(args.dcn_tile_w)]
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=repo)
    wall = time.time() - t0

    out_frames, out_fps = count_frames(dst)
    interpolated = out_frames - args.frames
    report = {
        "resolution": f"{args.width}x{args.height}",
        "in_frames": args.frames,
        "in_fps": args.fps,
        "out_frames": out_frames,
        "output_fps": out_fps,
        "interpolated_frames": interpolated,
        "wall_s": round(wall, 2),
        "interpolated_frames_per_sec": round(interpolated / wall, 3),
        "scale": args.scale,
        "model_path": args.model_path,
        "note": "end-to-end CLI wall clock incl. compile + codec; "
                "steady-state kernel throughput is bench.py",
    }
    with open(os.path.join(repo, args.out_json), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
