"""Closed-loop load generator for the interpolation server.

Measures online-serving throughput and latency percentiles against a
running `serve.py` instance (or an in-process server with --inprocess):
N closed-loop clients POST real Middlebury frame pairs at a fixed
resolution; reports requests/s, per-request latency p50/p99, and the
server-side batching stats (mean batch size = how well coalescing works
at that concurrency).

Example (server on the TPU):
  python serve.py --model_path artifacts/emavfi_q2_best.npz --port 8000 \
      --dcn_max_offset 2 --warp_max_flow 16 --use_pallas --warmup 720x1280 &
  python tools/bench_serve.py --url http://127.0.0.1:8000 \
      --size 720x1280 --clients 16 --requests 64
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfi_tpu.serve import (RAW_CONTENT_TYPE, SEQ_CONTENT_TYPE,  # noqa: E402
                           encode_pair_body, encode_raw_body,
                           encode_seq_body)

DATA = "/root/reference/data/processed/train/RubberWhale"


def _load_pair(h: int, w: int, raw: bool = False, seq: int = 0) -> bytes:
    from PIL import Image

    def frames():
        if os.path.isdir(DATA):
            out = []
            for name in ("frame10.png", "frame11.png"):
                with Image.open(os.path.join(DATA, name)) as im:
                    out.append(np.asarray(
                        im.convert("RGB").resize((w, h), Image.BILINEAR),
                        np.uint8))
            return out
        rng = np.random.default_rng(0)
        return [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
                for _ in range(2)]

    a, b = frames()
    if seq:
        # an (N+1)-frame sequence: linear blends between the real pair
        # (a video-like stream); one request = seq midpoints
        n1 = seq + 1
        fr = np.stack([((a.astype(np.float32) * (1 - t / (n1 - 1))
                         + b.astype(np.float32) * (t / (n1 - 1)))
                        ).astype(np.uint8) for t in range(n1)])
        return encode_seq_body(fr)
    if raw:
        return encode_raw_body(a, b)

    def png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    return encode_pair_body(png(a), png(b))


def run_load(url: str, body: bytes, clients: int, total: int,
             timeout: float, raw: bool = False, seq: int = 0) -> dict:
    latencies: list[float] = []
    errors = [0]
    lock = threading.Lock()
    counter = iter(range(total))

    def client():
        while True:
            with lock:
                if next(counter, None) is None:
                    return
            t0 = time.monotonic()
            try:
                ctype = (SEQ_CONTENT_TYPE if seq
                         else RAW_CONTENT_TYPE if raw
                         else "application/octet-stream")
                req = urllib.request.Request(
                    url + "/v1/interpolate", data=body,
                    headers={"Content-Type": ctype})
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    r.read()
                    ok = r.status == 200
            except Exception:  # noqa: BLE001 - counted, not raised
                ok = False
            with lock:
                if ok:
                    latencies.append(time.monotonic() - t0)
                else:
                    errors[0] += 1

    t_start = time.monotonic()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    lat = sorted(latencies)

    def pct(p):
        return lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3 if lat else None

    stats = None
    try:
        with urllib.request.urlopen(url + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
    except Exception:  # noqa: BLE001 - stats are best-effort
        pass
    return {
        "clients": clients,
        "completed": len(lat),
        "errors": errors[0],
        "wall_s": round(wall, 3),
        "requests_per_s": round(len(lat) / wall, 3) if wall else None,
        "midpoints_per_s": (round(len(lat) * max(1, seq) / wall, 3)
                            if wall else None),
        "latency_ms_p50": round(pct(0.50), 1) if lat else None,
        "latency_ms_p99": round(pct(0.99), 1) if lat else None,
        "server_stats": stats,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--url", default=None,
                        help="base URL of a running server; omit with "
                             "--inprocess")
    parser.add_argument("--inprocess", action="store_true",
                        help="stand up an in-process server (needs "
                             "--model_path)")
    parser.add_argument("--model_path", default="artifacts/emavfi_q2_best.npz")
    parser.add_argument("--size", default="720x1280", help="HxW of the pair")
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--requests", type=int, default=64)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_px_per_launch", type=int, default=5_000_000,
                        help="HBM guard (see cli/serve.py); 0 = uncapped")
    parser.add_argument("--max_delay_ms", type=float, default=5.0)
    parser.add_argument("--timeout", type=float, default=600.0)
    parser.add_argument("--use_pallas", action="store_true")
    parser.add_argument("--raw", action="store_true",
                        help="use the zero-codec raw-RGB protocol "
                             "(application/x-vfi-raw) instead of PNG")
    parser.add_argument("--seq", type=int, default=0,
                        help="N>0: each request is an (N+1)-frame raw "
                             "sequence -> N midpoints (ships each frame "
                             "once — the relay-bandwidth fast path)")
    parser.add_argument("--f32_transfer", action="store_true",
                        help="in-process engine ships float32 to the device "
                             "instead of the default uint8")
    parser.add_argument("--dcn_max_offset", type=int, default=None)
    parser.add_argument("--warp_max_flow", type=int, default=None)
    args = parser.parse_args(argv)

    h, w = (int(v) for v in args.size.lower().split("x"))
    body = _load_pair(h, w, raw=args.raw, seq=args.seq)

    server = None
    url = args.url
    if args.inprocess or url is None:
        from vfi_tpu.cli.common import load_model_params, setup
        from vfi_tpu.infer.pair import FrameInterpolator
        from vfi_tpu.serve import InterpolationServer

        setup()
        engine = FrameInterpolator(load_model_params(args.model_path),
                                   dcn_max_offset=args.dcn_max_offset,
                                   warp_max_flow=args.warp_max_flow,
                                   use_pallas=args.use_pallas,
                                   io_uint8=not args.f32_transfer)
        server = InterpolationServer(engine, port=0,
                                     max_batch=args.max_batch,
                                     max_px_per_launch=(args.max_px_per_launch
                                                        or None),
                                     max_delay_ms=args.max_delay_ms,
                                     request_timeout=args.timeout).start()
        # Warm the exact route under test: an unwarmed seq bucket pays its
        # first-request compile inside the measurement window (the round-4
        # A/B failure: every request timed out behind a ~3-min compile).
        t_warm = time.monotonic()
        if args.seq:
            server.warmup([(args.seq + 1, h, w)])
        else:
            server.warmup([(h, w)])
        print(f"# warmup {time.monotonic() - t_warm:.1f}s", file=sys.stderr)
        url = f"http://127.0.0.1:{server.port}"

    result = run_load(url, body, args.clients, args.requests, args.timeout,
                      raw=args.raw, seq=args.seq)
    result["size"] = f"{h}x{w}"
    result["protocol"] = (f"seq{args.seq}" if args.seq
                          else "raw" if args.raw else "png")
    result["max_batch"] = args.max_batch
    result["max_px_per_launch"] = args.max_px_per_launch or None
    if server is not None:
        result["launch_batch"] = server.batcher.launch_size((h, w))
    print(json.dumps(result))
    if server is not None:
        server.shutdown()
    return 0 if result["errors"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
