"""Per-op TPU time breakdown of the flagship forward (jax.profiler xplane).

Captures a trace of K chained forwards at the bench shape, then parses the
.xplane.pb (tensorboard_plugin_profile protobuf) and aggregates XLA op
durations on the TPU device plane. This is the measurement tools the
reference lacks entirely (SURVEY §5: its only observability is tqdm).

Usage (TPU): python tools/profile_forward.py [--iters 4] [--b 4]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def capture(b: int, h: int, w: int, iters: int, logdir: str,
            use_pallas: bool = True, ckpt: str | None = None,
            tile_w: int | None = None, dcn_kernel: str = "v4",
            radius: int = 2, conv_kernel: str = "xla") -> None:
    from vfi_tpu.models import EMAVFI

    kw = {}
    if ckpt:
        # trained checkpoint: offset-data-dependent DCN cost (the honest
        # regime, docs/PERFORMANCE.md "Bench honesty"); topology
        # auto-detected (fuse_project checkpoints profile unchanged)
        from vfi_tpu.utils.convert import infer_model_dims, load_params_npz

        params = load_params_npz(ckpt)
        kw["fuse_project"] = infer_model_dims(params).get("fuse_project",
                                                          False)
    model = EMAVFI(dtype=jnp.bfloat16, dcn_max_offset=radius,
                   warp_max_flow=16,
                   use_pallas=use_pallas, dcn_tile_w=tile_w,
                   dcn_kernel=dcn_kernel, conv_kernel=conv_kernel, **kw)
    if not ckpt:
        small = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), small, small)

    @jax.jit
    def chain(p, a, b_):
        def body(x, _):
            return model.apply(p, x, b_), None
        y, _ = jax.lax.scan(body, a, None, length=iters)
        return y.mean()

    f0 = jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 3), jnp.float32)
    f1 = jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3), jnp.float32)
    float(chain(params, f0, f1))  # compile + warm
    with jax.profiler.trace(logdir):
        float(chain(params, f0, f1))


def _strip(name: str) -> str:
    """fusion.123 -> fusion; %custom-call.4 -> custom-call."""
    name = name.split("/")[-1]
    name = re.sub(r"[%\"]", "", name)
    return re.sub(r"\.\d+$", "", name).strip()


def aggregate(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0
    raw = []  # (start_ps, end_ps, op_name)
    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                start = line.timestamp_ns * 1000 + ev.offset_ps
                raw.append((start, start + ev.duration_ps, name))
    # Drop control-flow CONTAINER events (the scan/while wrapper spans the
    # whole trace and would swallow every category): anything whose name
    # marks an HLO while/conditional, or any single event covering >80% of
    # the trace span — their children are reported individually.
    if raw:
        w0 = min(s for s, _, _ in raw)
        w1 = max(e for _, e, _ in raw)
        span = max(w1 - w0, 1)
        raw = [r for r in raw
               if " condition=" not in r[2] and " body=" not in r[2]
               and not _strip(r[2]).startswith(("while", "conditional"))
               and (r[1] - r[0]) <= 0.8 * span]
    events = []  # (start_ps, end_ps, category) for the timeline view
    for start, end, name in raw:
        dur = (end - start) / 1e9  # ms
        total += dur
        op = _strip(name)
        per_op[op] += dur
        events.append((start, end, _cat(op)))
    for op, ms in per_op.items():
        per_cat[_cat(op)] += ms
    return per_op, per_cat, total, events


def _cat(op: str) -> str:
    if "custom-call" in op or "tpu_custom_call" in op:
        return "pallas-kernels"
    if op.startswith(("fusion", "convolution", "dot")):
        return op.split(".")[0]
    if op.startswith(("copy", "bitcast", "transpose", "reshape")):
        return "layout"
    if op.startswith(("all-", "collective")):
        return "collectives"
    return "other"


def _union_ms(iv) -> float:
    """Total covered time (ms) of a list of (start_ps, end_ps) intervals."""
    out = 0
    cur_s = cur_e = None
    for s, e in sorted(iv):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                out += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        out += cur_e - cur_s
    return out / 1e9


def timeline(events):
    """WALL-accurate attribution (VERDICT r4 #7): per-category busy time
    as an interval UNION on the device timeline (overlapping/queued events
    are not double-counted, unlike the summed-duration view), plus the
    device idle gap — so the rows sum to the measured wall exactly."""
    if not events:
        return {}, 0.0, 0.0
    wall = (max(e for _, e, _ in events) - min(s for s, _, _ in events)) / 1e9
    busy = _union_ms([(s, e) for s, e, _ in events])
    by_cat = {}
    cats = sorted({c for _, _, c in events})
    for c in cats:
        by_cat[c] = _union_ms([(s, e) for s, e, cc in events if cc == c])
    return by_cat, busy, wall


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--b", type=int, default=4)
    p.add_argument("--h", type=int, default=720)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--ckpt", default=None,
                   help="trained checkpoint npz (trained-offset regime; "
                        "fuse_project topology auto-detected)")
    p.add_argument("--tile_w", type=int, default=None)
    p.add_argument("--dcn_kernel", default="v4", choices=("v4", "v5"))
    p.add_argument("--radius", type=int, default=2,
                   help="dcn_max_offset (1 = round-5 flagship)")
    p.add_argument("--conv_kernel", default="xla", choices=("xla", "pallas"))
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--keep", default=None,
                   help="keep the trace under this dir (default: tempdir)")
    args = p.parse_args()

    logdir = args.keep or tempfile.mkdtemp(prefix="vfi_prof_")
    if not glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True):  # reuse an existing kept trace
        capture(args.b, args.h, args.w, args.iters, logdir,
                use_pallas=not args.no_pallas, ckpt=args.ckpt,
                tile_w=args.tile_w, dcn_kernel=args.dcn_kernel,
                radius=args.radius, conv_kernel=args.conv_kernel)
    per_op, per_cat, total, events = aggregate(logdir)

    n_frames = args.b * args.iters
    print(f"\ntotal device op time: {total:.1f} ms "
          f"({total / n_frames:.1f} ms/frame over {n_frames} frames)")
    print("\nby category (ms, ms/frame; SUMMED durations — overlapping "
          "events double-count):")
    for cat, ms in per_cat.most_common():
        print(f"  {cat:18s} {ms:9.1f}  {ms / n_frames:7.2f}")

    by_cat, busy, wall = timeline(events)
    print(f"\nTIMELINE attribution (interval union — rows sum to wall):")
    print(f"  trace wall span     {wall:9.1f}  {wall / n_frames:7.2f}")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:18s} {ms:9.1f}  {ms / n_frames:7.2f}")
    overlap = sum(by_cat.values()) - busy
    print(f"  cross-cat overlap  {-overlap:9.1f}  {-overlap/n_frames:7.2f}")
    print(f"  device idle gaps    {wall - busy:9.1f}  "
          f"{(wall - busy) / n_frames:7.2f}")

    print(f"\ntop {args.top} ops (ms, ms/frame):")
    for op, ms in per_op.most_common(args.top):
        print(f"  {op:48s} {ms:9.1f}  {ms / n_frames:7.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
