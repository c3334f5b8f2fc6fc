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
            tile_w: int | None = None, dcn_kernel: str = "v4") -> None:
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
    model = EMAVFI(dtype=jnp.bfloat16, dcn_max_offset=2, warp_max_flow=16,
                   use_pallas=use_pallas, dcn_tile_w=tile_w,
                   dcn_kernel=dcn_kernel, **kw)
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
    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                per_op[_strip(name)] += dur
    # category roll-up
    for op, ms in per_op.items():
        if "custom-call" in op or "tpu_custom_call" in op:
            cat = "pallas-kernels"
        elif op.startswith(("fusion", "convolution", "dot")):
            cat = op.split(".")[0]
        elif op.startswith(("copy", "bitcast", "transpose", "reshape")):
            cat = "layout"
        elif op.startswith(("all-", "collective")):
            cat = "collectives"
        else:
            cat = "other"
        per_cat[cat] += ms
    return per_op, per_cat, total


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
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--keep", default=None,
                   help="keep the trace under this dir (default: tempdir)")
    args = p.parse_args()

    logdir = args.keep or tempfile.mkdtemp(prefix="vfi_prof_")
    if not glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True):  # reuse an existing kept trace
        capture(args.b, args.h, args.w, args.iters, logdir,
                use_pallas=not args.no_pallas, ckpt=args.ckpt,
                tile_w=args.tile_w, dcn_kernel=args.dcn_kernel)
    per_op, per_cat, total = aggregate(logdir)

    n_frames = args.b * args.iters
    print(f"\ntotal device op time: {total:.1f} ms "
          f"({total / n_frames:.1f} ms/frame over {n_frames} frames)")
    print("\nby category (ms, ms/frame):")
    for cat, ms in per_cat.most_common():
        print(f"  {cat:18s} {ms:9.1f}  {ms / n_frames:7.2f}")
    print(f"\ntop {args.top} ops (ms, ms/frame):")
    for op, ms in per_op.most_common(args.top):
        print(f"  {op:48s} {ms:9.1f}  {ms / n_frames:7.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
