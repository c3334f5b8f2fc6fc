"""Training-step throughput bench (VERDICT r3 #3: this table never
existed). Measures the jit'd donated train step (fwd + all losses + bwd +
AdamW update) on synthetic batches for kernel-path ablations.

Steps are chained host-side (each call consumes the donated state returned
by the previous one — a real data dependence), so the relay cannot memoize
repeats; the first timed call after warmup is excluded.

Usage:
  timeout -k 5 1800 python tools/bench_train_step.py \
      [--crop 256] [--batch 16] [--iters 6] \
      [--paths xla,pallas,pallas+conv]
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--accum", type=int, default=8,
                    help="gradient-accumulation microbatches (flagship "
                         "recipe: 8 -> microbatch 2 at batch 16)")
    ap.add_argument("--paths", default="xla,pallas,pallas+conv")
    ap.add_argument("--flow_prior", action="store_true", default=True)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np

    from vfi_tpu.utils.config import load_train_config

    # Persistent compile cache (same dir the train CLI's setup() uses):
    # the flagship step's >25-min compile (docs/PERFORMANCE.md) is paid
    # once per (config, shape) — cached reruns start in seconds.
    import os

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    results = {}
    for path in args.paths.split(","):
        overrides = [
            "--batch_size", str(args.batch),
            "--crop_size", f"[{args.crop},{args.crop}]",
            "--target_unit_range", "true",
            "--dcn_max_offset", "2", "--warp_max_flow", "16",
            "--fuse_project", "true",
            "--flow_prior", "true" if args.flow_prior else "false",
            "--flow_photo_pyramid", "true",
            "--cascade_levels", "2",
            "--accum_steps", str(args.accum),
            "--remat", "true",
            "--num_epochs", "1",
        ]
        if path == "xla":
            overrides += ["--use_pallas", "false"]
        elif path == "pallas":
            overrides += ["--use_pallas", "true"]
        elif path == "pallas+conv":
            overrides += ["--use_pallas", "true", "--conv_kernel", "pallas"]
        elif path in ("pallas_oldbwd", "pallas_handbwd"):
            # Ablation: route the Pallas DCN wrappers' VJP through the
            # round-4 HAND-WRITTEN shifts backward
            # (deform_conv2d_shifts_bwd) instead of the production AD
            # backward. Round-5 step-level A/B measured the hand form
            # 2.1x slower (crop 320 b16: 8175 vs 3910 ms/step), which
            # reverted the round-4 default — this path keeps the
            # regression measurable. ("pallas_oldbwd" name kept for
            # compatibility with round-5 queue scripts; before the
            # revert it denoted the AD form.)
            overrides += ["--use_pallas", "true"]

            from vfi_tpu.ops import deform_conv_shifts as _dcs
            from vfi_tpu.ops.pallas import wrappers as _w

            def _hand_bwd(max_offset, tile_w, res, g):
                x, offset, mask, weight, bias = res
                return _dcs.deform_conv2d_shifts_bwd(
                    x, offset, mask, weight, bias, g,
                    max_offset=max_offset)

            _w.deform_conv2d_fast.defvjp(_w._dcn_fwd, _hand_bwd)
            _w.deform_conv2d_fast_v5.defvjp(
                _w._dcn5_fwd,
                lambda mo, tw, res, g: _hand_bwd(mo, tw, res, g))
        else:
            raise SystemExit(f"unknown path {path}")
        cfg = load_train_config("config/train_config.yaml", overrides)

        from vfi_tpu.train.loop import Trainer

        trainer = Trainer(cfg)
        rng = np.random.default_rng(0)
        shape = (args.batch, args.crop, args.crop, 3)
        f0, ft, f1 = (jax.numpy.asarray(
            rng.standard_normal(shape), jax.numpy.float32) for _ in range(3))

        state = trainer.state
        # warmup/compile
        state, metrics = trainer.train_step(state, trainer.vgg_params,
                                            f0, ft, f1)
        jax.block_until_ready(metrics)
        t0 = time.time()
        for _ in range(args.iters):
            state, metrics = trainer.train_step(state, trainer.vgg_params,
                                                f0, ft, f1)
        jax.block_until_ready(metrics)
        dt = (time.time() - t0) / args.iters
        ips = args.batch / dt
        print(f"{path:12s} crop {args.crop} b{args.batch}: "
              f"{dt*1e3:8.1f} ms/step  {ips:7.2f} samples/s", flush=True)
        results[path] = {"ms_per_step": round(dt * 1e3, 1),
                         "samples_per_s": round(ips, 2)}
        del trainer, state
        if path in ("pallas_oldbwd", "pallas_handbwd"):
            # restore the production (AD) VJPs for later paths
            from vfi_tpu.ops.pallas import wrappers as _wr

            _wr.deform_conv2d_fast.defvjp(_wr._dcn_fwd, _wr._dcn_bwd)
            _wr.deform_conv2d_fast_v5.defvjp(_wr._dcn5_fwd, _wr._dcn5_bwd)
    if args.json_out:
        import json

        with open(args.json_out, "w") as fh:
            json.dump({"crop": args.crop, "batch": args.batch,
                       "results": results}, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
