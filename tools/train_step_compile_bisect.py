"""Bisect the flagship train-step COMPILE wall (VERDICT r4 #4).

The full fine-tune recipe (cascade-2 + flow-prior + VGG + 8-microbatch
accum scan + remat, crop 256/320) takes this toolchain's compiler >25
minutes (docs/PERFORMANCE.md "Training-step throughput"), which gated
every round-4 training measurement. This tool walks a feature LADDER from
a minimal step to the flagship recipe, timing `Trainer.train_step`'s AOT
`jit(...).lower(...).compile()` in a BOUNDED subprocess per probe (a
wedged compile must not take the session down — same policy as
tools/compile_bisect.py), and appends one JSON line per probe to
artifacts/train_compile_bisect.jsonl.

The probe subprocess uses a THROWAWAY compile-cache dir so every probe
measures a true cold compile (the production CLI path keeps its
persistent .jax_cache — see vfi_tpu/cli/common.py setup()).

Usage:
    python tools/train_step_compile_bisect.py               # full ladder
    python tools/train_step_compile_bisect.py --only full256_pallas
    python tools/train_step_compile_bisect.py --timeout 1500
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = ["--batch_size", "4", "--target_unit_range", "true",
        "--warp_max_flow", "16", "--fuse_project", "true",
        "--dcn_max_offset", "1", "--num_epochs", "1",
        "--use_pallas", "false"]

# name -> overrides, smallest first. Each row adds ONE axis over a prior
# row so the compile-time delta names the axis.
LADDER = [
    ("base128", ["--crop_size", "[128,128]", "--accum_steps", "1",
                 "--cascade_levels", "1", "--flow_prior", "false",
                 "--remat", "false"]),
    ("base128_remat", ["--crop_size", "[128,128]", "--accum_steps", "1",
                       "--cascade_levels", "1", "--flow_prior", "false",
                       "--remat", "true"]),
    ("base128_cascade2", ["--crop_size", "[128,128]", "--accum_steps", "1",
                          "--cascade_levels", "2", "--flow_prior", "false",
                          "--remat", "false"]),
    ("base128_flow", ["--crop_size", "[128,128]", "--accum_steps", "1",
                      "--cascade_levels", "1", "--flow_prior", "true",
                      "--flow_photo_pyramid", "true", "--remat", "false"]),
    ("base128_accum8", ["--crop_size", "[128,128]", "--accum_steps", "4",
                        "--batch_size", "8",
                        "--cascade_levels", "1", "--flow_prior", "false",
                        "--remat", "false"]),
    ("full128", ["--crop_size", "[128,128]", "--accum_steps", "4",
                 "--batch_size", "8",
                 "--cascade_levels", "2", "--flow_prior", "true",
                 "--flow_photo_pyramid", "true", "--remat", "true"]),
    ("full256", ["--crop_size", "[256,256]", "--accum_steps", "4",
                 "--batch_size", "8",
                 "--cascade_levels", "2", "--flow_prior", "true",
                 "--flow_photo_pyramid", "true", "--remat", "true"]),
    ("full256_pallas", ["--crop_size", "[256,256]", "--accum_steps", "4",
                        "--batch_size", "8",
                        "--cascade_levels", "2", "--flow_prior", "true",
                        "--flow_photo_pyramid", "true", "--remat", "true",
                        "--use_pallas", "true"]),
    ("full256_pallasconv", ["--crop_size", "[256,256]", "--accum_steps",
                            "4", "--batch_size", "8",
                            "--cascade_levels", "2", "--flow_prior", "true",
                            "--flow_photo_pyramid", "true",
                            "--remat", "true", "--use_pallas", "true",
                            "--conv_kernel", "pallas"]),
    # The EXACT flagship fine-tune recipe (crop 320, batch 16, accum 8)
    # whose >25-min compile is the documented round-4 wall — reproduced
    # here as its own probe so the bisect can say whether the wall is the
    # shape, the feature set, or (if this probes fast on a quiet host)
    # the round-4 measurement's host contention.
    ("flagship320", ["--crop_size", "[320,320]", "--accum_steps", "8",
                     "--batch_size", "16",
                     "--cascade_levels", "2", "--flow_prior", "true",
                     "--flow_photo_pyramid", "true", "--remat", "true",
                     "--use_pallas", "true"]),
    ("flagship320_xla", ["--crop_size", "[320,320]", "--accum_steps", "8",
                         "--batch_size", "16",
                         "--cascade_levels", "2", "--flow_prior", "true",
                         "--flow_photo_pyramid", "true", "--remat", "true"]),
]

PROBE = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "@@REPO@@")
import jax
# throwaway cache: measure a true cold compile
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
import numpy as np
from vfi_tpu.utils.config import load_train_config
from vfi_tpu.train.loop import Trainer

overrides = json.loads(sys.argv[1])
cfg = load_train_config(os.path.join("@@REPO@@", "config/train_config.yaml"),
                        overrides)
t0 = time.time()
trainer = Trainer(cfg)
t_build = time.time() - t0
crop = cfg.crop_size[0]
shape = (cfg.batch_size, crop, crop, 3)
rng = np.random.default_rng(0)
args = tuple(jax.numpy.asarray(rng.standard_normal(shape),
                               jax.numpy.float32) for _ in range(3))
t0 = time.time()
lowered = trainer.train_step.lower(trainer.state, trainer.vgg_params, *args)
t_lower = time.time() - t0
t0 = time.time()
lowered.compile()
t_compile = time.time() - t0
print(json.dumps({"build_s": round(t_build, 1),
                  "lower_s": round(t_lower, 1),
                  "compile_s": round(t_compile, 1)}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--only", default=None,
                    help="comma list of ladder names to run")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "train_compile_bisect.jsonl"))
    args = ap.parse_args()

    probe_src = PROBE.replace("@@REPO@@", REPO)
    names = set(args.only.split(",")) if args.only else None
    for name, extra in LADDER:
        if names is not None and name not in names:
            continue
        overrides = BASE + extra
        t0 = time.time()
        row = {"name": name, "overrides": overrides,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe_src, json.dumps(overrides)],
                capture_output=True, text=True, timeout=args.timeout,
                cwd=REPO)
            out = (proc.stdout or "").strip().splitlines()
            if proc.returncode == 0 and out:
                row.update(json.loads(out[-1]))
                row["ok"] = True
            else:
                row.update(ok=False, rc=proc.returncode,
                           err=(proc.stderr or "")[-400:])
        except subprocess.TimeoutExpired:
            row.update(ok=False, timeout_s=args.timeout,
                       wall_s=round(time.time() - t0, 1))
        with open(args.out, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(json.dumps({k: v for k, v in row.items()
                          if k not in ("overrides",)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
