"""Adjudicate the quality-parity criterion (BASELINE.json:5).

The north star is "Middlebury-val PSNR/SSIM within 0.1 dB of the PyTorch
reference". The reference publishes no numbers and its checkpoint is
stripped, so the denominator is the reference-exact CPU training run
(tools/train_reference_cpu.py) and the numerator is the vfi_tpu trainer run
under identical semantics (target_unit_range=false, same loss weights, the
SAME random-VGG weights, per-frame jitter). Both runs snapshot per epoch;
this tool takes a budget-matched epoch K, pushes BOTH checkpoints through
the IDENTICAL eval harness (cli/eval.py, native 640x480, reference
val set), and reports the delta.

Usage (after/while the two runs train):
    python tools/parity_report.py [--epoch K] [--out artifacts/parity.json]

Epoch defaults to the latest epoch for which both sides have a snapshot.
Evaluation is subprocess-bounded (the TPU eval takes ~1 min per side).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _epochs(dirpath: str, pattern: str) -> dict[int, str]:
    out = {}
    if os.path.isdir(dirpath):
        for name in os.listdir(dirpath):
            m = re.fullmatch(pattern, name)
            if m:
                out[int(m.group(1))] = os.path.join(dirpath, name)
    return out


def _torch_snapshot_to_npz(pt_path: str, npz_path: str) -> None:
    """epoch_K.pt holds the full train state; extract the model state_dict
    and convert to Flax npz (vfi_tpu.utils.convert name/layout map)."""
    import torch

    from vfi_tpu.utils.convert import (convert_ema_vfi_state_dict,
                                       save_params_npz)

    st = torch.load(pt_path, weights_only=False, map_location="cpu")
    sd = st["model"] if isinstance(st, dict) and "model" in st else st
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    params = convert_ema_vfi_state_dict(sd_np)
    save_params_npz(params, npz_path)


def _eval(npz_path: str, data_dir: str, timeout: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "eval.py", "--data-dir", data_dir,
         "--model_path", npz_path, "--json"],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"eval failed for {npz_path}: "
                           f"{proc.stderr[-500:]}")
    return json.loads(lines[-1])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_dir", default="runs/parity_torch")
    ap.add_argument("--jax_dir", default="runs/parity_jax/checkpoints")
    ap.add_argument("--epoch", type=int, default=0,
                    help="budget-matched epoch (0 = latest common)")
    ap.add_argument("--data-dir", default="/root/reference/data/processed/val")
    ap.add_argument("--out", default="artifacts/parity_report.json")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args(argv)

    tsnap = _epochs(os.path.join(args.torch_dir, "snapshots"),
                    r"epoch_(\d+)\.pt")
    jsnap = _epochs(os.path.join(args.jax_dir, "snapshots"),
                    r"epoch_(\d+)\.npz")
    common = sorted(set(tsnap) & set(jsnap))
    if not common:
        print(json.dumps({"error": "no common snapshot epoch",
                          "torch_epochs": sorted(tsnap)[-3:],
                          "jax_epochs": sorted(jsnap)[-3:]}))
        return 1
    epoch = args.epoch or common[-1]
    if epoch not in tsnap or epoch not in jsnap:
        print(json.dumps({"error": f"epoch {epoch} not in both runs",
                          "common_tail": common[-5:]}))
        return 1

    with tempfile.TemporaryDirectory() as td:
        torch_npz = os.path.join(td, f"torch_epoch_{epoch}.npz")
        _torch_snapshot_to_npz(tsnap[epoch], torch_npz)
        ref = _eval(torch_npz, args.data_dir, args.timeout)
        ours = _eval(jsnap[epoch], args.data_dir, args.timeout)

    d_psnr = ours["mean_psnr"] - ref["mean_psnr"]
    d_ssim = ours["mean_ssim"] - ref["mean_ssim"]
    report = {
        "epoch": epoch,
        "reference_torch": {"psnr": ref["mean_psnr"], "ssim": ref["mean_ssim"]},
        "vfi_tpu": {"psnr": ours["mean_psnr"], "ssim": ours["mean_ssim"]},
        "delta_psnr_db": round(d_psnr, 4),
        "delta_ssim": round(d_ssim, 4),
        # parity = ours within 0.1 dB BELOW the reference (being better
        # than the reference is not a parity failure)
        "parity_within_0.1db": bool(d_psnr >= -0.1),
        "per_scene_delta": {
            s: round(ours["scenes"][s]["psnr"] - ref["scenes"][s]["psnr"], 3)
            for s in ref.get("scenes", {}) if s in ours.get("scenes", {})},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)

    print(f"budget-matched epoch {epoch}:")
    print(f"  torch reference  {ref['mean_psnr']:.3f} dB / "
          f"{ref['mean_ssim']:.4f} SSIM")
    print(f"  vfi_tpu          {ours['mean_psnr']:.3f} dB / "
          f"{ours['mean_ssim']:.4f} SSIM")
    print(f"  delta            {d_psnr:+.3f} dB / {d_ssim:+.4f} "
          f"-> parity(<=0.1dB): {report['parity_within_0.1db']}")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
