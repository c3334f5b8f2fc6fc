"""Model soup: uniform-average npz checkpoints from the fine-tune lineage.

The q-lineage flagships (q5 -> q6r -> q7 -> q8r2 -> ...) are successive
fine-tunes of one another, i.e. they sit in one loss basin — the setting
where uniform weight averaging ("model soups", Wortsman et al. 2022,
arXiv:2203.05482) tends to beat every ingredient. This averages both the
EMAVFI params and (when every ingredient has one) the companion
SimpleFlowNet checkpoint, so the soup stays a valid flow-prior pair.

Usage:
    python tools/make_soup.py --inputs artifacts/emavfi_q7_best.npz \
        artifacts/emavfi_q8r2_best.npz --out artifacts/emavfi_soup_best.npz

Pure host-side numpy; no device use — safe to run beside a live trainer.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def average_npz(paths: list[str], out: str) -> None:
    stacks: dict[str, list[np.ndarray]] = {}
    keys = None
    for p in paths:
        z = np.load(p)
        if keys is None:
            keys = sorted(z.files)
        elif sorted(z.files) != keys:
            raise ValueError(f"{p}: key set differs from {paths[0]}")
        for k in z.files:
            stacks.setdefault(k, []).append(np.asarray(z[k], dtype=np.float64))
    mean = {k: np.mean(v, axis=0).astype(np.float32) for k, v in stacks.items()}
    np.savez(out, **mean)
    print(f"wrote {out}: mean of {len(paths)} checkpoints, {len(mean)} arrays")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--inputs", nargs="+", required=True,
                    help="model npz checkpoints to average")
    ap.add_argument("--out", required=True, help="output model npz path")
    args = ap.parse_args()

    average_npz(args.inputs, args.out)

    flows = [p.replace(".npz", ".flow.npz") for p in args.inputs]
    if all(os.path.exists(f) for f in flows):
        average_npz(flows, args.out.replace(".npz", ".flow.npz"))
    else:
        missing = [f for f in flows if not os.path.exists(f)]
        print(f"flow soup skipped (missing: {missing})")


if __name__ == "__main__":
    main()
