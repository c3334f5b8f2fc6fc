#!/usr/bin/env python
"""Warm-start surgery: 67-channel fusion checkpoint -> fuse_project (64ch).

Converts a reference-topology EMAVFI checkpoint (fusion stream at
mid_channels + in_channels = 67 channels, reference src/models/ema_vfi.py:
96-99) into an `EMAVFI(fuse_project=True)` tree whose DCN stack runs at
mid_channels (64) — the lane-aligned TPU variant.

Method: pick a KEPT subset S of 64 of the 67 fused-channel indices — the
in_channels warped-RGB channels are always kept (they carry the warped
frame, the reconstruction's main signal); the (in_channels) dropped
channels are the feature dims with the smallest total absolute weight over
every consumer slice (all DCN kernels in/out, offset convs in, rec_conv1
in). The new tree is then:

  fuse_proj.conv.kernel[0, 0, i, a] = 1.0 iff S[a] == i   (selection)
  fusion_dcnK.kernel    = old[:, :, S, :][:, :, :, S]
  fusion_dcnK.bias      = old[S]
  fusion_dcnK.offset_conv.kernel = old[:, :, S, :]
  rec_conv1.conv.kernel = old[:, :, S, :]

i.e. the projected model computes exactly the old model's function
restricted to the kept channels — only the dropped channels'
contributions are lost, which fine-tuning recovers.

Usage: python tools/project_checkpoint.py in.npz out.npz
"""
import sys

import numpy as np


def project_tree(z: dict) -> dict:
    """npz-style flat dict {'params/...': array} -> projected flat dict."""
    p = {k: np.asarray(v) for k, v in z.items()}
    rec1 = p["params/rec_conv1/conv/kernel"]          # (3,3,67,64)
    fused_ch = rec1.shape[2]
    dcn_names = sorted({k.split("/")[1] for k in p
                        if k.startswith("params/fusion_dcn")})
    mid = p["params/feat_ext_conv1/conv/kernel"].shape[3]
    cin = fused_ch - mid                               # warped-RGB channels
    if cin <= 0:
        raise SystemExit(f"checkpoint already projected? fused={fused_ch} "
                         f"mid={mid}")

    # Importance of each fused index over every consumer/producer slice.
    imp = np.zeros(fused_ch)
    for n in dcn_names:
        k = p[f"params/{n}/kernel"]                    # (3,3,67,67)
        imp += np.abs(k).sum(axis=(0, 1, 3))           # as input
        imp += np.abs(k).sum(axis=(0, 1, 2))           # as output
        imp += np.abs(p[f"params/{n}/offset_conv/kernel"]).sum(axis=(0, 1, 3))
    imp += np.abs(rec1).sum(axis=(0, 1, 3))
    imp[mid:] = np.inf                                 # always keep warped RGB
    drop = np.argsort(imp)[:cin]
    keep = np.array(sorted(set(range(fused_ch)) - set(drop.tolist())))
    assert len(keep) == mid

    out = dict(p)
    proj = np.zeros((1, 1, fused_ch, mid), np.float32)
    proj[0, 0, keep, np.arange(mid)] = 1.0
    out["params/fuse_proj/conv/kernel"] = proj
    out["params/fuse_proj/conv/bias"] = np.zeros((mid,), np.float32)
    for n in dcn_names:
        k = p[f"params/{n}/kernel"]
        out[f"params/{n}/kernel"] = k[:, :, keep][:, :, :, keep]
        out[f"params/{n}/bias"] = p[f"params/{n}/bias"][keep]
        out[f"params/{n}/offset_conv/kernel"] = \
            p[f"params/{n}/offset_conv/kernel"][:, :, keep]
    out["params/rec_conv1/conv/kernel"] = rec1[:, :, keep]
    return out, sorted(drop.tolist())


def main(argv):
    if len(argv) != 2:
        print(__doc__)
        return 2
    z = np.load(argv[0])
    out, dropped = project_tree({k: z[k] for k in z.files})
    np.savez(argv[1], **out)
    print(f"wrote {argv[1]}  (dropped fused channels: {dropped})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
