"""PyTorch checkpoint -> Flax params conversion.

Imports reference `.pth` state_dicts (reference train.py:190 /
inference.py:69 save/load `EMA_VFI.state_dict()`) into this framework's
`EMAVFI` parameter tree, and torchvision `vgg16` weights into
`VGG16Features` for the perceptual loss. All layout changes are explicit:

- Conv2d weight OIHW -> HWIO (transpose 2,3,1,0)
- Linear weight (out,in) -> (in,out)
- torchvision DeformConv2d weight (out, in/groups, kh, kw) -> HWIO

torch is used only to *read* the pickle (CPU); everything downstream is
numpy/JAX. Works standalone: `python -m vfi_tpu.utils.convert in.pth out.npz`.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv(sd: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{name}.bias"],
    }


def convert_ema_vfi_state_dict(
    sd: Dict[str, np.ndarray], num_blocks: int | None = None
) -> Dict[str, Any]:
    """Map a reference `EMA_VFI.state_dict()` onto `EMAVFI` Flax params.

    Torch-side module names follow the reference's registration order
    (src/models/ema_vfi.py:73-107): Sequential conv_blocks expose their conv
    as `.0`, raw convs as the bare index, the context head's Linear at
    `context_encoding.5`, and each attention block its `offset_conv` /
    `dcn_v2` children.
    """
    if num_blocks is None:
        num_blocks = sum(1 for k in sd
                         if k.startswith("feat_ext_blocks.conv_block_")
                         and k.endswith(".weight"))
    p: Dict[str, Any] = {}
    p["feat_ext_conv1"] = {"conv": _conv(sd, "feat_ext_conv1.0")}
    for i in range(num_blocks):
        p[f"feat_ext_block{i}"] = {"conv": _conv(sd, f"feat_ext_blocks.conv_block_{i}.0")}
    p["ctx_conv1"] = {"conv": _conv(sd, "context_encoding.0.0")}
    p["ctx_conv2"] = {"conv": _conv(sd, "context_encoding.1.0")}
    p["ctx_conv3"] = {"conv": _conv(sd, "context_encoding.2.0")}
    p["ctx_dense"] = {
        "kernel": sd["context_encoding.5.weight"].transpose(1, 0),
        "bias": sd["context_encoding.5.bias"],
    }
    p["motion_conv1"] = {"conv": _conv(sd, "motion_estimation.0.0")}
    p["motion_conv2"] = {"conv": _conv(sd, "motion_estimation.1.0")}
    p["motion_conv3"] = {"conv": _conv(sd, "motion_estimation.2")}
    for i in range(num_blocks):
        p[f"fusion_dcn{i}"] = {
            "offset_conv": _conv(sd, f"attention_blocks.{i}.offset_conv"),
            "kernel": sd[f"attention_blocks.{i}.dcn_v2.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"attention_blocks.{i}.dcn_v2.bias"],
        }
    p["rec_conv1"] = {"conv": _conv(sd, "reconstruction.0.0")}
    p["rec_conv2"] = {"conv": _conv(sd, "reconstruction.1.0")}
    p["rec_conv3"] = {"conv": _conv(sd, "reconstruction.2")}
    return {"params": p}


def convert_ema_vfi_torch(pth_path: str, num_blocks: int | None = None) -> Dict[str, Any]:
    """Load a reference `.pth` and return Flax params for `EMAVFI`."""
    return convert_ema_vfi_state_dict(_load_state_dict(pth_path), num_blocks)


# torchvision vgg16 `features` conv indices up to relu4_3 (cfg D).
_VGG16_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)


def convert_vgg16_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map torchvision `vgg16().state_dict()` (or just its `features.*`
    entries) onto `VGG16Features` Flax params (conv0..conv9)."""
    p: Dict[str, Any] = {}
    for our_idx, torch_idx in enumerate(_VGG16_TORCH_CONV_IDX):
        key = f"features.{torch_idx}.weight"
        if key not in sd:  # allow bare `0.weight` naming
            key = f"{torch_idx}.weight"
        p[f"conv{our_idx}"] = {
            "kernel": sd[key].transpose(2, 3, 1, 0),
            "bias": sd[key.replace("weight", "bias")],
        }
    return {"params": p}


def convert_vgg16_torch(pth_path: str) -> Dict[str, Any]:
    return convert_vgg16_state_dict(_load_state_dict(pth_path))


def save_params_npz(params: Dict[str, Any], out_path: str) -> None:
    """Flatten a nested params tree into an npz ('a/b/c' keys)."""
    flat: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    rec(params, "")
    # atomic write (tmp + rename): concurrent readers — the checkpoint-
    # securing watcher, a parallel eval — must never observe a truncated
    # file mid-rewrite
    tmp = out_path + ".tmp.npz"  # .npz suffix so np.savez doesn't append one
    np.savez(tmp, **flat)
    os.replace(tmp, out_path)


def load_params_npz(path: str) -> Dict[str, Any]:
    """Inverse of `save_params_npz`."""
    flat = np.load(path)
    tree: Dict[str, Any] = {}
    for key in flat.files:
        node = tree
        *parents, leaf = key.split("/")
        for part in parents:
            node = node.setdefault(part, {})
        node[leaf] = flat[key]
    return tree


def infer_model_dims(params: Dict[str, Any]) -> Dict[str, int]:
    """Read (in_channels, mid_channels, num_blocks) off an EMAVFI param tree
    so loaders need no side-channel model config."""
    p = params["params"] if "params" in params else params
    kernel = p["feat_ext_conv1"]["conv"]["kernel"]
    return {
        "in_channels": int(kernel.shape[2]) // 2,
        "mid_channels": int(kernel.shape[3]),
        "num_blocks": sum(1 for k in p if k.startswith("feat_ext_block")),
        # Lane-aligned fusion variant (EMAVFI.fuse_project) is visible in
        # the tree as the extra 1x1 projection module.
        "fuse_project": "fuse_proj" in p,
    }


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) not in (2, 3) or (len(argv) == 3 and argv[0] != "--vgg"):
        print("usage: python -m vfi_tpu.utils.convert [--vgg] model.pth out.npz",
              file=sys.stderr)
        return 2
    if argv[0] == "--vgg":
        params = convert_vgg16_torch(argv[1])
        out = argv[2]
    else:
        params = convert_ema_vfi_torch(argv[0])
        out = argv[1]
    save_params_npz(params, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
