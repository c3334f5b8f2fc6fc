"""Reference-exact CPU training of the torch reconstruction — establishes
the quality-parity BASELINE for BASELINE.json:5.

The reference publishes no PSNR/SSIM and its checkpoint is stripped, so the
parity criterion ("within 0.1 dB of the PyTorch reference") has no
denominator until a reference-trained run exists. This script trains
`tools.torch_reference.EMA_VFI_Torch` under the reference's EXACT training
semantics (reference train.py:99-194):

- shipped YAML loss weights (charbonnier .5, vgg .15, color .3, gradient .1;
  temporal dead — the reference's flow estimator is missing, train.py:72-80),
- ImageNet-NORMALIZED targets vs the model's [0,1] output (the reference's
  loss-scale quirk, train.py:40-43 vs ema_vfi.py:146),
- per-frame-independent color jitter (the reference's augmentation bug,
  data_utils.py:72-76), rotation/flip/grayscale on, 256x256 crops,
- AdamW(5e-4, wd 1e-5), grad-clip 0.1, ReduceLROnPlateau(0.5, patience 5),
  batch 4.

Known deviations (each forced by this environment, none affecting the
converged-quality comparison):
- torchvision is absent: DCNv2 is the validated grid_sample reconstruction
  (`fast_dcn=True`, ~6e-6 from the numpy-oracle-checked slow path) and VGG16
  uses RANDOM weights (no egress to download pretrained ones). The script
  saves its random VGG state_dict (torchvision key layout) so the JAX
  parity run can load the SAME weights:
      python -m vfi_tpu.utils.convert --vgg runs/parity_torch/vgg16_random.pth \
          runs/parity_torch/vgg16_random.npz
  — the two runs then differ only in framework.
- val crops are deterministic (epoch-0 pinned) instead of the reference's
  randomly-augmented val, so the plateau scheduler sees a stable signal.
- data loading reuses vfi_tpu's TripletDataset/DataLoader (byte-parity
  tested against PIL/reference semantics in tests/test_data.py).

The final parity number is NOT computed here: checkpoints are converted
(`vfi_tpu.utils.convert`) and evaluated by `cli/eval.py` at native
resolution, so both frameworks' checkpoints go through the identical
eval harness.

Run (bounded, resumable):
    timeout -s INT 14400 python tools/train_reference_cpu.py \
        --out runs/parity_torch --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.torch_reference import EMA_VFI_Torch  # noqa: E402

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def build_torch_vgg16_features(seed: int = 0) -> nn.Module:
    """torchvision-layout `vgg16().features` trunk (cfg D) up to relu4_3,
    default-initialized with a fixed seed. state_dict keys are
    `features.{i}.weight` — exactly what `convert_vgg16_state_dict` maps, so
    the SAME weights feed both the torch and JAX parity runs."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512]
    torch.manual_seed(seed)
    layers: list[nn.Module] = []
    c_in = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(c_in, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            c_in = v
    holder = nn.Module()
    holder.features = nn.Sequential(*layers)
    return holder


class VGGPerceptual(nn.Module):
    """Reference VGGPerceptualLoss semantics (loss_functions.py:24-69):
    resize both inputs to 224 bilinear, re-normalize with ImageNet stats,
    L1 on ONE tapped layer (relu2_2 per train.py:85)."""

    # torchvision feature index AFTER which each tap is taken
    _TAP_END = {"relu1_2": 4, "relu2_2": 9, "relu3_3": 16, "relu4_3": 23}

    def __init__(self, vgg_holder: nn.Module, layer: str = "relu2_2"):
        super().__init__()
        end = self._TAP_END[layer]
        self.slice = nn.Sequential(*list(vgg_holder.features.children())[:end])
        for p in self.slice.parameters():
            p.requires_grad = False
        self.register_buffer("mean", torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1))
        self.register_buffer("std", torch.tensor(IMAGENET_STD).view(1, 3, 1, 1))

    def forward(self, pred, target):
        def feats(x):
            x = F.interpolate(x, size=(224, 224), mode="bilinear",
                              align_corners=False)
            return self.slice((x - self.mean) / self.std)

        return torch.mean(torch.abs(feats(pred) - feats(target)))


def charbonnier(pred, target, eps=1e-3):
    return torch.mean(torch.sqrt((pred - target) ** 2 + eps * eps))


def sobel_loss(pred, target):
    kx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]],
                      dtype=pred.dtype).view(1, 1, 3, 3)
    ky = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
                      dtype=pred.dtype).view(1, 1, 3, 3)
    c = pred.shape[1]

    def grads(x):
        gx = F.conv2d(x, kx.expand(c, 1, 3, 3), padding=1, groups=c)
        gy = F.conv2d(x, ky.expand(c, 1, 3, 3), padding=1, groups=c)
        return gx, gy

    pgx, pgy = grads(pred)
    tgx, tgy = grads(target)
    return torch.mean(torch.abs(pgx - tgx) + torch.abs(pgy - tgy))


def color_hist_loss(pred, target, bins=256):
    """Exact (zero-grad) per-image per-channel histogram L1, reference
    reduction: sum over channels+bins, averaged over batch
    (loss_functions.py:99-148)."""
    b, c, h, w = pred.shape

    def hists(x):
        idx = torch.clamp(torch.floor(x * bins).long(), 0, bins - 1)
        out = torch.zeros(b, c, bins)
        for bi in range(b):
            for ci in range(c):
                out[bi, ci] = torch.bincount(
                    idx[bi, ci].reshape(-1), minlength=bins).float()
        return out / (h * w)

    return torch.sum(torch.abs(hists(pred) - hists(target))) / b


def total_loss(pred, target, vgg_fn, w):
    terms = {
        "charbonnier": charbonnier(pred, target),
        "vgg": vgg_fn(pred, target),
        "gradient": sobel_loss(pred, target),
    }
    with torch.no_grad():  # zero-grad term; skip autograd bookkeeping
        terms["color"] = color_hist_loss(pred, target)
    tot = (w["charbonnier"] * terms["charbonnier"] + w["vgg"] * terms["vgg"]
           + w["color"] * terms["color"] + w["gradient"] * terms["gradient"])
    return tot, {k: float(v.detach()) for k, v in terms.items()}


def unit_range(t):
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    return torch.clamp(t * std + mean, 0.0, 1.0)


def to_torch(nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        nhwc.transpose(0, 3, 1, 2))).float()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/parity_torch")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--data_root", default="data/processed")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val_batches", type=int, default=0,
                    help="cap val batches per epoch (0 = full val set)")
    args = ap.parse_args(argv)

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    os.makedirs(args.out, exist_ok=True)

    from vfi_tpu.data import AugmentConfig, DataLoader, TripletDataset

    # reference train_config.yaml values
    aug = AugmentConfig(crop_size=(256, 256), random_rotation=True,
                        horizontal_flip=True, brightness=0.2, contrast=0.2,
                        saturation=0.2, hue=0.1, color_jitter=True,
                        random_grayscale=0.2, consistent_jitter=False)
    val_aug = AugmentConfig(crop_size=(256, 256), random_rotation=False,
                            horizontal_flip=False, color_jitter=False,
                            random_grayscale=0.0)
    train_ds = TripletDataset(os.path.join(args.data_root, "train"), 1, aug)
    val_ds = TripletDataset(os.path.join(args.data_root, "val"), 1, val_aug)
    train_loader = DataLoader(train_ds, 4, shuffle=True, seed=args.seed,
                              num_threads=1, prefetch=1)
    val_loader = DataLoader(val_ds, 4, shuffle=False, seed=args.seed,
                            num_threads=1, prefetch=1, drop_last=False)

    torch.manual_seed(args.seed)
    model = EMA_VFI_Torch(fast_dcn=True)
    vgg_holder = build_torch_vgg16_features(seed=args.seed + 1)
    torch.save(vgg_holder.state_dict(),
               os.path.join(args.out, "vgg16_random.pth"))
    vgg_fn = VGGPerceptual(vgg_holder, layer="relu2_2")
    weights = {"charbonnier": 0.5, "vgg": 0.15, "color": 0.3, "gradient": 0.1}

    opt = torch.optim.AdamW(model.parameters(), lr=5e-4, weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.5, patience=5)

    state_path = os.path.join(args.out, "train_state.pt")
    start_epoch, best_val = 0, float("inf")
    if os.path.exists(state_path):
        st = torch.load(state_path, weights_only=False)
        model.load_state_dict(st["model"])
        opt.load_state_dict(st["opt"])
        sched.load_state_dict(st["sched"])
        start_epoch, best_val = st["epoch"] + 1, st["best_val"]
        print(f"resumed from epoch {st['epoch']} (best val {best_val:.4f})",
              flush=True)

    metrics_path = os.path.join(args.out, "metrics.jsonl")

    def save_state(epoch):
        torch.save({"model": model.state_dict(), "opt": opt.state_dict(),
                    "sched": sched.state_dict(), "epoch": epoch,
                    "best_val": best_val}, state_path + ".tmp")
        os.replace(state_path + ".tmp", state_path)

    epoch = start_epoch - 1
    try:
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            model.train()
            train_loader.epoch = epoch
            running, nb = 0.0, 0
            for f0, ft, f1 in train_loader:
                f0t, ftt, f1t = to_torch(f0), to_torch(ft), to_torch(f1)
                pred = model(f0t, f1t)
                loss, terms = total_loss(pred, ftt, vgg_fn, weights)
                opt.zero_grad()
                loss.backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), 0.1)
                opt.step()
                running += float(loss)
                nb += 1
                if nb % 5 == 1:
                    print(f"[epoch {epoch + 1}] step {nb}/{len(train_loader)} "
                          f"loss {float(loss):.4f} {terms}", flush=True)
            train_loss = running / max(nb, 1)

            model.eval()
            val_loader.epoch = 0
            vl, vp, vn = 0.0, 0.0, 0
            with torch.no_grad():
                for bi, (f0, ft, f1) in enumerate(val_loader):
                    if args.val_batches and bi >= args.val_batches:
                        break
                    f0t, ftt, f1t = to_torch(f0), to_torch(ft), to_torch(f1)
                    pred = model(f0t, f1t)
                    loss, _ = total_loss(pred, ftt, vgg_fn, weights)
                    n = f0t.shape[0]
                    gt01 = unit_range(ftt)
                    mse = torch.mean((pred - gt01) ** 2, dim=(1, 2, 3))
                    psnr = float(torch.mean(10.0 * torch.log10(1.0 / mse)))
                    vl += float(loss) * n
                    vp += psnr * n
                    vn += n
            val_loss, val_psnr = vl / max(vn, 1), vp / max(vn, 1)
            dt = time.time() - t0
            print(f"[epoch {epoch + 1}/{args.epochs}] train {train_loss:.4f} "
                  f"val {val_loss:.4f} PSNR(crop) {val_psnr:.2f} "
                  f"lr {opt.param_groups[0]['lr']:.6f} ({dt:.0f}s)", flush=True)
            with open(metrics_path, "a") as f:
                f.write(json.dumps({
                    "epoch": epoch + 1, "train_loss": train_loss,
                    "val_loss": val_loss, "val_psnr_crop": val_psnr,
                    "lr": opt.param_groups[0]["lr"],
                    "seconds": round(dt, 1)}) + "\n")
            if val_loss < best_val:
                best_val = val_loss
                torch.save(model.state_dict(),
                           os.path.join(args.out, "best.pth"))
                print(f"  new best val {val_loss:.4f} -> best.pth", flush=True)
            sched.step(val_loss)
            save_state(epoch)
    except KeyboardInterrupt:
        # state on disk is the last COMPLETED epoch (saved at loop end);
        # deliberately do not persist the partial epoch — resume redoes it
        print("interrupted — resumable from the last completed epoch", flush=True)
        return 130
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
