"""Measure the PyTorch reference's CPU throughput (the bench baseline).

The reference publishes no numbers (BASELINE.md), so the 720p CPU baseline
must be measured. torchvision is not installed here, so this script
reconstructs the reference architecture in pure torch (same layer plan as
src/models/ema_vfi.py:63-147) with a vectorized pure-torch DCNv2 standing in
for torchvision.ops.DeformConv2d. That stand-in is gather+matmul — the same
algorithm torchvision's CPU kernel uses — so the measurement is a fair
(slightly generous to the reference: no Python overhead per pixel) estimate
of reference CPU throughput.

Usage: python tools/measure_reference_cpu.py [--height 720 --width 1280]
Writes the measured frames/sec to stdout.
"""

from __future__ import annotations

import argparse
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def deform_conv2d_torch(x, offset, mask, weight, bias, stride=1, padding=1):
    """Vectorized pure-torch DCNv2 (torchvision offset layout), NCHW."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    ho = (h + 2 * padding - (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - (kw - 1) - 1) // stride + 1
    n = ho * wo
    taps = kh * kw
    off = offset.view(b, taps, 2, n)
    ys_base = torch.arange(ho, dtype=x.dtype).view(-1, 1) * stride - padding
    xs_base = torch.arange(wo, dtype=x.dtype).view(1, -1) * stride - padding
    outs = torch.zeros(b, cout, n, dtype=x.dtype)
    xf = x.reshape(b, cin, h * w)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            ys = (ys_base + i).expand(ho, wo).reshape(1, n) + off[:, t, 0]
            xs = (xs_base + j).expand(ho, wo).reshape(1, n) + off[:, t, 1]
            y0 = torch.floor(ys)
            x0 = torch.floor(xs)
            wy1 = ys - y0
            wx1 = xs - x0
            acc = torch.zeros(b, cin, n, dtype=x.dtype)
            for dy, wy in ((0, 1 - wy1), (1, wy1)):
                for dx, wx in ((0, 1 - wx1), (1, wx1)):
                    yi = y0.long() + dy
                    xi = x0.long() + dx
                    valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).to(x.dtype)
                    idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1))
                    v = torch.gather(xf, 2, idx.unsqueeze(1).expand(b, cin, n))
                    acc += v * (wy * wx * valid).unsqueeze(1)
            acc = acc * mask[:, t].view(b, 1, n)
            outs += torch.einsum("bcn,oc->bon", acc, weight[:, :, i, j])
    out = outs.view(b, cout, ho, wo)
    return out + bias.view(1, -1, 1, 1)


class RefEMAVFI(nn.Module):
    """Reference architecture rebuilt for timing (ema_vfi.py:63-147)."""

    def __init__(self, mid=64, blocks=3):
        super().__init__()
        cb = lambda i, o, s=1: nn.Sequential(nn.Conv2d(i, o, 3, s, 1), nn.ReLU())
        self.feat = nn.Sequential(cb(6, mid), *[cb(mid, mid) for _ in range(blocks)])
        self.ctx = nn.Sequential(cb(mid, 2 * mid, 2), cb(2 * mid, 4 * mid, 2),
                                 cb(4 * mid, 4 * mid), nn.AdaptiveAvgPool2d(1),
                                 nn.Flatten(), nn.Linear(4 * mid, mid))
        self.motion = nn.Sequential(cb(2 * mid, mid), cb(mid, mid),
                                    nn.Conv2d(mid, 2, 3, 1, 1))
        fch = mid + 3
        self.off_convs = nn.ModuleList(
            [nn.Conv2d(fch, 27, 3, 1, 1) for _ in range(blocks)])
        self.dcn_w = nn.ParameterList(
            [nn.Parameter(torch.randn(fch, fch, 3, 3) * 0.02) for _ in range(blocks)])
        self.dcn_b = nn.ParameterList(
            [nn.Parameter(torch.zeros(fch)) for _ in range(blocks)])
        self.rec = nn.Sequential(cb(fch, mid), cb(mid, mid // 2),
                                 nn.Conv2d(mid // 2, 3, 3, 1, 1), nn.Tanh())

    def forward(self, f1, f2):
        feat = self.feat(torch.cat([f1, f2], 1))
        ctx = self.ctx(feat)
        flow = self.motion(torch.cat(
            [feat, ctx[:, :, None, None].expand(-1, -1, feat.size(2), feat.size(3))], 1))
        b, _, h, w = f2.shape
        yy, xx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack([xx, yy]).float()[None] + flow
        grid = torch.stack([2 * grid[:, 0] / max(w - 1, 1) - 1,
                            2 * grid[:, 1] / max(h - 1, 1) - 1], -1)
        warped = F.grid_sample(f2, grid, align_corners=True)
        fused = torch.cat([feat, warped], 1)
        for off_conv, wgt, bias in zip(self.off_convs, self.dcn_w, self.dcn_b):
            raw = off_conv(fused)
            o_s, m, o_d = torch.chunk(raw, 3, 1)
            fused = deform_conv2d_torch(fused, torch.cat([o_s, o_d], 1),
                                        torch.sigmoid(m), wgt, bias)
        return (self.rec(fused) + 1) / 2


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()
    torch.set_grad_enabled(False)
    model = RefEMAVFI().eval()
    f0 = torch.rand(1, 3, args.height, args.width)
    f1 = torch.rand(1, 3, args.height, args.width)
    model(f0, f1)  # warmup
    t0 = time.time()
    for _ in range(args.iters):
        model(f0, f1)
    dt = (time.time() - t0) / args.iters
    print(f"reference-CPU {args.width}x{args.height}: "
          f"{dt * 1000:.0f} ms/frame = {1 / dt:.4f} frames/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
