"""Faithful PyTorch reconstruction of the reference EMA_VFI for parity
testing and CPU-baseline measurement.

Reproduces the reference architecture AND its state_dict key names exactly
(reference src/models/ema_vfi.py:63-147: `feat_ext_conv1.0.*`,
`feat_ext_blocks.conv_block_i.0.*`, `context_encoding.{0,1,2}.0 / .5`,
`motion_estimation.{0,1}.0 / .2`, `attention_blocks.{i}.offset_conv /
.dcn_v2`, `reconstruction.{0,1}.0 / .2`), so checkpoints produced by this
module exercise the same conversion path as real reference checkpoints.

torchvision is not installed in this environment, so DeformConv2d is
replaced by `deform_conv2d_torch` — a vectorized pure-torch DCNv2 with the
documented torchvision offset layout (validated against the same numpy
oracle as the JAX op in tests/test_deform_conv.py).

This is test/benchmark tooling, NOT product code: the product inference path
is vfi_tpu (JAX).
"""

from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F


def deform_conv2d_torch(x, offset, mask, weight, bias, stride=1, padding=1):
    """Vectorized pure-torch DCNv2, NCHW, torchvision offset layout
    (offset channel 2t = dy_t, 2t+1 = dx_t)."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    ho = (h + 2 * padding - (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - (kw - 1) - 1) // stride + 1
    n = ho * wo
    taps = kh * kw
    off = offset.reshape(b, taps, 2, n)
    msk = mask.reshape(b, taps, n)
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
            acc = acc * msk[:, t].unsqueeze(1)
            outs += torch.einsum("bcn,oc->bon", acc, weight[:, :, i, j])
    out = outs.view(b, cout, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def deform_conv2d_torch_fast(x, offset, mask, weight, bias, stride=1, padding=1):
    """Same DCNv2 semantics as `deform_conv2d_torch`, but the fractional
    sampling runs through `F.grid_sample` (native C++ bilinear, zeros
    padding, align_corners=True == exact-pixel coordinates) — one call per
    kernel tap instead of 36 python-level gathers. ~1-2 orders of magnitude
    faster on CPU; validated against `deform_conv2d_torch` in
    tests/test_parity.py. Used by the reference-semantics CPU baseline
    training (tools/train_reference_cpu.py) where the slow oracle is
    intractable."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    assert stride == 1, "baseline model uses stride 1"
    ho = h + 2 * padding - (kh - 1) - 1 + 1
    wo = w + 2 * padding - (kw - 1) - 1 + 1
    taps = kh * kw
    off = offset.view(b, taps, 2, ho, wo)
    msk = mask.view(b, taps, ho, wo)
    ys_base = torch.arange(ho, dtype=x.dtype).view(1, -1, 1) - padding
    xs_base = torch.arange(wo, dtype=x.dtype).view(1, 1, -1) - padding
    out = torch.zeros(b, cout, ho, wo, dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            ys = ys_base + i + off[:, t, 0]
            xs = xs_base + j + off[:, t, 1]
            gx = 2.0 * xs / max(w - 1, 1) - 1.0
            gy = 2.0 * ys / max(h - 1, 1) - 1.0
            sampled = F.grid_sample(x, torch.stack([gx, gy], dim=-1),
                                    mode="bilinear", padding_mode="zeros",
                                    align_corners=True)
            sampled = sampled * msk[:, t].unsqueeze(1)
            out += torch.einsum("bchw,oc->bohw", sampled, weight[:, :, i, j])
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _conv(i, o, k=3, s=1, p=1):
    return nn.Conv2d(i, o, k, s, p)


def _conv_block(i, o, k=3, s=1, p=1):
    return nn.Sequential(_conv(i, o, k, s, p), nn.ReLU())


class ModulatedDeformConvPack(nn.Module):
    """Reference's pack (ema_vfi.py:23-60): zero-init offset conv whose 27ch
    output is chunked (static, mask, dynamic); out_channels == in_channels."""

    def __init__(self, in_channels, kernel_size=3, stride=1, padding=1,
                 fast=False):
        super().__init__()
        self.offset_conv = nn.Conv2d(in_channels, 3 * kernel_size * kernel_size,
                                     kernel_size, stride, padding)
        nn.init.constant_(self.offset_conv.weight, 0.0)
        nn.init.constant_(self.offset_conv.bias, 0.0)
        # mirror torchvision DeformConv2d's parameter names (.dcn_v2.weight/.bias)
        self.dcn_v2 = nn.Conv2d(in_channels, in_channels, kernel_size, stride, padding)
        self.stride = stride
        self.padding = padding
        self.fast = fast

    def forward(self, x):
        raw = self.offset_conv(x)
        off_s, mask, off_d = torch.chunk(raw, 3, dim=1)
        offset = torch.cat((off_s, off_d), dim=1)
        fn = deform_conv2d_torch_fast if self.fast else deform_conv2d_torch
        return fn(x, offset, torch.sigmoid(mask),
                  self.dcn_v2.weight, self.dcn_v2.bias,
                  self.stride, self.padding)


class EMA_VFI_Torch(nn.Module):
    """Reference-named torch model (state_dict compatible with the real
    reference checkpoints)."""

    def __init__(self, in_channels=3, mid_channels=64, num_blocks=3,
                 fast_dcn=False):
        super().__init__()
        m = mid_channels
        self.feat_ext_conv1 = _conv_block(in_channels * 2, m)
        self.feat_ext_blocks = nn.Sequential(OrderedDict(
            [(f"conv_block_{i}", _conv_block(m, m)) for i in range(num_blocks)]))
        self.context_encoding = nn.Sequential(
            _conv_block(m, 2 * m, s=2), _conv_block(2 * m, 4 * m, s=2),
            _conv_block(4 * m, 4 * m), nn.AdaptiveAvgPool2d(1), nn.Flatten(),
            nn.Linear(4 * m, m))
        self.motion_estimation = nn.Sequential(
            _conv_block(2 * m, m), _conv_block(m, m), _conv(m, 2))
        self.attention_blocks = nn.ModuleList(
            [ModulatedDeformConvPack(m + in_channels, fast=fast_dcn)
             for _ in range(num_blocks)])
        self.reconstruction = nn.Sequential(
            _conv_block(m + in_channels, m), _conv_block(m, m // 2),
            _conv(m // 2, in_channels), nn.Tanh())

    def forward(self, frame1, frame2):
        feat = self.feat_ext_blocks(self.feat_ext_conv1(
            torch.cat([frame1, frame2], dim=1)))
        context = self.context_encoding(feat)
        flow_input = torch.cat(
            [feat, context[:, :, None, None].repeat(1, 1, feat.size(2), feat.size(3))], 1)
        flow = self.motion_estimation(flow_input)
        warped = self.warp(frame2, flow)
        fused = torch.cat([feat, warped], dim=1)
        for block in self.attention_blocks:
            fused = block(fused)
        return (self.reconstruction(fused) + 1) / 2

    @staticmethod
    def warp(frame2, flow):
        b, _, h, w = frame2.shape
        xx = torch.arange(w).view(1, -1).expand(h, -1)
        yy = torch.arange(h).view(-1, 1).expand(-1, w)
        grid = torch.stack([xx, yy]).float()[None].expand(b, -1, -1, -1)
        vgrid = grid + flow
        vx = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
        vy = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
        return F.grid_sample(frame2, torch.stack([vx, vy], dim=-1),
                             align_corners=True)
