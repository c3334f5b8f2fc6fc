"""Naive numpy oracles for ops whose torch counterpart is unavailable here.

torchvision is not installed in this environment, so `deform_conv2d` gets a
straight-from-the-paper loop implementation (DCNv2: Zhu et al. 2019) used
only as a correctness oracle at tiny sizes.
"""

import numpy as np


def np_bilinear_at(img, y, x):
    """Bilinear sample img (H, W, C) at float (y, x), zeros padding."""
    h, w, _ = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = 0.0
    for dy, wy in ((0, 1 - (y - y0)), (1, y - y0)):
        for dx, wx in ((0, 1 - (x - x0)), (1, x - x0)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w and wy * wx != 0:
                out = out + img[yy, xx] * (wy * wx)
    return out


def np_deform_conv2d(x, offset, mask, weight, bias, stride=1, padding=1,
                     dilation=1):
    """DCNv2 oracle, NHWC in/out, torchvision offset layout.

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2*og*K); mask: (B, Ho, Wo, og*K)
    or None; weight: (kh, kw, Cin/groups, Cout); bias: (Cout,) or None.
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    groups = cin // cin_g
    cout_g = cout // groups
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    k = kh * kw
    og = offset.shape[-1] // (2 * k)
    cin_og = cin // og

    out = np.zeros((b, ho, wo, cout), np.float64)
    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                col = np.zeros((cin,), np.float64)  # sampled+masked input vec per tap
                for i in range(kh):
                    for j in range(kw):
                        for g in range(og):
                            t = (g * kh + i) * kw + j
                            dy = offset[bi, oy, ox, 2 * t]
                            dx = offset[bi, oy, ox, 2 * t + 1]
                            ys = oy * stride - padding + i * dilation + dy
                            xs = ox * stride - padding + j * dilation + dx
                            v = np_bilinear_at(
                                x[bi, :, :, g * cin_og:(g + 1) * cin_og], ys, xs)
                            if mask is not None:
                                v = v * mask[bi, oy, ox, t if og == 1 else g * k + (i * kw + j)]
                            col[g * cin_og:(g + 1) * cin_og] = v
                        # accumulate this tap into output
                        for wg in range(groups):
                            wslice = weight[i, j, :, wg * cout_g:(wg + 1) * cout_g]
                            xslice = col[wg * cin_g:(wg + 1) * cin_g]
                            out[bi, oy, ox, wg * cout_g:(wg + 1) * cout_g] += (
                                xslice @ wslice)
    if bias is not None:
        out += bias
    return out
