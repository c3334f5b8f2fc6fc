"""Parity tests: vfi_tpu.ops.warp vs torch.nn.functional.grid_sample.

The reference model's warp is grid_sample(align_corners=True,
padding_mode='zeros') (src/models/ema_vfi.py:169, loss_functions.py:177).
torch core is available on CPU, so we test directly against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vfi_tpu.ops import warp, grid_sample


def _torch_warp(image_nchw, flow_nchw, mode):
    """The reference's warp chain, verbatim semantics (mesh grid + normalize)."""
    b, c, h, w = image_nchw.shape
    xx = torch.arange(0, w).view(1, -1).repeat(h, 1)
    yy = torch.arange(0, h).view(-1, 1).repeat(1, w)
    xx = xx.view(1, 1, h, w).repeat(b, 1, 1, 1)
    yy = yy.view(1, 1, h, w).repeat(b, 1, 1, 1)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flow_nchw
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    return F.grid_sample(image_nchw, vgrid, mode=mode, align_corners=True)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("shape", [(2, 8, 11, 3), (1, 16, 16, 5)])
def test_warp_matches_torch(rng, mode, shape):
    b, h, w, c = shape
    img = rng.standard_normal(shape).astype(np.float32)
    # flows large enough to push samples out of bounds
    flow = (rng.standard_normal((b, h, w, 2)) * 3.0).astype(np.float32)

    ours = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow), mode=mode))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    theirs = _torch_warp(timg, tflow, mode).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    b, h, w, c = 2, 9, 7, 4
    ho, wo = 5, 6
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    grid = (rng.uniform(-1.3, 1.3, (b, ho, wo, 2))).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_warp_gradients_match_torch(rng):
    b, h, w, c = 1, 6, 6, 2
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 1.5).astype(np.float32)

    def loss_jax(i, f):
        return jnp.sum(warp(i, f) ** 2)

    gi, gf = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(flow))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2).requires_grad_(True)
    (torch.sum(_torch_warp(timg, tflow, "bilinear") ** 2)).backward()

    np.testing.assert_allclose(
        np.asarray(gi), timg.grad.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gf), tflow.grad.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_zero_flow_is_identity(rng):
    img = rng.standard_normal((1, 5, 5, 3)).astype(np.float32)
    out = np.asarray(warp(jnp.asarray(img), jnp.zeros((1, 5, 5, 2), np.float32)))
    np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)


def test_integer_flow_shifts(rng):
    """Analytic check: flow (dx=1, dy=0) samples the pixel to the right."""
    img = rng.standard_normal((1, 4, 6, 1)).astype(np.float32)
    flow = np.zeros((1, 4, 6, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :, :-1], img[:, :, 1:], rtol=1e-6, atol=1e-6)
    # last column sampled out of bounds -> zeros
    np.testing.assert_allclose(out[:, :, -1], 0.0, atol=1e-6)


def test_warp_bf16_large_coordinates(rng):
    """Regression: coordinate math must be f32 — bf16 cannot represent
    integers > 256, which shifted samples by whole pixels at H/W > 256."""
    h, w = 8, 512
    img = rng.uniform(0, 1, (1, h, w, 2)).astype(np.float32)
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = 0.5  # half-pixel x shift
    out16 = warp(jnp.asarray(img, jnp.bfloat16), jnp.asarray(flow, jnp.bfloat16))
    out32 = warp(jnp.asarray(img), jnp.asarray(flow))
    # bf16 data tolerance, but NOT whole-pixel errors in the far columns
    np.testing.assert_allclose(np.asarray(out16, np.float32)[:, :, 300:500],
                               np.asarray(out32)[:, :, 300:500], atol=0.02)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_warp_fuzz_random_shapes(rng, mode):
    """Seeded sweep over random shapes and flow magnitudes (incl. far
    out-of-bounds) vs the torch oracle.

    Extents are >= 2: at a 1-pixel extent grid_sample's align_corners
    normalization (the reference divides by max(dim-1, 1),
    ema_vfi.py:165-166) degenerates — any flow in [0, 1] maps back to
    pixel 0 — while our pixel-space warp treats fractional coordinates
    there as partially out-of-bounds. Documented in ops/warp.py."""
    for case in range(10):
        b = int(rng.choice([1, 2]))
        h = int(rng.integers(2, 14))
        w = int(rng.integers(2, 14))
        c = int(rng.integers(1, 5))
        scale = float(rng.uniform(0.0, 2.0 * max(h, w)))
        img = rng.standard_normal((b, h, w, c)).astype(np.float32)
        flow = (rng.standard_normal((b, h, w, 2)) * scale).astype(np.float32)
        ours = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow), mode=mode))
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
        theirs = _torch_warp(timg, tflow, mode).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-5, atol=1e-5,
            err_msg=f"case {case}: b={b} h={h} w={w} c={c} scale={scale:.1f}")
