"""Parity tests for resize / sobel / histogram ops vs torch + numpy."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vfi_tpu.ops import (
    resize_bilinear,
    sobel_gradients,
    color_histogram,
    soft_color_histogram,
)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(224, 224), (7, 13), (32, 9)])
def test_resize_matches_torch(rng, align_corners, size):
    img = rng.standard_normal((2, 17, 23, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), size, align_corners))
    theirs = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=size,
        mode="bilinear", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_resize_upsample_matches_torch(rng):
    img = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (19, 24), False))
    theirs = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=(19, 24),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_sobel_matches_torch(rng):
    """Reference sobel: per-channel conv with SAME zero padding
    (loss_functions.py:76-93)."""
    x = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
    gx, gy = sobel_gradients(jnp.asarray(x))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    kx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=torch.float32).view(1, 1, 3, 3)
    ky = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=torch.float32).view(1, 1, 3, 3)
    tgx = torch.zeros_like(tx)
    tgy = torch.zeros_like(tx)
    for c in range(3):
        tgx[:, c:c + 1] = F.conv2d(tx[:, c:c + 1], kx, padding=1)
        tgy[:, c:c + 1] = F.conv2d(tx[:, c:c + 1], ky, padding=1)
    np.testing.assert_allclose(np.asarray(gx), tgx.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), tgy.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_color_histogram_matches_reference_math(rng):
    """floor -> clamp -> bincount / (H*W), per image per channel
    (loss_functions.py:125-141)."""
    num_bins = 16
    x = rng.uniform(-0.2, 1.2, (3, 9, 11, 3)).astype(np.float32)
    ours = np.asarray(color_histogram(jnp.asarray(x), num_bins))

    b, h, w, c = x.shape
    expected = np.zeros((b, c, num_bins), np.float32)
    for i in range(b):
        for ch in range(c):
            inds = np.floor(x[i, :, :, ch] * (num_bins - 1))
            inds = np.clip(inds, 0, num_bins - 1).astype(np.int64)
            expected[i, ch] = np.bincount(inds.ravel(), minlength=num_bins) / (h * w)
    np.testing.assert_allclose(ours, expected, rtol=1e-6, atol=1e-6)


def test_exact_histogram_has_zero_gradient(rng):
    """Parity with the reference's bincount: no gradient w.r.t. input."""
    x = jnp.asarray(rng.uniform(0, 1, (1, 4, 4, 3)).astype(np.float32))

    def f(v):
        return jnp.sum(color_histogram(v, 8))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_soft_histogram_sums_to_channels_and_has_gradient(rng):
    x = jnp.asarray(rng.uniform(0.05, 0.95, (2, 6, 6, 3)).astype(np.float32))
    h = soft_color_histogram(x, 32)
    # each pixel contributes total mass 1 -> per-channel hist sums to 1
    np.testing.assert_allclose(np.asarray(h.sum(-1)), 1.0, rtol=1e-5)

    def f(v):
        return jnp.sum(soft_color_histogram(v, 32)[..., :16])

    g = np.asarray(jax.grad(f)(x))
    assert np.abs(g).max() > 0.0
