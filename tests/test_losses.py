"""Loss-stack tests vs torch/numpy oracles (reference loss_functions.py)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vfi_tpu.losses import (
    LossWeights,
    charbonnier_loss,
    color_histogram_loss,
    gradient_loss,
    l1_loss,
    l2_loss,
    temporal_consistency_loss,
    total_loss,
)


@pytest.fixture
def pair(rng):
    p = rng.uniform(0, 1, (2, 12, 14, 3)).astype(np.float32)
    t = rng.uniform(0, 1, (2, 12, 14, 3)).astype(np.float32)
    return p, t


def test_charbonnier_matches_reference_math(pair):
    p, t = pair
    ours = float(charbonnier_loss(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(torch.mean(torch.sqrt(
        (torch.from_numpy(p) - torch.from_numpy(t)) ** 2 + 1e-3 ** 2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_l1_l2(pair):
    p, t = pair
    np.testing.assert_allclose(float(l1_loss(jnp.asarray(p), jnp.asarray(t))),
                               np.abs(p - t).mean(), rtol=1e-6)
    np.testing.assert_allclose(float(l2_loss(jnp.asarray(p), jnp.asarray(t))),
                               ((p - t) ** 2).mean(), rtol=1e-6)


def test_gradient_loss_matches_torch(pair):
    p, t = pair
    import torch.nn.functional as F

    def sobel(x):
        kx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]],
                          dtype=torch.float32).view(1, 1, 3, 3)
        ky = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
                          dtype=torch.float32).view(1, 1, 3, 3)
        gx = torch.zeros_like(x)
        gy = torch.zeros_like(x)
        for c in range(x.shape[1]):
            gx[:, c:c + 1] = F.conv2d(x[:, c:c + 1], kx, padding=1)
            gy[:, c:c + 1] = F.conv2d(x[:, c:c + 1], ky, padding=1)
        return gx, gy

    tp = torch.from_numpy(p).permute(0, 3, 1, 2)
    tt = torch.from_numpy(t).permute(0, 3, 1, 2)
    pgx, pgy = sobel(tp)
    tgx, tgy = sobel(tt)
    theirs = float(torch.mean(torch.abs(pgx - tgx) + torch.abs(pgy - tgy)))
    ours = float(gradient_loss(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_color_histogram_loss_matches_reference_math(pair):
    p, t = pair
    b, h, w, c = p.shape
    expected = 0.0
    for i in range(b):
        for ch in range(c):
            def hist(x):
                inds = np.clip(np.floor(x * 255), 0, 255).astype(np.int64)
                return np.bincount(inds.ravel(), minlength=256) / (h * w)
            expected += np.abs(hist(p[i, :, :, ch]) - hist(t[i, :, :, ch])).sum()
    expected /= b
    ours = float(color_histogram_loss(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_temporal_consistency_with_zero_flow(pair):
    """With a zero-flow estimator, nearest warp is the identity, so the loss
    reduces to L1(frame0, pred) + L1(frame1, pred)."""
    p, _ = pair
    f0 = np.roll(p, 1, axis=1)
    f1 = np.roll(p, -1, axis=1)

    def zero_flow(a, b):
        return jnp.zeros(a.shape[:3] + (2,), a.dtype)

    ours = float(temporal_consistency_loss(
        jnp.asarray(p), jnp.asarray(f0), jnp.asarray(f1), zero_flow))
    expected = np.abs(f0 - p).mean() + np.abs(f1 - p).mean()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_total_loss_weighting(pair):
    p, t = pair
    w = LossWeights(charbonnier=0.5, vgg=0.0, color=0.3, gradient=0.1, temporal=0.0)
    tot, terms = total_loss(jnp.asarray(p), jnp.asarray(t), None, w)
    expected = (0.5 * float(terms["charbonnier"]) + 0.3 * float(terms["color"])
                + 0.1 * float(terms["gradient"]))
    np.testing.assert_allclose(float(tot), expected, rtol=1e-5)
    assert float(terms["vgg"]) == 0.0


def test_total_loss_is_differentiable(pair):
    p, t = pair
    w = LossWeights(vgg=0.0, temporal=0.0)

    def f(x):
        tot, _ = total_loss(x, jnp.asarray(t), None, w)
        return tot

    g = np.asarray(jax.grad(f)(jnp.asarray(p)))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_perceptual_loss_runs_and_is_zero_for_identical(pair):
    import warnings

    from vfi_tpu.losses import VGGPerceptualLoss

    p, _ = pair
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = VGGPerceptualLoss(params=None, layer="relu1_2")
    same = float(vgg(jnp.asarray(p), jnp.asarray(p)))
    assert same == 0.0
    diff = float(vgg(jnp.asarray(p), jnp.asarray(1.0 - p)))
    assert diff > 0.0
