"""Pallas sampling kernels vs the XLA reference ops (interpret mode on CPU).

Correctness anchor: deform_conv2d_pallas == deform_conv2d_shifts ==
deform_conv2d (for in-range offsets); bounded_warp_pallas == ops.warp for
in-range flow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vfi_tpu.ops import deform_conv2d, warp
from vfi_tpu.ops.pallas.sampling import (bounded_warp_pallas,
                                         bounded_warp_pallas_v2,
                                         deform_conv2d_pallas,
                                         deform_conv2d_pallas_v4)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_dcn_pallas_matches_exact(rng):
    b, h, w, cin, cout, k, R = 1, 8, 16, 4, 5, 3, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 1.2,
                     -R + 0.01, R - 0.01).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    exact = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                          jnp.asarray(mask), jnp.asarray(weight),
                          jnp.asarray(bias))
    fast = deform_conv2d_pallas(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(weight),
                                jnp.asarray(bias), max_offset=R)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_dcn_pallas_no_mask_bias(rng):
    b, h, w, cin, cout, k, R = 2, 4, 8, 3, 4, 3, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)),
                     -R + 0.01, R - 0.01).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    exact = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), None,
                          jnp.asarray(weight), None)
    fast = deform_conv2d_pallas(jnp.asarray(x), jnp.asarray(offset), None,
                                jnp.asarray(weight), None, max_offset=R)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stage_columns", [True, False])
def test_dcn_pallas_v4_matches_exact(rng, stage_columns):
    b, h, w, cin, cout, k, R = 2, 8, 16, 4, 5, 3, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 1.7,
                     -R + 0.01, R - 0.01).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    exact = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                          jnp.asarray(mask), jnp.asarray(weight),
                          jnp.asarray(bias))
    fast = deform_conv2d_pallas_v4(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(weight),
                                   jnp.asarray(bias), max_offset=R,
                                   stage_columns=stage_columns)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_dcn_pallas_v4_saturates_and_r1(rng):
    b, h, w, cin, cout, k = 1, 8, 16, 3, 3, 3
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * k * k)) * 5).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    for R in (1, 2):
        from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
        ref = deform_conv2d_shifts(jnp.asarray(x), jnp.asarray(offset), None,
                                   jnp.asarray(weight), None, max_offset=R)
        got = deform_conv2d_pallas_v4(jnp.asarray(x), jnp.asarray(offset),
                                      None, jnp.asarray(weight), None,
                                      max_offset=R)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_warp_pallas_matches_ops_warp(rng):
    b, h, w, c, R = 1, 8, 16, 3, 4
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = np.clip(rng.standard_normal((b, h, w, 2)) * 2.5,
                   -R + 0.01, R - 0.01).astype(np.float32)
    expected = warp(jnp.asarray(img), jnp.asarray(flow))
    got = bounded_warp_pallas(jnp.asarray(img), jnp.asarray(flow), max_flow=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,R", [((1, 16, 24, 3), 4),
                                     ((2, 8, 140, 3), 16)])
def test_warp_pallas_v2_matches_ops_warp(rng, shape, R):
    b, h, w, c = shape
    img = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * R).astype(np.float32)
    expected = warp(jnp.asarray(img), jnp.clip(jnp.asarray(flow), -R, R))
    got = bounded_warp_pallas_v2(jnp.asarray(img), jnp.asarray(flow),
                                 max_flow=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


def test_wrappers_grads_match_shifts(rng):
    """deform_conv2d_fast / warp_fast: Pallas forward + XLA backward must
    give the same value AND gradients as the pure shifts/warp ops."""
    from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
    from vfi_tpu.ops.pallas.wrappers import deform_conv2d_fast, warp_fast

    b, h, w, cin, cout, k, R = 1, 8, 16, 3, 3, 3, 1
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    off = jnp.asarray(
        np.clip(rng.standard_normal((b, h, w, 2 * k * k)), -0.9, 0.9),
        jnp.float32)
    msk = jnp.asarray(rng.uniform(0, 1, (b, h, w, k * k)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.3,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)

    def loss_fast(x, off, msk, wgt, bias):
        return deform_conv2d_fast(x, off, msk, wgt, bias, R).sum()

    def loss_ref(x, off, msk, wgt, bias):
        return deform_conv2d_shifts(x, off, msk, wgt, bias,
                                    max_offset=R).sum()

    v1, g1 = jax.value_and_grad(loss_fast, argnums=(0, 1, 3))(
        x, off, msk, wgt, bias)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1, 3))(
        x, off, msk, wgt, bias)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)

    flow = jnp.asarray(rng.standard_normal((1, 8, 16, 2)) * 2, jnp.float32)
    img = x

    def wloss_fast(img, flow):
        return warp_fast(img, flow, 2).sum()

    def wloss_ref(img, flow):
        return warp(img, jnp.clip(flow, -2, 2)).sum()

    v1, g1 = jax.value_and_grad(wloss_fast, argnums=(0, 1))(img, flow)
    v2, g2 = jax.value_and_grad(wloss_ref, argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_warp_pallas_saturates(rng):
    b, h, w, c, R = 1, 4, 8, 2, 2
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 10).astype(np.float32)
    expected = warp(jnp.asarray(img), jnp.clip(jnp.asarray(flow), -R, R))
    got = bounded_warp_pallas(jnp.asarray(img), jnp.asarray(flow), max_flow=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)


def test_dcn_pallas_v4_column_tiled_matches_exact(rng):
    """Explicit column tiling (tile_w): per-tile bounds + pre-gathered
    column windows must reproduce the exact gather, including offsets that
    reach across tile boundaries (|d| up to R with tiles of 128)."""
    b, h, w, cin, cout, k, R = 1, 16, 256, 4, 5, 3, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 1.7,
                     -R + 0.01, R - 0.01).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    exact = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                          jnp.asarray(mask), jnp.asarray(weight),
                          jnp.asarray(bias))
    tiled = deform_conv2d_pallas_v4(jnp.asarray(x), jnp.asarray(offset),
                                    jnp.asarray(mask), jnp.asarray(weight),
                                    jnp.asarray(bias), max_offset=R,
                                    tile_w=128)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)

def test_auto_tiling_plan_4k():
    """tile_w=None auto plan: untiled where it fits, smallest bounded-compile
    column tile at 4K (where the untiled slab cannot fit VMEM), infeasible
    only when nothing fits. Pure host math — mirrors the hardware-measured
    configuration (docs/PERFORMANCE.md round-2 4K section)."""
    from vfi_tpu.ops.pallas.sampling import (_pad128, _pick_th_tw_v4,
                                             pallas_sampling_feasible)

    cpad, coutp = _pad128(67), _pad128(67)
    # 720p: full-width slab fits AND the width is hardware-validated ->
    # untiled. 1080p+ tiles (see test_v4_auto_plan_tiles_wide_images:
    # untiled W=1920 kernel-faulted the worker in round 3).
    th, tw = _pick_th_tw_v4(720, 1280, cpad, coutp, 3, 3, itemsize=2)
    assert tw == 1280
    # 4K: untiled cannot fit; the auto plan picks the smallest safe tile
    th, tw = _pick_th_tw_v4(2160, 3840, cpad, coutp, 3, 3, itemsize=2)
    assert tw == 128 and 2160 % th == 0 and th % 8 == 0
    # feasibility gate now admits 4K (the shifts fallback is no longer the
    # only 4K path)
    assert pallas_sampling_feasible(2160, 3840, 67, 67, 2, itemsize=2)
    # widths with no 128-multiple divisor and an oversized slab stay False
    assert not pallas_sampling_feasible(2160, 3843, 67, 67, 2, itemsize=2)


def test_layer_tile_w_matches_untiled(rng):
    """ModulatedDeformConv(tile_w=...) is bit-identical to the untiled
    plan, and an inapplicable tile width (not dividing w / not lane-
    aligned) silently degrades to the auto plan instead of failing —
    the same model instance must serve many input sizes."""
    from vfi_tpu.models.layers import ModulatedDeformConv
    from vfi_tpu.ops.pallas.sampling import pallas_sampling_feasible

    b, h, w, c = 1, 16, 256, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ref_layer = ModulatedDeformConv(c, max_offset=2, use_pallas=True)
    params = ref_layer.init(jax.random.PRNGKey(0), x)
    # trained-looking offsets: perturb the zero-init offset conv
    params = jax.tree.map(
        lambda p: p + 0.4 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params)
    ref = ref_layer.apply(params, x)
    for tw in (128, 96):  # 96: not lane-aligned -> auto fallback
        out = ModulatedDeformConv(c, max_offset=2, use_pallas=True,
                                  tile_w=tw).apply(params, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # feasibility gate agrees with the layer's degrade logic
    assert pallas_sampling_feasible(h, w, c, c, 2, tile_w=128)
    assert not pallas_sampling_feasible(h, w, c, c, 2, tile_w=96)
    assert not pallas_sampling_feasible(h, w, c, c, 2, tile_w=100)


def test_dcn_pallas_v5_matches_exact(rng):
    """v5 (transposed C-in-sublanes layout) == exact gather DCN for
    in-range offsets, incl. the host-side pre-shifted copies and host
    bias add."""
    from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

    b, h, w, cin, cout, k, R = 2, 8, 16, 4, 5, 3, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 1.7,
                     -R + 0.01, R - 0.01).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    exact = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                          jnp.asarray(mask), jnp.asarray(weight),
                          jnp.asarray(bias))
    fast = deform_conv2d_pallas_v5(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(weight),
                                   jnp.asarray(bias), max_offset=R)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_dcn_pallas_v5_model_channels(rng):
    """v5 at the flagship's channel counts (67 and the fuse_project 64)
    against the XLA shifts op, non-128 width (lane padding path)."""
    from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts
    from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

    for cin in (67, 64):
        b, h, w, cout, k, R = 1, 8, 48, cin, 3, 2
        x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
        offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 1.2,
                         -R + 0.01, R - 0.01).astype(np.float32)
        mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
        weight = (rng.standard_normal((k, k, cin, cout)) * 0.1
                  ).astype(np.float32)
        ref = deform_conv2d_shifts(jnp.asarray(x), jnp.asarray(offset),
                                   jnp.asarray(mask), jnp.asarray(weight),
                                   None, max_offset=R)
        got = deform_conv2d_pallas_v5(jnp.asarray(x), jnp.asarray(offset),
                                      jnp.asarray(mask), jnp.asarray(weight),
                                      None, max_offset=R)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_v4_auto_plan_tiles_wide_images():
    """The auto (TH, TW) planner must not pick an untiled width beyond the
    hardware-validated 1280: the untiled (8, 1920) plan kernel-faulted the
    TPU worker in the 1080p demo (round 3) and its compile family was
    flagged pathological by the round-1 bisect. Wide widths tile."""
    from vfi_tpu.ops.pallas.sampling import _pad128, _pick_th_tw_v4

    th, tw = _pick_th_tw_v4(1080, 1920, _pad128(67), _pad128(67), 3, 3,
                            itemsize=2)
    assert tw <= 384
    th, tw = _pick_th_tw_v4(2160, 3840, _pad128(67), _pad128(67), 3, 3,
                            itemsize=2)
    assert tw <= 384
    # 720p stays untiled (validated, fastest)
    th, tw = _pick_th_tw_v4(720, 1280, _pad128(67), _pad128(67), 3, 3,
                            itemsize=2)
    assert tw == 1280


@pytest.mark.parametrize("R", [1, 2])
def test_dcn_pallas_v5_tiled_predicates(rng, R):
    """v5 with column-tiled skip predicates (tile_w) is BIT-IDENTICAL to
    the untiled kernel — a skipped (tap, shift, tile) term contributes
    exactly zero — and matches the exact gather DCN. R=1 is the round-5
    flagship geometry; offsets are drawn small so some tiles really do
    retire shifts (the interesting codegen path)."""
    from vfi_tpu.ops.pallas.sampling import deform_conv2d_pallas_v5

    b, h, w, cin, cout, k = 1, 8, 256, 4, 5, 3   # wl=256 -> 2 tiles of 128
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 0.6,
                     -R + 0.01, R - 0.01).astype(np.float32)
    # left half static (zero offsets): its tile's bounds retire every
    # non-center shift, exercising real per-tile skips
    offset[:, :, : w // 2, :] = 0.0
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = (rng.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
    untiled = deform_conv2d_pallas_v5(*args, max_offset=R)
    tiled = deform_conv2d_pallas_v5(*args, max_offset=R, tile_w=128)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(untiled))
    exact = deform_conv2d(*args)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_dcn_pallas_v5_tiled_feasibility():
    from vfi_tpu.ops.pallas.sampling import pallas_sampling_v5_feasible

    if not pallas_sampling_v5_feasible(8, 256, 4, 5, 1):
        pytest.skip("v5 infeasible on this backend")
    # tile must divide the lane-padded width and be a lane-tile multiple
    assert pallas_sampling_v5_feasible(8, 256, 4, 5, 1, tile_w=128)
    assert not pallas_sampling_v5_feasible(8, 256, 4, 5, 1, tile_w=96)
    assert not pallas_sampling_v5_feasible(8, 250, 4, 5, 1, tile_w=100)
