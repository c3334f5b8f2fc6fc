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


def test_warp_pallas_saturates(rng):
    b, h, w, c, R = 1, 4, 8, 2, 2
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = (rng.standard_normal((b, h, w, 2)) * 10).astype(np.float32)
    expected = warp(jnp.asarray(img), jnp.clip(jnp.asarray(flow), -R, R))
    got = bounded_warp_pallas(jnp.asarray(img), jnp.asarray(flow), max_flow=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-4)
