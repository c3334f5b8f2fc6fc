"""deform_conv2d_shifts must equal the exact gather op for in-range offsets,
and saturate cleanly beyond the clamp radius."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.ops import deform_conv2d
from vfi_tpu.ops.deform_conv_shifts import deform_conv2d_shifts


def _case(rng, b=1, h=7, w=6, cin=4, cout=5, k=3, off_scale=1.5):
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * k * k)) * off_scale).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal((cout,)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (x, offset, mask, weight, bias))


@pytest.mark.parametrize("R,off_scale", [(2, 0.9), (3, 1.4), (4, 2.0)])
def test_matches_exact_for_inrange_offsets(rng, R, off_scale):
    x, offset, mask, weight, bias = _case(rng, off_scale=off_scale)
    offset = jnp.clip(offset, -R + 0.01, R - 0.01)
    exact = deform_conv2d(x, offset, mask, weight, bias)
    fast = deform_conv2d_shifts(x, offset, mask, weight, bias, max_offset=R)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_out_of_range_offsets_saturate(rng):
    x, offset, mask, weight, bias = _case(rng, off_scale=10.0)
    R = 3
    fast = deform_conv2d_shifts(x, offset, mask, weight, bias, max_offset=R)
    clamped = jnp.clip(offset, -R, R)
    exact = deform_conv2d(x, clamped, mask, weight, bias)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_no_mask(rng):
    x, offset, _, weight, bias = _case(rng, off_scale=1.0)
    offset = jnp.clip(offset, -1.9, 1.9)
    exact = deform_conv2d(x, offset, None, weight, bias)
    fast = deform_conv2d_shifts(x, offset, None, weight, bias, max_offset=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_exact(rng):
    x, offset, mask, weight, bias = _case(rng, h=5, w=5, off_scale=0.8)
    offset = jnp.clip(offset, -1.5, 1.5)

    def loss_exact(o):
        return jnp.sum(deform_conv2d(x, o, mask, weight, bias) ** 2)

    def loss_fast(o):
        return jnp.sum(deform_conv2d_shifts(x, o, mask, weight, bias,
                                            max_offset=2) ** 2)

    ge = jax.grad(loss_exact)(offset)
    gf = jax.grad(loss_fast)(offset)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                               rtol=1e-3, atol=1e-3)


def test_scan_variant_matches_unrolled(rng):
    """The O(1)-memory scan formulation must equal the unrolled one."""
    x, offset, mask, weight, bias = _case(rng, off_scale=1.2)
    offset = jnp.clip(offset, -2.9, 2.9)
    a = deform_conv2d_shifts(x, offset, mask, weight, bias, max_offset=3,
                             unroll=True)
    b = deform_conv2d_shifts(x, offset, mask, weight, bias, max_offset=3,
                             unroll=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-4)


def test_scan_variant_is_differentiable(rng):
    x, offset, mask, weight, bias = _case(rng, h=5, w=5, off_scale=0.8)
    offset = jnp.clip(offset, -1.5, 1.5)

    def loss(o, w_):
        return jnp.sum(deform_conv2d_shifts(x, o, mask, w_, bias,
                                            max_offset=2, unroll=False) ** 2)

    go, gw = jax.grad(loss, argnums=(0, 1))(offset, weight)
    assert np.isfinite(np.asarray(go)).all() and np.abs(np.asarray(gw)).max() > 0


def test_shifts_fuzz_matches_exact(rng):
    """Seeded sweep over random shapes and clamp radii: the bounded
    shift-decomposition must equal the exact gather for clipped offsets."""
    for case in range(10):
        R = int(rng.integers(1, 5))
        h = int(rng.integers(3, 11))
        w = int(rng.integers(3, 11))
        cin = int(rng.integers(1, 6))
        cout = int(rng.integers(1, 6))
        b = int(rng.choice([1, 2]))
        x, offset, mask, weight, bias = _case(
            rng, b=b, h=h, w=w, cin=cin, cout=cout,
            off_scale=float(rng.uniform(0.3, 2.0 * R)))
        offset = jnp.clip(offset, -R + 0.01, R - 0.01)
        exact = deform_conv2d(x, offset, mask, weight, bias)
        fast = deform_conv2d_shifts(x, offset, mask, weight, bias,
                                    max_offset=R)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(exact), rtol=1e-4, atol=1e-4,
            err_msg=f"case {case}: R={R} h={h} w={w} cin={cin} cout={cout}")


def test_hand_written_backward_matches_vjp(rng):
    """deform_conv2d_shifts_bwd == jax.vjp of the forward (the Pallas DCN
    wrappers' training backward — no forward recompute)."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.ops.deform_conv_shifts import (deform_conv2d_shifts,
                                                deform_conv2d_shifts_bwd)

    b, h, w, cin, cout, k, R = 1, 6, 8, 4, 5, 3, 2
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    off = jnp.asarray(
        np.clip(rng.standard_normal((b, h, w, 2 * k * k)) * 1.3,
                -R + .05, R - .05), jnp.float32)
    msk = jnp.asarray(rng.uniform(0.1, 1, (b, h, w, k * k)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.3,
                     jnp.float32)
    bs = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, w, cout)), jnp.float32)

    _, vjp = jax.vjp(
        lambda *a: deform_conv2d_shifts(*a, max_offset=R),
        x, off, msk, wt, bs)
    ref = vjp(g)
    got = deform_conv2d_shifts_bwd(x, off, msk, wt, bs, g, max_offset=R)
    for a, b_ in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-5, atol=5e-5)
