"""deform_conv2d correctness vs a straight-from-the-paper numpy oracle.

torchvision (the reference's DCNv2 provider, ema_vfi.py:45-51) is not
installed here, so the oracle is an independent loop implementation of
modulated deformable convolution with the documented torchvision offset
layout. Gradients are checked against finite differences.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.ops import deform_conv2d
from tests.oracles import np_deform_conv2d


def _rand_case(rng, b=1, h=6, w=5, cin=4, cout=6, k=3, og=1, groups=1,
               stride=1, padding=1, dilation=1, off_scale=1.5):
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, ho, wo, 2 * og * k * k)) * off_scale).astype(np.float32)
    mask = rng.uniform(0, 1, (b, ho, wo, og * k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin // groups, cout)).astype(np.float32) * 0.3
    bias = rng.standard_normal((cout,)).astype(np.float32)
    return x, offset, mask, weight, bias


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(stride=2, h=8, w=8),
    dict(padding=2),
    dict(dilation=2, h=9, w=9),
    dict(og=2, cin=4),
    dict(groups=2, cin=4, cout=6),
    dict(off_scale=8.0),   # pushes many samples out of bounds
])
def test_deform_conv_matches_oracle(rng, kwargs):
    geo = {k: kwargs[k] for k in ("stride", "padding", "dilation")
           if k in kwargs}
    x, offset, mask, weight, bias = _rand_case(rng, **kwargs)
    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), **geo))
    expected = np_deform_conv2d(x, offset, mask, weight, bias,
                                stride=geo.get("stride", 1),
                                padding=geo.get("padding", 1),
                                dilation=geo.get("dilation", 1))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_deform_conv_no_mask(rng):
    x, offset, _, weight, bias = _rand_case(rng)
    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), None, jnp.asarray(weight),
        jnp.asarray(bias)))
    expected = np_deform_conv2d(x, offset, None, weight, bias)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_plain_conv(rng):
    """With zero offsets and mask==1 DCN must equal a standard conv —
    the state of the reference model at init (offset conv zero-init,
    ema_vfi.py:42-43)."""
    from jax import lax
    x, _, _, weight, bias = _rand_case(rng, h=7, w=7)
    b, h, w, cin = x.shape
    offset = np.zeros((b, h, w, 18), np.float32)
    mask = np.ones((b, h, w, 9), np.float32)
    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias)))
    dn = lax.conv_dimension_numbers(x.shape, weight.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(jnp.asarray(x), jnp.asarray(weight), (1, 1),
                                   "SAME", dimension_numbers=dn) + bias
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_deform_conv_gradients_finite_difference(rng):
    x, offset, mask, weight, bias = _rand_case(rng, h=4, w=4, cin=2, cout=2)

    def loss(x_, off_, msk_, w_, b_):
        return jnp.sum(deform_conv2d(x_, off_, msk_, w_, b_) ** 2)

    args = [jnp.asarray(a) for a in (x, offset, mask, weight, bias)]
    grads = jax.grad(loss, argnums=tuple(range(5)))(*args)

    eps = 1e-3
    for ai, g in [(0, grads[0]), (3, grads[3]), (4, grads[4])]:
        a = np.asarray(args[ai])
        flat_idx = np.unravel_index(np.argmax(np.abs(np.asarray(g))), a.shape)
        ap, am = a.copy(), a.copy()
        ap[flat_idx] += eps
        am[flat_idx] -= eps
        args_p = list(args); args_p[ai] = jnp.asarray(ap)
        args_m = list(args); args_m[ai] = jnp.asarray(am)
        fd = (loss(*args_p) - loss(*args_m)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[flat_idx], fd, rtol=2e-2, atol=1e-2)


def test_deform_conv_fuzz_random_geometry(rng):
    """Seeded sweep over random geometry combinations vs the numpy oracle —
    shapes/strides/dilations/groups beyond the fixed parametrize cases."""
    for case in range(12):
        k = int(rng.choice([1, 3]))
        groups = int(rng.choice([1, 2]))
        og = int(rng.choice([1, 2]))
        # cin must divide by both groups and offset groups
        cin = int(np.lcm(groups, og)) * int(rng.integers(1, 3))
        cout = groups * int(rng.integers(1, 4))
        stride = int(rng.choice([1, 2]))
        dilation = int(rng.choice([1, 2]))
        padding = int(rng.integers(0, 3))
        h = int(rng.integers(max(3, dilation * (k - 1) + 1 - 2 * padding), 10))
        w = int(rng.integers(max(3, dilation * (k - 1) + 1 - 2 * padding), 10))
        b = int(rng.choice([1, 2]))
        x, offset, mask, weight, bias = _rand_case(
            rng, b=b, h=h, w=w, cin=cin, cout=cout, k=k, og=og,
            groups=groups, stride=stride, padding=padding, dilation=dilation,
            off_scale=float(rng.uniform(0.5, 6.0)))
        geo = dict(stride=stride, padding=padding, dilation=dilation)
        ours = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), **geo))
        expected = np_deform_conv2d(x, offset, mask, weight, bias, **geo)
        np.testing.assert_allclose(
            ours, expected, rtol=1e-4, atol=1e-4,
            err_msg=f"case {case}: k={k} groups={groups} og={og} cin={cin} "
                    f"cout={cout} s={stride} d={dilation} p={padding} "
                    f"h={h} w={w} b={b}")
