"""Pallas conv kernels vs the XLA conv (interpret mode on CPU).

Correctness anchor: conv2d_pallas / conv2d_pallas_v2 == the ConvBlock
semantics (lax.conv_general_dilated, zeros padding k//2, f32 accumulation,
fused bias + ReLU); conv2d_fast's hand-written backward == jax.vjp of the
XLA composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vfi_tpu.ops.pallas.conv import (conv2d_pallas, conv2d_pallas_v2,
                                     pallas_conv_feasible,
                                     pallas_conv_v2_feasible)
from vfi_tpu.ops.pallas.wrappers import conv2d_fast


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _ref(x, w, b, act):
    o = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((w.shape[0] // 2,) * 2, (w.shape[0] // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        o = o + b
    if act:
        o = jnp.maximum(o, 0.0)
    return o.astype(x.dtype)


def _case(rng, h, w, cin, cout, b=2):
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                     jnp.float32)
    bs = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    return x, wt, bs


@pytest.mark.parametrize("cin,cout,act", [(6, 64, True), (64, 64, True),
                                          (64, 32, False), (128, 64, True)])
@pytest.mark.parametrize("variant", ["im2col", "direct"])
def test_v1_matches_xla(rng, cin, cout, act, variant):
    x, wt, bs = _case(rng, 16, 40, cin, cout)
    out = conv2d_pallas(x, wt, bs, act=act, variant=variant)
    ref = _ref(x, wt, bs, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("cin,cout,act", [(64, 64, True), (128, 64, True),
                                          (64, 2, False), (64, 32, True)])
def test_v2_matches_xla(rng, cin, cout, act):
    # 16x32 exercises both edge slabs and both packed parities
    x, wt, bs = _case(rng, 16, 32, cin, cout)
    out = conv2d_pallas_v2(x, wt, bs, act=act)
    ref = _ref(x, wt, bs, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_v2_no_bias(rng):
    x, wt, _ = _case(rng, 16, 16, 64, 64)
    out = conv2d_pallas_v2(x, wt, None, act=False)
    ref = _ref(x, wt, None, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fast_wrapper_gradients_match_xla(rng):
    """The hand-written backward (no forward recompute) must equal
    jax.vjp of the XLA conv + bias + relu composition exactly."""
    x, wt, bs = _case(rng, 8, 24, 16, 8)

    def ref(a, w, b):
        return _ref(a, w, b, True).astype(jnp.float32)

    g = jnp.asarray(rng.standard_normal((2, 8, 24, 8)), jnp.float32)
    _, vjp_ref = jax.vjp(ref, x, wt, bs)
    _, vjp_p = jax.vjp(lambda a, w, b: conv2d_fast(a, w, b, True), x, wt, bs)
    for a, b_ in zip(vjp_ref(g), vjp_p(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_feasibility_gates():
    # 720p trunk shapes are v2-feasible; odd channel counts are not
    assert pallas_conv_v2_feasible(720, 1280, 64, 64)
    assert pallas_conv_v2_feasible(720, 1280, 128, 64)
    assert not pallas_conv_v2_feasible(720, 1280, 67, 67)
    assert not pallas_conv_v2_feasible(720, 1280, 6, 64)
    # v1 accepts any channels with a feasible slab
    assert pallas_conv_feasible(720, 1280, 6, 64)
    assert pallas_conv_feasible(720, 1280, 67, 67)


def test_convblock_param_tree_identical(rng):
    """ConvBlock(use_pallas=True) and (False) must build byte-identical
    parameter trees (same names, shapes, init), so checkpoints are
    interchangeable between the kernel paths."""
    from vfi_tpu.models.layers import ConvBlock

    x = jnp.zeros((1, 16, 32, 64), jnp.float32)
    key = jax.random.PRNGKey(0)
    p_xla = ConvBlock(64).init(key, x)
    p_pal = ConvBlock(64, use_pallas=True).init(key, x)
    flat_a = jax.tree_util.tree_leaves_with_path(p_xla)
    flat_b = jax.tree_util.tree_leaves_with_path(p_pal)
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convblock_pallas_forward_matches_xla(rng, monkeypatch):
    """With the backend gate forced open (interpret mode executes the
    kernel on CPU), ConvBlock's Pallas path must match its XLA path."""
    import vfi_tpu.ops.pallas.sampling as sampling

    monkeypatch.setattr(sampling, "pallas_backend_supported", lambda: True)

    from vfi_tpu.models.layers import ConvBlock

    x = jnp.asarray(rng.standard_normal((1, 16, 32, 64)), jnp.float32)
    key = jax.random.PRNGKey(1)
    blk_x = ConvBlock(64)
    blk_p = ConvBlock(64, use_pallas=True)
    params = blk_x.init(key, x)
    np.testing.assert_allclose(
        np.asarray(blk_p.apply(params, x)),
        np.asarray(blk_x.apply(params, x)), atol=2e-5)


def test_model_conv_kernel_param_tree_stable(rng):
    """EMAVFI(conv_kernel='pallas') has the same parameter tree as the
    default — the flag changes kernels, never checkpoints."""
    from vfi_tpu.models import EMAVFI

    f = jnp.zeros((1, 16, 32, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    p_a = EMAVFI().init(key, f, f)
    p_b = EMAVFI(conv_kernel="pallas").init(key, f, f)
    assert (jax.tree_util.tree_structure(p_a)
            == jax.tree_util.tree_structure(p_b))


def _ref_chain(x, weights, biases, acts):
    o = x
    for w, b, a in zip(weights, biases, acts):
        o = _ref(o, w, b, a)
    return o


@pytest.mark.parametrize("chans,acts", [
    ((64, 64, 64), (True, True)),          # feat-block-like 2-layer
    ((128, 64, 64), (True, False)),        # motion-like first layer, mixed
    ((64, 32, 4), (True, False)),          # shrinking tail (rec-like)
    ((64, 64, 64, 64), (True, True, True)),  # 3-layer trunk chain
])
def test_conv_chain_matches_xla(rng, chans, acts):
    """The production fused-chain kernel (conv_chain_pallas) vs the
    equivalent XLA conv sequence, in interpret mode (ADVICE r4: the chain
    forward was only covered by the TPU-only smoke)."""
    from vfi_tpu.ops.pallas.conv import (conv_chain_pallas,
                                         pallas_conv_chain_feasible)

    h, w = 8, 32
    assert pallas_conv_chain_feasible(h, w, chans)
    x = jnp.asarray(rng.standard_normal((2, h, w, chans[0])), jnp.float32)
    weights, biases = [], []
    for cin, cout in zip(chans[:-1], chans[1:]):
        weights.append(jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32))
        biases.append(jnp.asarray(rng.standard_normal((cout,)) * 0.1,
                                  jnp.float32))
    out = conv_chain_pallas(x, tuple(weights), tuple(biases), tuple(acts))
    ref = _ref_chain(x, weights, biases, acts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_conv_chain_fast_gradients_match_xla(rng):
    """conv_chain_fast's custom_vjp (Pallas forward, XLA-recompute
    backward — the training path under conv_kernel='pallas') vs jax.vjp
    of the plain XLA chain."""
    from vfi_tpu.ops.pallas.wrappers import conv_chain_fast

    chans, acts = (64, 64, 32), (True, True)
    h, w = 8, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, chans[0])), jnp.float32)
    weights = tuple(jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1,
                                jnp.float32)
                    for ci, co in zip(chans[:-1], chans[1:]))
    biases = tuple(jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
                   for c in chans[1:])

    def ref(a, ws, bs):
        return _ref_chain(a, ws, bs, acts).astype(jnp.float32)

    g = jnp.asarray(rng.standard_normal((1, h, w, chans[-1])), jnp.float32)
    _, vjp_ref = jax.vjp(ref, x, weights, biases)
    _, vjp_p = jax.vjp(lambda a, ws, bs: conv_chain_fast(a, ws, bs, acts)
                       .astype(jnp.float32), x, weights, biases)
    for a, b_ in zip(jax.tree.leaves(vjp_ref(g)),
                     jax.tree.leaves(vjp_p(g))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


def test_convblock_rejects_unknown_variant():
    """An explicit bogus pallas_variant must fail loudly, not silently
    pass the wrong feasibility gate (ADVICE r4)."""
    from vfi_tpu.models.layers import ConvBlock

    x = jnp.zeros((1, 16, 32, 64), jnp.float32)
    with pytest.raises(ValueError, match="pallas_variant"):
        ConvBlock(64, use_pallas=True, pallas_variant="bogus").init(
            jax.random.PRNGKey(0), x)


def test_conv_chain_fast_mixed_dtype_backward(rng):
    """Regression (round-5 compile-bisect find): bf16 activations with
    f32 weight params — the trainer's mixed-precision policy — must
    differentiate through conv_chain_fast. The XLA-recompute backward
    used to feed lax.conv mismatched dtypes (bf16 input, f32 kernel) and
    raise; the fix casts weights to the activation dtype exactly like
    the Pallas forward does. Gradients must come back in the PARAM
    dtype (f32) for the optimizer."""
    import jax

    from vfi_tpu.ops.pallas.wrappers import conv_chain_fast

    chans, acts = (64, 64), (True,)
    h, w = 8, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, chans[0])), jnp.bfloat16)
    weights = (jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1,
                           jnp.float32),)
    biases = (jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32),)

    def f(a, ws, bs):
        return conv_chain_fast(a, ws, bs, acts).astype(jnp.float32).sum()

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(x, weights, biases)
    assert np.isfinite(float(val))
    assert grads[0].dtype == jnp.bfloat16          # dx in activation dtype
    assert grads[1][0].dtype == jnp.float32        # dW in param dtype
    assert grads[2][0].dtype == jnp.float32
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree.leaves(grads))
