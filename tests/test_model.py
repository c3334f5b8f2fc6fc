"""EMAVFI model tests: parameter plan, output contract, checkpoint mapping.

The reference model is src/models/ema_vfi.py:63-171; its derived param count
is 1,430,045 (SURVEY §6). The converter test builds a synthetic torch-style
state_dict with the reference's exact tensor names/shapes (no torch needed)
and checks it lands on our param tree with correct transposes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.models import EMAVFI
from vfi_tpu.utils.convert import convert_ema_vfi_state_dict, load_params_npz, save_params_npz


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    return model, params


def test_param_count_matches_reference():
    model = EMAVFI()  # defaults: in 3, mid 64, blocks 3
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 1_430_045


def test_forward_shape_range_and_dtype(tiny_model_and_params, rng):
    model, params = tiny_model_and_params
    f0 = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    out = jax.jit(model.apply)(params, f0, f1)
    assert out.shape == (2, 16, 16, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0  # (tanh+1)/2 (ema_vfi.py:146)


def test_bf16_compute_path(tiny_model_and_params, rng):
    _, params = tiny_model_and_params
    model16 = EMAVFI(mid_channels=8, num_blocks=1, dtype=jnp.bfloat16)
    f0 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    out16 = jax.jit(model16.apply)(params, f0, f0)
    assert out16.dtype == jnp.float32  # output promoted back
    model32 = EMAVFI(mid_channels=8, num_blocks=1)
    out32 = jax.jit(model32.apply)(params, f0, f0)
    # bf16 activations should stay close to f32 result
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=0.05)


def _reference_state_dict(rng, mid=64, blocks=3, cin=3):
    """Synthetic torch-style EMA_VFI state_dict (names/shapes per
    reference ema_vfi.py:73-107, OIHW / (out,in) layouts)."""
    sd = {}

    def conv(name, cout, cin_, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((cout, cin_, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((cout,)).astype(np.float32)

    conv("feat_ext_conv1.0", mid, 2 * cin)
    for i in range(blocks):
        conv(f"feat_ext_blocks.conv_block_{i}.0", mid, mid)
    conv("context_encoding.0.0", 2 * mid, mid)
    conv("context_encoding.1.0", 4 * mid, 2 * mid)
    conv("context_encoding.2.0", 4 * mid, 4 * mid)
    sd["context_encoding.5.weight"] = rng.standard_normal((mid, 4 * mid)).astype(np.float32)
    sd["context_encoding.5.bias"] = rng.standard_normal((mid,)).astype(np.float32)
    conv("motion_estimation.0.0", mid, 2 * mid)
    conv("motion_estimation.1.0", mid, mid)
    conv("motion_estimation.2", 2, mid)
    fch = mid + cin
    for i in range(blocks):
        conv(f"attention_blocks.{i}.offset_conv", 27, fch)
        conv(f"attention_blocks.{i}.dcn_v2", fch, fch)
    conv("reconstruction.0.0", mid, fch)
    conv("reconstruction.1.0", mid // 2, mid)
    conv("reconstruction.2", cin, mid // 2)
    return sd


def test_checkpoint_conversion_structure(rng):
    """Converted tree must match the model's init tree leaf-for-leaf, and a
    known weight must land transposed in the right spot."""
    sd = _reference_state_dict(rng)
    converted = convert_ema_vfi_state_dict(sd)

    model = EMAVFI()
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, x)

    conv_paths = jax.tree_util.tree_flatten_with_path(converted)[0]
    exp_paths = jax.tree_util.tree_flatten_with_path(expected)[0]
    assert [p for p, _ in conv_paths] == [p for p, _ in exp_paths]
    for (path, got), (_, want) in zip(conv_paths, exp_paths):
        assert got.shape == want.shape, f"{path}: {got.shape} != {want.shape}"

    # spot-check OIHW->HWIO: torch [o, i, ky, kx] == flax [ky, kx, i, o]
    w_t = sd["feat_ext_conv1.0.weight"]
    w_f = converted["params"]["feat_ext_conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(w_f[1, 2, 3, 4], w_t[4, 3, 1, 2])
    # dense (out,in) -> (in,out)
    d_t = sd["context_encoding.5.weight"]
    d_f = converted["params"]["ctx_dense"]["kernel"]
    np.testing.assert_array_equal(d_f, d_t.T)


def test_converted_params_run_forward(rng):
    sd = _reference_state_dict(rng, mid=8, blocks=1)
    params = convert_ema_vfi_state_dict(sd, num_blocks=1)
    model = EMAVFI(mid_channels=8, num_blocks=1)
    f = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    out = jax.jit(model.apply)(jax.tree.map(jnp.asarray, params), f, f)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_params_npz_roundtrip(tiny_model_and_params, tmp_path):
    _, params = tiny_model_and_params
    p = str(tmp_path / "params.npz")
    save_params_npz(jax.tree.map(np.asarray, params), p)
    loaded = load_params_npz(p)
    for (path1, a), (path2, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        assert path1 == path2
        np.testing.assert_array_equal(np.asarray(a), b)


def test_dcn_tile_w_inert_off_pallas_path(tiny_model_and_params, rng):
    """dcn_tile_w only selects the Pallas kernel's column plan — off the
    Pallas path (use_pallas=False, e.g. CPU) it must be accepted and be a
    no-op, so configs tuned for TPU serving run unchanged everywhere."""
    _, params = tiny_model_and_params
    f0 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    base = EMAVFI(mid_channels=8, num_blocks=1, dcn_max_offset=2)
    tiled = EMAVFI(mid_channels=8, num_blocks=1, dcn_max_offset=2,
                   dcn_tile_w=256)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(base.apply)(params, f0, f1)),
        np.asarray(jax.jit(tiled.apply)(params, f0, f1)))


def test_zero_init_offsets_at_init(tiny_model_and_params):
    """The offset conv must be zero-init (weights AND bias) so the model
    starts as a plain conv stack (reference ema_vfi.py:42-43)."""
    _, params = tiny_model_and_params
    off = params["params"]["fusion_dcn0"]["offset_conv"]
    assert float(jnp.abs(off["kernel"]).max()) == 0.0
    assert float(jnp.abs(off["bias"]).max()) == 0.0


def test_flownet_shapes_and_zero_flow_identity(rng):
    """SimpleFlowNet output contract + a sanity property: identical frames
    admit flow ~ learnable; shapes/dtypes must be exact."""
    from vfi_tpu.models.flownet import SimpleFlowNet

    model = SimpleFlowNet(mid_channels=8, levels=2)
    f0 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), f0, f1)
    flow = jax.jit(model.apply)(params, f0, f1)
    assert flow.shape == (2, 16, 16, 2)
    assert flow.dtype == jnp.float32
    assert np.isfinite(np.asarray(flow)).all()


def test_temporal_loss_with_flownet(rng):
    """The full 5-term objective is trainable with SimpleFlowNet plugged in
    (the reference never could: estimator missing, train.py:72-80)."""


    from vfi_tpu.losses import LossWeights, total_loss
    from vfi_tpu.models.flownet import SimpleFlowNet

    model = SimpleFlowNet(mid_channels=8, levels=2)
    f0 = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    pred = (f0 + f1) / 2
    params = jax.jit(model.init)(jax.random.PRNGKey(0), f0, f1)

    def flow_fn(a, b):
        return model.apply(params, a, b)

    w = LossWeights(vgg=0.0, temporal=0.15)
    tot, terms = total_loss(pred, pred, None, w, flow_estimator=flow_fn,
                            frame0=f0, frame1=f1)
    assert "temporal" in terms
    assert np.isfinite(float(tot))


def test_vgg16_converter_structure(rng):
    """convert_vgg16_state_dict maps torchvision feature indices onto
    VGG16Features conv0..conv9 with OIHW->HWIO transposes."""
    from vfi_tpu.models.vgg import VGG16Features
    from vfi_tpu.utils.convert import convert_vgg16_state_dict

    plan = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
            (256, 256), (256, 256), (512, 256), (512, 512), (512, 512)]
    torch_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)
    sd = {}
    for (cout, cin), ti in zip(plan, torch_idx):
        sd[f"features.{ti}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32)
        sd[f"features.{ti}.bias"] = rng.standard_normal((cout,)).astype(np.float32)
    params = convert_vgg16_state_dict(sd)

    module = VGG16Features(max_stage=3)
    expected = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3), jnp.float32))
    got_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    exp_paths = jax.tree_util.tree_flatten_with_path(expected)[0]
    assert [p for p, _ in got_paths] == [p for p, _ in exp_paths]
    for (path, a), (_, b) in zip(got_paths, exp_paths):
        assert a.shape == b.shape, f"{path}: {a.shape} != {b.shape}"
    # spot-check transpose
    np.testing.assert_array_equal(
        params["params"]["conv0"]["kernel"][0, 1, 2, 3],
        sd["features.0.weight"][3, 2, 0, 1])


def test_use_pallas_on_cpu_falls_back_to_shifts(tiny_model_and_params, rng):
    """use_pallas=True off-TPU must degrade to the XLA shifts op, not crash.

    Regression: `infer.py video --use_pallas` on the CPU backend raised
    "Only interpret mode is supported on CPU backend" from pallas_call at
    lowering time (session 11). The platform gate
    (`pallas_backend_supported`) now routes the DCN and the bounded warp
    to the shift-decomposition path, which is numerically identical —
    so the two settings must agree exactly on CPU."""
    _, params = tiny_model_and_params
    kw = dict(mid_channels=8, num_blocks=1, dcn_max_offset=2,
              warp_max_flow=4)
    f0 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    out_pallas = jax.jit(EMAVFI(use_pallas=True, **kw).apply)(params, f0, f1)
    out_shifts = jax.jit(EMAVFI(use_pallas=False, **kw).apply)(params, f0, f1)
    np.testing.assert_array_equal(np.asarray(out_pallas),
                                  np.asarray(out_shifts))


# --- self-cascade mode (cascade_levels > 1) ----------------------------------


def test_cascade_param_tree_identical():
    """The cascade shares weights across scales: the parameter tree must be
    byte-identical in structure to the k=1 tree so k=1 checkpoints
    warm-start cascade fine-tunes directly."""
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    base = jax.eval_shape(EMAVFI(mid_channels=8, num_blocks=1).init,
                          jax.random.PRNGKey(0), x, x)
    casc = jax.eval_shape(
        EMAVFI(mid_channels=8, num_blocks=1, cascade_levels=2).init,
        jax.random.PRNGKey(0), x, x)
    assert jax.tree_util.tree_structure(base) == jax.tree_util.tree_structure(casc)
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(base), jax.tree.leaves(casc)))


def test_cascade_forward_odd_size_and_contract(tiny_model_and_params, rng):
    """k=2 runs on sizes with odd dims (ceil-div coarse level), keeps the
    output contract, and actually engages the prior path (output differs
    from k=1 on a moving input; identical on a static pair, where the
    coarse flow prediction produces only a tiny sub-pixel pre-warp)."""
    _, params = tiny_model_and_params
    k1 = EMAVFI(mid_channels=8, num_blocks=1)
    k2 = EMAVFI(mid_channels=8, num_blocks=1, cascade_levels=2)
    f0 = jnp.asarray(rng.uniform(size=(1, 17, 23, 3)).astype(np.float32))
    # large shift: roll by 5 px so the coarse prior has something to see
    f1 = jnp.roll(f0, 5, axis=2)
    o1 = jax.jit(k1.apply)(params, f0, f1)
    o2 = jax.jit(k2.apply)(params, f0, f1)
    assert o2.shape == o1.shape == (1, 17, 23, 3)
    assert bool(jnp.isfinite(o2).all())
    assert float(o2.min()) >= 0.0 and float(o2.max()) <= 1.0
    assert float(jnp.abs(o2 - o1).max()) > 1e-6


def test_cascade_is_trainable(tiny_model_and_params, rng):
    """Gradients flow through the coarse pass (the pre-warp is
    differentiable w.r.t. the coarse motion weights)."""
    _, params = tiny_model_and_params
    k2 = EMAVFI(mid_channels=8, num_blocks=1, cascade_levels=2)
    f0 = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    f1 = jnp.roll(f0, 3, axis=1)
    tgt = 0.5 * (f0 + f1)

    def loss(p):
        return jnp.mean((k2.apply(p, f0, f1) - tgt) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0.0
    # specifically: the motion stage gets gradient signal from the coarse
    # pass too — its grads must be nonzero
    mg = g["params"]["motion_conv3"]["conv"]["kernel"] \
        if "conv" in g["params"]["motion_conv3"] else g["params"]["motion_conv3"]
    assert float(jnp.abs(jax.tree.leaves(mg)[0]).sum()) > 0.0


# (cascade + spatial used to be rejected; round 3 implements the global
# coarse pass — parity covered by
# tests/test_parallel.py::test_cascade_spatial_shard_map_matches_single_device)


def test_fuse_project_tree_and_forward(rng):
    """fuse_project=True: the DCN stack runs at mid_channels; the tree grows
    a fuse_proj module that infer_model_dims auto-detects."""
    from vfi_tpu.utils.convert import infer_model_dims

    model = EMAVFI(mid_channels=8, num_blocks=1, fuse_project=True)
    f = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), f, f)
    p = params["params"]
    assert "fuse_proj" in p
    assert p["fuse_proj"]["conv"]["kernel"].shape == (1, 1, 11, 8)
    assert p["fusion_dcn0"]["kernel"].shape == (3, 3, 8, 8)
    assert p["fusion_dcn0"]["offset_conv"]["kernel"].shape == (3, 3, 8, 27)
    assert p["rec_conv1"]["conv"]["kernel"].shape == (3, 3, 8, 64 // 8)
    dims = infer_model_dims(params)
    assert dims["fuse_project"] is True and dims["mid_channels"] == 8
    out = jax.jit(model.apply)(params, f, f)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_project_checkpoint_surgery_exact_when_dropped_channels_dead(
        rng, tmp_path):
    """tools/project_checkpoint surgery is exactly function-preserving when
    the dropped channels have zero weight in every consumer slice (the
    general case differs only by those channels' contributions)."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    from project_checkpoint import project_tree

    base = EMAVFI(mid_channels=8, num_blocks=2)
    f0 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    params = base.init(jax.random.PRNGKey(1), f0, f1)
    params = jax.tree.map(lambda a: np.array(a, copy=True), params)
    # kill 3 feature channels' influence everywhere the fused stream is read
    dead = [1, 4, 6]
    p = params["params"]
    for n in ("fusion_dcn0", "fusion_dcn1"):
        p[n]["kernel"][:, :, dead, :] = 0.0
        p[n]["kernel"][:, :, :, dead] = 0.0
        p[n]["offset_conv"]["kernel"][:, :, dead, :] = 0.0
    p["rec_conv1"]["conv"]["kernel"][:, :, dead, :] = 0.0

    npz = str(tmp_path / "base.npz")
    save_params_npz(params, npz)
    z = np.load(npz)
    proj_flat, dropped = project_tree({k: z[k] for k in z.files})
    assert dropped == dead
    out_npz = str(tmp_path / "proj.npz")
    np.savez(out_npz, **proj_flat)
    proj_params = load_params_npz(out_npz)

    proj_model = EMAVFI(mid_channels=8, num_blocks=2, fuse_project=True)
    ref = np.asarray(jax.jit(base.apply)(params, f0, f1))
    got = np.asarray(jax.jit(proj_model.apply)(proj_params, f0, f1))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)
