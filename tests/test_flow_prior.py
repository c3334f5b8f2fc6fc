"""Flow-prior pre-warp (models/prior.py) — the large-motion lever.

Covers: the composition helper's warp semantics, inference-engine parity
(zero prior == no prior), and end-to-end training with flow_prior on
(gradients reach the flow estimator through the prior warp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfi_tpu.models import EMAVFI
from vfi_tpu.models.prior import prior_prewarp


def test_prior_prewarp_halves_constant_flow(rng):
    """A constant flow of (dx, dy) = (4, 0) with scale 0.5 must shift the
    frame content by exactly 2 columns (backward warp: output[x] reads
    input[x + 2])."""
    img = jnp.asarray(rng.uniform(0, 1, (1, 8, 16, 3)).astype(np.float32))

    def flow_apply(f0, f1):
        return jnp.full(f1.shape[:3] + (2,), 0.0, f1.dtype).at[..., 0].set(4.0)

    out, flow01 = prior_prewarp(flow_apply, img, img, scale=0.5)
    assert flow01.shape == (1, 8, 16, 2)
    np.testing.assert_allclose(np.asarray(out[0, :, :14]),
                               np.asarray(img[0, :, 2:]), atol=1e-6)
    # out-of-image reads are zero (warp zeros padding)
    np.testing.assert_allclose(np.asarray(out[0, :, 14:]), 0.0, atol=1e-6)


def test_prior_prewarp_zero_scale_is_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))

    def flow_apply(f0, f1):
        return jnp.asarray(rng.uniform(-3, 3, (1, 8, 8, 2)).astype(np.float32))

    out, _ = prior_prewarp(flow_apply, img, img, scale=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def _zero_flow_params(mid=8, levels=2):
    """SimpleFlowNet params zeroed — every conv then outputs exactly 0, so
    every pyramid level's residual (and the total flow) is exactly 0."""
    from vfi_tpu.models.flownet import SimpleFlowNet

    net = SimpleFlowNet(mid_channels=mid, levels=levels)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    fp = jax.jit(net.init)(jax.random.PRNGKey(0), x, x)
    return jax.tree.map(jnp.zeros_like, fp)


def test_interpolator_zero_prior_matches_no_prior(rng):
    """FrameInterpolator(flow_params=zeros) must reproduce the plain
    engine's output: zero flow -> identity pre-warp."""
    from vfi_tpu.infer.pair import FrameInterpolator

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)

    f0 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)

    plain = FrameInterpolator(params, bf16=False)
    prior = FrameInterpolator(params, bf16=False,
                              flow_params=_zero_flow_params(),
                              flow_mid_channels=8, flow_levels=2)
    np.testing.assert_allclose(np.asarray(plain.midpoints(f0, f1)),
                               np.asarray(prior.midpoints(f0, f1)),
                               atol=1e-5)


def test_interpolator_prior_rejects_spatial():
    from vfi_tpu.infer.pair import FrameInterpolator

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    with pytest.raises(ValueError, match="spatial"):
        FrameInterpolator(params, bf16=False, spatial=True,
                          flow_params=_zero_flow_params())


def test_train_step_flow_prior_grads_reach_estimator(rng):
    """flow_prior=True: the reconstruction loss alone (temporal weight off in
    total_loss is impossible here since flow_module implies temporal, so use
    charbonnier-dominated weights) moves the flow estimator through the
    prior warp."""
    from vfi_tpu.losses.losses import LossWeights
    from vfi_tpu.models.flownet import SimpleFlowNet
    from vfi_tpu.train.loop import make_train_step
    from vfi_tpu.train.state import create_train_state

    model = EMAVFI(mid_channels=8, num_blocks=1)
    flow = SimpleFlowNet(mid_channels=8, levels=2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    mp = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fp = jax.jit(flow.init)(jax.random.PRNGKey(1), x, x)
    params = {"model": mp, "flow": fp}

    weights = LossWeights(charbonnier=1.0, vgg=0.0, color=0.0,
                          gradient=0.0, temporal=0.1)
    step = jax.jit(make_train_step(model, None, 0, weights, flow_module=flow,
                                   flow_prior=True),
                   donate_argnums=0)
    state = create_train_state(params, 1e-3)

    f0 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    ft = (f0 + f1) / 2
    before = jax.tree.map(np.asarray, state.params["flow"])
    state, metrics = step(state, None, f0, ft, f1)
    assert np.isfinite(float(metrics["loss"]))
    after = state.params["flow"]
    moved = any(not np.allclose(np.asarray(a), b)
                for a, b in zip(jax.tree.leaves(after),
                                jax.tree.leaves(before)))
    assert moved, "flow params did not move under flow_prior training"


def test_trainer_flow_prior_end_to_end(tmp_path, rng):
    """Trainer with flow_prior=true: one epoch runs, eval/sample paths use
    the joint tree, and both .npz + .flow.npz are exported."""
    import os

    from PIL import Image

    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import MeshConfig, TrainConfig

    root = tmp_path / "data"
    for split in ("train", "val"):
        d = root / split / "scene"
        d.mkdir(parents=True)
        for i in range(5):
            img = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"f{i}.png")

    cfg = TrainConfig(
        batch_size=2, learning_rate=1e-3, num_epochs=1,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.1,
        train_flow_estimator=True, flow_prior=True,
        flow_mid_channels=8, flow_levels=2,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=2, spatial=1),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"),
        log_every=100)
    trainer = Trainer(cfg)
    history = trainer.run(log=lambda *_: None)
    trainer.ckpt.close()
    assert np.isfinite(history["val_loss"][0])
    assert os.path.exists(str(tmp_path / "best") + ".npz")
    assert os.path.exists(str(tmp_path / "best") + ".flow.npz")
    assert os.path.exists(tmp_path / "imgs" / "epoch_1_generated.png")


def test_trainer_flow_prior_requires_estimator(tmp_path):
    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import MeshConfig, TrainConfig

    cfg = TrainConfig(flow_prior=True, temporal_weight=0.0,
                      mesh=MeshConfig(data=1, spatial=1),
                      checkpoint_path=str(tmp_path / "c"),
                      best_model_path=str(tmp_path / "b"),
                      output_image_path=str(tmp_path / "i"))
    with pytest.raises(ValueError, match="flow_prior"):
        Trainer(cfg)


def test_flow_photo_pyramid_terms_and_grads(rng):
    """flow_photo_pyramid adds 1/2- and 1/4-scale photometric terms and the
    coarse flow levels receive gradient through them."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfi_tpu.losses import LossWeights
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.models.flownet import SimpleFlowNet
    from vfi_tpu.train.loop import make_train_step
    from vfi_tpu.train.state import create_train_state

    model = EMAVFI(mid_channels=8, num_blocks=1)
    flow = SimpleFlowNet(mid_channels=8, levels=2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    mp = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fp = jax.jit(flow.init)(jax.random.PRNGKey(1), x, x)
    weights = LossWeights(vgg=0.0, temporal=0.2)
    step = jax.jit(make_train_step(model, None, 0, weights, flow_module=flow,
                                   flow_prior=True, flow_photo_pyramid=True))
    state = create_train_state({"model": mp, "flow": fp}, 1e-3)
    f0 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    ft = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    state2, m = step(state, None, f0, ft, f1)
    assert "flow_photo_s2" in m and "flow_photo_s4" in m
    assert np.isfinite(float(m["flow_photo_s2"]))
    # coarse level (level0) params moved
    a = jax.tree.leaves(state.params["flow"]["params"]["level0"])
    b = jax.tree.leaves(state2.params["flow"]["params"]["level0"])
    assert any(not np.allclose(np.asarray(x_), np.asarray(y_))
               for x_, y_ in zip(a, b))


def test_flow_photo_occlusion_mask(rng):
    """flow_photo_occlusion: the forward-backward consistency mask reports
    its occluded fraction, the masked term stays finite, flow params still
    train, and with a self-consistent (zero-flow) estimator the mask is
    all-ones so the masked photometric equals the unmasked one."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vfi_tpu.losses import LossWeights
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.models.flownet import SimpleFlowNet
    from vfi_tpu.train.loop import make_train_step
    from vfi_tpu.train.state import create_train_state

    model = EMAVFI(mid_channels=8, num_blocks=1)
    flow = SimpleFlowNet(mid_channels=8, levels=2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    mp = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fp = jax.jit(flow.init)(jax.random.PRNGKey(1), x, x)
    weights = LossWeights(vgg=0.0, temporal=0.2)
    f0 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    ft = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))

    step = jax.jit(make_train_step(
        model, None, 0, weights, flow_module=flow, flow_prior=True,
        flow_photo_pyramid=True, flow_photo_occlusion=True))
    state = create_train_state({"model": mp, "flow": fp}, 1e-3)
    state2, m = step(state, None, f0, ft, f1)
    assert "flow_occ_frac" in m
    occ = float(m["flow_occ_frac"])
    assert 0.0 <= occ <= 1.0
    assert np.isfinite(float(m["flow_photo"]))
    assert np.isfinite(float(m["flow_photo_s2"]))
    a = jax.tree.leaves(state.params["flow"])
    b = jax.tree.leaves(state2.params["flow"])
    assert any(not np.allclose(np.asarray(x_), np.asarray(y_))
               for x_, y_ in zip(a, b))

    # Fresh init => near-zero flows => fw/bw consistent => mask ~ all ones
    # => flow_photo identical to the unmasked objective on the same params.
    step_plain = jax.jit(make_train_step(
        model, None, 0, weights, flow_module=flow, flow_prior=True,
        flow_photo_pyramid=True, flow_photo_occlusion=False))
    sp, mp_ = step_plain(create_train_state({"model": mp, "flow": fp}, 1e-3),
                         None, f0, ft, f1)
    assert occ == 0.0
    np.testing.assert_allclose(float(m["flow_photo"]),
                               float(mp_["flow_photo"]), rtol=1e-6)
