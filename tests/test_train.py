"""Training-stack tests: optimizer semantics, plateau schedule, tiny-overfit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.losses import LossWeights
from vfi_tpu.models import EMAVFI
from vfi_tpu.train.loop import make_train_step
from vfi_tpu.train.state import (PlateauScheduler, create_train_state,
                                 get_learning_rate, set_learning_rate)


def test_plateau_scheduler_torch_semantics():
    s = PlateauScheduler(lr=1.0, factor=0.5, patience=2)
    assert s.step(1.0) == 1.0      # new best
    assert s.step(1.0) == 1.0      # bad 1 (not < best*(1-thr))
    assert s.step(1.0) == 1.0      # bad 2
    assert s.step(1.0) == 0.5      # bad 3 > patience -> reduce
    assert s.step(0.5) == 0.5      # new best resets counter
    assert s.step(0.9) == 0.5
    assert s.step(0.9) == 0.5
    assert s.step(0.9) == 0.25


def test_cosine_scheduler_single_anneal():
    from vfi_tpu.train.state import CosineScheduler

    s = CosineScheduler(lr0=1.0, total=10, min_lr=0.0)
    assert s.lr == 1.0                      # epoch 1 runs at lr0
    lrs = [s.step(0.0) for _ in range(10)]
    assert abs(lrs[4] - 0.5) < 1e-9         # t=5 of 10 -> cos(pi/2)
    assert lrs[-1] == 0.0                   # fully annealed at t=total
    assert s.step(0.0) == 0.0               # holds at min_lr past total
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))  # monotone


def test_cosine_scheduler_warm_restarts_and_roundtrip():
    from vfi_tpu.train.state import CosineScheduler

    s = CosineScheduler(lr0=1.0, total=20, period=5, min_lr=0.1)
    lrs = [s.step(0.0) for _ in range(10)]
    assert abs(lrs[4] - 1.0) < 1e-12        # restarts at t=5, 10
    assert abs(lrs[9] - 1.0) < 1e-12
    assert min(lrs) >= 0.1 - 1e-12
    d = s.state_dict()
    s2 = CosineScheduler(lr0=1.0, total=20, period=5, min_lr=0.1)
    s2.load_state_dict(d)
    assert s2.step(0.0) == s.step(0.0)


def test_cosine_scheduler_resume_config_owns_shape():
    """Regression: the schedule SHAPE (lr0/period/min_lr/restarts) follows
    the resuming run's config; only the clock (t, lr) restores. Restoring
    the old period while `restarts` came from the new config pinned the lr
    at min_lr via tc=min(t, old_period) for the rest of the run."""
    from vfi_tpu.train.state import CosineScheduler

    s = CosineScheduler(lr0=1e-3, total=160, period=50, min_lr=1e-5)
    for _ in range(60):
        s.step(0.0)
    d = s.state_dict()

    # resumed run intends a single cosine over the full length
    s2 = CosineScheduler(lr0=1e-3, total=160, period=0, min_lr=1e-5)
    s2.load_state_dict(d)
    assert s2.t == 60 and s2.period == 160 and s2.restarts is False
    lr = s2.step(0.0)
    assert lr > s2.min_lr * 1.5  # not pinned at the floor by old period=50


def test_scheduler_state_roundtrip():
    s = PlateauScheduler(lr=0.1)
    s.step(1.0); s.step(2.0)
    d = s.state_dict()
    s2 = PlateauScheduler(lr=999.0)
    s2.load_state_dict(d)
    assert s2.lr == s.lr and s2.best == s.best and s2.num_bad == s.num_bad


def test_set_learning_rate_roundtrip():
    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    state = create_train_state(params, 1e-3)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9


def test_grad_clip_then_adamw_update_is_bounded(rng):
    """Global-norm clip at 0.1 (reference train.py:128) caps the update."""
    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    state = create_train_state(params, 1e-3, grad_clip_norm=0.1)
    # huge fake grads
    grads = jax.tree.map(lambda p: jnp.full_like(p, 100.0), params)
    clipped, _ = state.tx.init(params), None
    updates, _ = state.tx.update(grads, state.opt_state, params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))))
    assert gnorm > 0.1  # clip actually engaged


def test_tiny_overfit_loss_decreases(rng):
    """2-sample overfit: 30 steps of the real train step must cut the loss
    (the smoke signal the reference relied on tqdm for)."""
    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    weights = LossWeights(charbonnier=1.0, vgg=0.0, color=0.0,
                          gradient=0.1, temporal=0.0)
    step = jax.jit(make_train_step(model, None, 0, weights), donate_argnums=0)

    state = create_train_state(params, 5e-3)
    # smooth targets (random noise at 16x16 is unlearnable in few steps)
    yy, xx = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16), indexing="ij")
    base = np.stack([yy, xx, yy * xx], -1).astype(np.float32)[None]
    f0 = jnp.asarray(np.concatenate([base, 1.0 - base]))
    f1 = jnp.asarray(np.concatenate([1.0 - base, base]))
    ft = (f0 + f1) / 2.0

    first = None
    for i in range(60):
        state, metrics = step(state, None, f0, ft, f1)
        if i == 0:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)


def test_checkpoint_save_restore_resume(tmp_path, rng):
    from vfi_tpu.train.checkpoints import CheckpointManager

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    state = create_train_state(params, 1e-3)
    sched = PlateauScheduler(lr=1e-3)
    sched.step(0.5)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    state = state.replace(step=state.step + 7)
    mgr.save(epoch=3, state=state, scheduler=sched, extra={"val_loss": 0.5})
    mgr.wait()
    assert mgr.latest_epoch() == 3

    fresh = create_train_state(params, 1e-3)
    sched2 = PlateauScheduler(lr=999.0)
    restored, epoch = mgr.restore(fresh, sched2)
    assert epoch == 3
    assert int(restored.step) == 7
    assert sched2.best == 0.5
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_trainer_end_to_end_tiny(tmp_path, rng):
    """Trainer wiring end-to-end on synthetic scenes: runs an epoch, writes
    checkpoints/metrics/sample image, resumes from the checkpoint."""
    import dataclasses
    import os

    from PIL import Image

    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import TrainConfig

    root = tmp_path / "data"
    for split in ("train", "val"):
        d = root / split / "scene"
        d.mkdir(parents=True)
        for i in range(5):
            img = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"f{i}.png")

    from vfi_tpu.utils.config import MeshConfig

    cfg = TrainConfig(
        batch_size=2, learning_rate=1e-3, num_epochs=1,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=2, spatial=1),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"),
        log_every=100)
    trainer = Trainer(cfg)
    history = trainer.run(log=lambda *_: None)
    trainer.ckpt.close()
    assert len(history["train_loss"]) == 1
    assert np.isfinite(history["val_loss"][0])
    assert os.path.exists(str(tmp_path / "best") + ".npz")
    assert os.path.exists(tmp_path / "imgs" / "epoch_1_generated.png")
    assert os.path.exists(tmp_path / "ckpt" / "metrics.jsonl")

    # resume: a fresh Trainer picks up epoch 0's checkpoint
    cfg2 = dataclasses.replace(cfg, num_epochs=2)
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 1
    trainer2.ckpt.close()


def test_joint_flow_training_step(rng):
    """temporal_weight > 0 + flow_module: the temporal term is LIVE and the
    flow estimator receives gradients (the reference never could,
    train.py:72-80)."""
    from vfi_tpu.models.flownet import SimpleFlowNet
    from vfi_tpu.train.loop import make_train_step

    model = EMAVFI(mid_channels=8, num_blocks=1)
    flow = SimpleFlowNet(mid_channels=8, levels=2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    mp = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fp = jax.jit(flow.init)(jax.random.PRNGKey(1), x, x)
    params = {"model": mp, "flow": fp}

    weights = LossWeights(charbonnier=1.0, vgg=0.0, color=0.0,
                          gradient=0.0, temporal=0.2)
    step = jax.jit(make_train_step(model, None, 0, weights, flow_module=flow),
                   donate_argnums=0)
    state = create_train_state(params, 1e-3)

    f0 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    ft = (f0 + f1) / 2
    before = jax.tree.map(np.asarray, state.params["flow"])
    state, metrics = step(state, None, f0, ft, f1)
    assert "temporal" in metrics and np.isfinite(float(metrics["temporal"]))
    assert "flow_photo" in metrics  # the term that actually trains the flow
    # (the temporal term alone cannot: its nearest warp has zero flow grad)
    after = state.params["flow"]
    moved = any(not np.allclose(np.asarray(a), b)
                for a, b in zip(jax.tree.leaves(after), jax.tree.leaves(before)))
    assert moved, "flow estimator params did not receive gradients"


def test_best_val_watermark_survives_resume(tmp_path, rng):
    """Regression: resuming must restore best_val, else a worse post-resume
    epoch overwrites the best-model file."""
    from vfi_tpu.train.checkpoints import CheckpointManager

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    state = create_train_state(params, 1e-3)
    sched = PlateauScheduler(lr=1e-3)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(epoch=5, state=state, scheduler=sched,
             extra={"val_loss": 0.9, "best_val": 0.42})
    mgr.wait()
    _, epoch = mgr.restore(create_train_state(params, 1e-3),
                           PlateauScheduler(lr=1e-3))
    assert epoch == 5
    assert abs(mgr.last_meta["best_val"] - 0.42) < 1e-9
    mgr.close()


def test_trainer_interrupt_saves_resumable_checkpoint(tmp_path, rng):
    """Fault containment (SURVEY §5: the reference loses everything on any
    exception): KeyboardInterrupt mid-run persists a checkpoint a fresh
    Trainer resumes from."""
    import dataclasses

    import pytest as _pytest
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
        batch_size=2, learning_rate=1e-3, num_epochs=3,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=1, spatial=1),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"),
        log_every=100)

    done = []

    def interrupting_log(msg):
        # raise the interrupt right after epoch 1's summary line
        if msg.startswith("[epoch 1/") and "val" in msg:
            done.append(msg)
            raise KeyboardInterrupt

    trainer = Trainer(cfg)
    with _pytest.raises(KeyboardInterrupt):
        trainer.run(log=interrupting_log)
    trainer.ckpt.close()
    assert done, "interrupt was never injected"

    trainer2 = Trainer(cfg)
    assert trainer2.start_epoch >= 1  # resumes past the interrupted epoch
    history = trainer2.run(log=lambda *_: None)
    trainer2.ckpt.close()
    assert len(history["val_loss"]) == 3 - trainer2.start_epoch

def test_trainer_interrupt_after_resume_saves_new_step(tmp_path, rng):
    """Regression: the interrupt checkpoint on a RESUMED run must target a
    NEW orbax step (start_epoch + completed count) — the old
    max(start_epoch, len(history)) collided with an already-saved step and
    dropped the best_val watermark (no extra passed)."""
    import dataclasses

    import pytest as _pytest
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
        batch_size=2, learning_rate=1e-3, num_epochs=2,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=1, spatial=1),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"),
        log_every=100)

    trainer = Trainer(cfg)
    trainer.run(log=lambda *_: None)  # completes epochs 0, 1
    trainer.ckpt.close()

    # resume for 2 more epochs; interrupt after the SECOND post-resume
    # epoch's summary (epoch index 3), when one full epoch is already saved
    cfg2 = dataclasses.replace(cfg, num_epochs=4)

    def interrupting_log(msg):
        if msg.startswith("[epoch 4/") and "val" in msg:
            raise KeyboardInterrupt

    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 2
    best_before = trainer2.best_val
    with _pytest.raises(KeyboardInterrupt):
        trainer2.run(log=interrupting_log)
    trainer2.ckpt.close()
    assert np.isfinite(best_before)  # watermark restored on resume

    trainer3 = Trainer(cfg2)
    # old code saved at step 2 (collision) -> resume restarted at epoch 3;
    # the interrupt save must land at step 3 so nothing re-runs
    assert trainer3.start_epoch == 4
    assert np.isfinite(trainer3.best_val)  # watermark carried by the save
    trainer3.ckpt.close()


def test_trainer_warm_start_init_model(tmp_path, rng):
    """init_model_path warm-starts a FRESH run (epoch 0) from an exported
    npz; mismatched shapes fail loudly."""
    import dataclasses

    from PIL import Image

    from vfi_tpu.train.checkpoints import save_params_npz
    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import MeshConfig, TrainConfig

    root = tmp_path / "data"
    for split in ("train", "val"):
        d = root / split / "scene"
        d.mkdir(parents=True)
        for i in range(3):
            img = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"f{i}.png")

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    donor = jax.jit(model.init)(jax.random.PRNGKey(7), x, x)
    save_params_npz(donor, str(tmp_path / "donor.npz"))

    cfg = TrainConfig(
        batch_size=2, num_epochs=1,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=1, spatial=1),
        init_model_path=str(tmp_path / "donor.npz"),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"))
    trainer = Trainer(cfg)
    trainer.ckpt.close()
    assert trainer.start_epoch == 0  # fresh run, not a resume
    got = jax.tree.leaves(trainer.state.params)
    want = jax.tree.leaves(donor)
    assert all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(got, want))

    # wrong architecture -> loud failure naming the knob
    bad = dataclasses.replace(cfg, mid_channels=16,
                              checkpoint_path=str(tmp_path / "ckpt2"))
    with pytest.raises(ValueError, match="init_model_path"):
        Trainer(bad)


def test_trainer_ema(tmp_path, rng):
    """ema_decay > 0: the EMA shadow tracks (but lags) the live params, the
    best-model npz exports the SHADOW, the shadow persists + restores across
    a resume, and decay=0 keeps the feature fully off."""
    import dataclasses

    from PIL import Image

    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import MeshConfig, TrainConfig
    from vfi_tpu.utils.convert import load_params_npz

    root = tmp_path / "data"
    for split in ("train", "val"):
        d = root / split / "scene"
        d.mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"f{i}.png")

    cfg = TrainConfig(
        batch_size=2, learning_rate=1e-3, num_epochs=1,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        # data=2: multi-device meshes honor buffer donation (single-device
        # CPU jit ignores it), which is what catches shadow/params aliasing
        mesh=MeshConfig(data=2, spatial=1), ema_decay=0.9,
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"), log_every=100)
    trainer = Trainer(cfg)
    init_leaves = [np.asarray(v) for v in jax.tree.leaves(trainer.ema_params)]
    trainer.run(log=lambda *_: None)
    trainer.ckpt.wait()
    ema_leaves = [np.asarray(v) for v in jax.tree.leaves(trainer.ema_params)]
    live_leaves = [np.asarray(v) for v in jax.tree.leaves(trainer.state.params)]
    # the shadow moved off init but is NOT the live params (it lags)
    assert any(not np.allclose(a, b) for a, b in zip(init_leaves, ema_leaves))
    assert any(not np.allclose(a, b) for a, b in zip(ema_leaves, live_leaves))
    # every shadow leaf lies between init and live (convex combination)
    for e, i, l in zip(ema_leaves, init_leaves, live_leaves):
        lo, hi = np.minimum(i, l), np.maximum(i, l)
        assert np.all(e >= lo - 1e-6) and np.all(e <= hi + 1e-6)
    # the best-model export is the SHADOW, not the live params
    best = load_params_npz(str(tmp_path / "best") + ".npz")
    best_leaves = [np.asarray(v) for v in jax.tree.leaves(best)]
    assert all(np.allclose(a, b) for a, b in zip(best_leaves, ema_leaves))
    # the shadow persisted next to the orbax step
    assert (tmp_path / "ckpt" / "ema_latest.npz").exists()
    trainer.ckpt.close()

    # resume restores the shadow, not a re-synced copy of the live params
    cfg2 = dataclasses.replace(cfg, num_epochs=2)
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 1
    got = [np.asarray(v) for v in jax.tree.leaves(trainer2.ema_params)]
    assert all(np.allclose(a, b) for a, b in zip(got, ema_leaves))
    trainer2.ckpt.close()

    # decay 0 -> feature off
    cfg3 = dataclasses.replace(cfg, ema_decay=0.0,
                               checkpoint_path=str(tmp_path / "ckpt3"),
                               resume=False)
    trainer3 = Trainer(cfg3)
    assert trainer3.ema_params is None and trainer3._ema_update is None
    trainer3.ckpt.close()

    # out-of-range decay -> loud failure
    cfg4 = dataclasses.replace(cfg, ema_decay=1.0,
                               checkpoint_path=str(tmp_path / "ckpt4"))
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(cfg4)


def test_trainer_best_metric_psnr(tmp_path, rng):
    """best_metric='val_psnr' gates the best-model export on PSNR (maximized)
    instead of the multi-term val loss — the quality-run mode added after the
    round-2 EMA fine-tune showed val loss drifting UP while PSNR improved."""
    import dataclasses

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
        batch_size=2, learning_rate=1e-3, num_epochs=2,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=2, spatial=1),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"),
        best_metric="val_psnr", log_every=100)
    trainer = Trainer(cfg)
    history = trainer.run(log=lambda *_: None)
    trainer.ckpt.wait()
    assert os.path.exists(str(tmp_path / "best") + ".npz")
    # the watermark is the negated best PSNR seen so far
    assert trainer.best_val == -max(history["psnr"])
    trainer.ckpt.close()

    # the watermark survives a resume (same metric space)
    cfg2 = dataclasses.replace(cfg, num_epochs=3)
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 2
    assert trainer2.best_val == -max(history["psnr"])
    trainer2.ckpt.close()

    # unknown metric -> loud failure
    cfg3 = dataclasses.replace(cfg, best_metric="ssim")
    with pytest.raises(ValueError, match="best_metric"):
        Trainer(cfg3)


def test_grad_accumulation_matches_monolithic(rng):
    """accum_steps=2 over batch 4 must produce the same update as the
    monolithic batch-4 step (identical params in, near-identical params
    out) — including the flow-prior joint tree, the configuration the
    feature exists for (docs/PERFORMANCE.md 'Flow-prior training memory')."""
    from vfi_tpu.models.flownet import SimpleFlowNet

    model = EMAVFI(mid_channels=8, num_blocks=1)
    flow = SimpleFlowNet(mid_channels=8, levels=2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    mp = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fp = jax.jit(flow.init)(jax.random.PRNGKey(1), x, x)
    params = {"model": mp, "flow": fp}
    weights = LossWeights(charbonnier=1.0, vgg=0.0, color=0.3,
                          gradient=0.1, temporal=0.2)

    f0 = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)).astype(np.float32))
    ft = (f0 + f1) / 2

    outs = {}
    for accum in (1, 2):
        step = jax.jit(make_train_step(model, None, 0, weights,
                                       flow_module=flow, flow_prior=True,
                                       accum_steps=accum))
        state = create_train_state(jax.tree.map(jnp.copy, params), 1e-3)
        state, metrics = step(state, None, f0, ft, f1)
        outs[accum] = (state.params, metrics)

    p1, m1 = outs[1]
    p2, m2 = outs[2]
    # losses/terms are means over the same samples; summation order differs
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=5e-4,
                                   err_msg=k)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_trainer_accum_steps_validation(tmp_path):
    """batch_size must split evenly into accum_steps x data-axis
    microbatches; misconfiguration fails loudly at construction."""
    import dataclasses

    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import MeshConfig, TrainConfig

    cfg = TrainConfig(
        batch_size=4, num_epochs=1,
        train_data_dir=str(tmp_path), val_data_dir=str(tmp_path),
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False,
        mesh=MeshConfig(data=1, spatial=1),
        accum_steps=3)
    with pytest.raises(ValueError, match="accum_steps"):
        Trainer(cfg)
    with pytest.raises(ValueError, match="accum_steps"):
        Trainer(dataclasses.replace(cfg, accum_steps=0))


def test_trainer_cascade_smoke(tmp_path, rng):
    """cascade_levels=2 trains end-to-end (the coarse pass shares weights,
    so checkpoints round-trip through the same param tree)."""
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
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False, cascade_levels=2,
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


def test_fuse_project_trainer_warm_start_from_projected(tmp_path, rng):
    """The queueW path: a 67ch-topology checkpoint run through
    tools/project_checkpoint.py warm-starts a fuse_project=True Trainer and
    one train step runs (config plumb + surgery tree compatibility)."""
    import sys as _sys

    from PIL import Image

    from vfi_tpu.train.checkpoints import save_params_npz
    from vfi_tpu.train.loop import Trainer
    from vfi_tpu.utils.config import MeshConfig, TrainConfig

    _sys.path.insert(0, "tools")
    from project_checkpoint import project_tree

    root = tmp_path / "data"
    for split in ("train", "val"):
        d = root / split / "scene"
        d.mkdir(parents=True)
        for i in range(3):
            img = rng.integers(0, 255, (20, 24, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"f{i}.png")

    donor_model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    donor = jax.jit(donor_model.init)(jax.random.PRNGKey(7), x, x)
    save_params_npz(donor, str(tmp_path / "donor.npz"))
    z = np.load(tmp_path / "donor.npz")
    proj, _ = project_tree({k: z[k] for k in z.files})
    np.savez(tmp_path / "proj.npz", **proj)

    cfg = TrainConfig(
        batch_size=2, num_epochs=1,
        train_data_dir=str(root / "train"), val_data_dir=str(root / "val"),
        crop_size=(16, 16), random_rotation=False, horizontal_flip=False,
        color_jitter=None, random_grayscale=0.0,
        vgg_weight=0.0, temporal_weight=0.0,
        mid_channels=8, num_blocks=1, bf16=False, fuse_project=True,
        mesh=MeshConfig(data=1, spatial=1),
        init_model_path=str(tmp_path / "proj.npz"),
        checkpoint_path=str(tmp_path / "ckpt"),
        best_model_path=str(tmp_path / "best"),
        output_image_path=str(tmp_path / "imgs"))
    trainer = Trainer(cfg)
    assert "fuse_proj" in trainer.state.params["params"]
    history = trainer.run()
    assert len(history["val_loss"]) == 1
    assert np.isfinite(history["val_loss"][0])
