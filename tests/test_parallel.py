"""Mesh/sharding tests on the 8-virtual-CPU-device fake backend, incl. a
full data-parallel train step — the distributed-test harness the reference
lacks (SURVEY §4 item 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.parallel import (batch_sharding, make_mesh, replicated,
                              shard_batch, spatial_sharding)


def test_eight_fake_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "spatial": 1}
    mesh2 = make_mesh(data=-1, spatial=2)
    assert mesh2.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh(data=16, spatial=1)


def test_shard_batch_places_batch_across_devices():
    mesh = make_mesh()
    x = np.zeros((16, 8, 8, 3), np.float32)
    (xs,) = shard_batch((x,), mesh)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh), ndim=4)
    # each device holds 2 of 16 batch rows
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 8, 8, 3)


def test_spatial_sharding_splits_height():
    mesh = make_mesh(data=-1, spatial=2)
    x = np.zeros((4, 16, 8, 3), np.float32)
    xs = jax.device_put(x, spatial_sharding(mesh))
    assert xs.addressable_shards[0].data.shape == (1, 8, 8, 3)


def test_data_parallel_train_step_runs_and_matches_single_device(rng):
    """DP grads over the mesh must equal single-device grads on the same
    global batch (psum correctness through jit+sharding)."""
    from vfi_tpu.losses import LossWeights
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.train.loop import make_train_step
    from vfi_tpu.train.state import create_train_state

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)
    weights = LossWeights(vgg=0.0, temporal=0.0)
    step_fn = make_train_step(model, None, 0, weights)

    f0 = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    ft = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    f1 = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)

    # single device
    state1 = create_train_state(params, 1e-3)
    state1, m1 = jax.jit(step_fn)(state1, None, jnp.asarray(f0),
                                  jnp.asarray(ft), jnp.asarray(f1))

    # 8-device data parallel
    mesh = make_mesh()
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    statep = jax.device_put(create_train_state(params, 1e-3), rep)
    dp_step = jax.jit(step_fn, in_shardings=(rep, rep, bsh, bsh, bsh),
                      out_shardings=(rep, rep))
    batch = shard_batch((f0, ft, f1), mesh)
    statep, mp = dp_step(statep, None, *batch)

    np.testing.assert_allclose(float(m1["loss"]), float(mp["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    lp = jax.tree.leaves(statep.params)
    for a, b in zip(l1, lp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_spatially_sharded_forward_matches_single_device(rng):
    """H-sharded inference (the 1080p/4K spatial mode): jit over a
    ('data','spatial') mesh must reproduce single-device outputs — XLA
    materializes the conv/shift halo exchanges from the sharding alone."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.models import EMAVFI
    from vfi_tpu.parallel import make_mesh, replicated, spatial_sharding

    model = EMAVFI(mid_channels=8, num_blocks=1, dcn_max_offset=2,
                   warp_max_flow=4)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, x0)

    f0 = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    single = jax.jit(model.apply)(params, f0, f1)

    mesh = make_mesh(data=2, spatial=4)
    rep = replicated(mesh)
    ssh = spatial_sharding(mesh)
    fwd = jax.jit(model.apply, in_shardings=(rep, ssh, ssh), out_shardings=ssh)
    sharded = fwd(jax.device_put(params, rep), jax.device_put(f0, ssh),
                  jax.device_put(f1, ssh))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-4, atol=2e-5)


def test_dp_batch_inference_multi_clip(rng):
    """BASELINE config 5 shape: multi-clip batch inference sharded over the
    'data' axis of the mesh through the public FrameInterpolator API."""
    import jax
    import jax.numpy as jnp

    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    mesh = make_mesh()  # 8 fake devices on 'data'
    interp = FrameInterpolator(params, bf16=False, mesh=mesh)

    f0 = rng.uniform(0, 1, (16, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (16, 16, 16, 3)).astype(np.float32)
    out = interp.midpoints(f0, f1)
    assert out.shape == (16, 16, 16, 3)
    # batch dim sharded over 'data'
    assert out.sharding.is_equivalent_to(batch_sharding(mesh), ndim=4)

    # non-divisible batch pads + slices back
    out5 = interp.midpoints(f0[:5], f1[:5])
    assert np.asarray(out5).shape == (5, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(out)[:5],
                               rtol=1e-5, atol=1e-6)
