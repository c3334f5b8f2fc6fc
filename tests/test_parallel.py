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


def _perturbed_bounded_model_and_params(rng, h, w, use_pallas=False,
                                        dcn_max_offset=1, warp_max_flow=2,
                                        mid_channels=64, num_blocks=3):
    """Bounded-sampling EMAVFI + params with nonzero offsets/flow: the
    zero-initialized offset convs are bias-jittered so the DCN sampling and
    warp actually displace rows (exercising the halo, not just the convs)."""
    import jax.numpy as jnp

    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=mid_channels, num_blocks=num_blocks,
                   dcn_max_offset=dcn_max_offset, warp_max_flow=warp_max_flow,
                   use_pallas=use_pallas)
    f = jnp.zeros((1, 32, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), f, f)

    def jitter(path, x):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "offset_conv" in name and name.endswith("bias"):
            k = jax.random.fold_in(jax.random.PRNGKey(7), len(name))
            return jax.random.uniform(k, x.shape, x.dtype, -1.5, 1.5)
        return x
    params = jax.tree_util.tree_map_with_path(jitter, params)
    return model, params


def test_spatial_shard_map_matches_single_device(rng):
    """Manual halo-exchange spatial sharding (parallel/spatial.py): the
    shard_map'd forward over a ('data','spatial') mesh must reproduce the
    single-device forward exactly (XLA shifts path)."""
    import jax.numpy as jnp

    from vfi_tpu.parallel import make_mesh
    from vfi_tpu.parallel.spatial import required_halo, spatial_interpolate

    model, params = _perturbed_bounded_model_and_params(rng, 128, 48)
    assert required_halo(3, 1, 2) == 24

    f0 = jnp.asarray(rng.uniform(0, 1, (2, 128, 48, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 128, 48, 3)).astype(np.float32))
    ref = jax.jit(model.apply)(params, f0, f1)
    mesh = make_mesh(data=2, spatial=4)
    out = spatial_interpolate(model, params, f0, f1, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_spatial_shard_map_pallas_kernels(rng):
    """The same spatial path with the Pallas production kernels running
    shard-locally (interpret mode on CPU)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.parallel import make_mesh
    from vfi_tpu.parallel.spatial import spatial_interpolate

    model, params = _perturbed_bounded_model_and_params(rng, 128, 48,
                                                        use_pallas=True)
    f0 = jnp.asarray(rng.uniform(0, 1, (1, 128, 48, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (1, 128, 48, 3)).astype(np.float32))
    mesh = make_mesh(data=1, spatial=4)  # h_local=32 >= halo 24
    with pltpu.force_tpu_interpret_mode():
        ref = jax.jit(model.apply)(params, f0, f1)
        out = spatial_interpolate(model, params, f0, f1, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_spatial_shard_map_rejects_unbounded_model(rng):
    import pytest

    from vfi_tpu.parallel.spatial import required_halo

    with pytest.raises(ValueError, match="bounded"):
        required_halo(3, None, None)


def test_spatial_shard_map_rejects_misaligned_height(rng):
    import jax.numpy as jnp
    import pytest

    from vfi_tpu.parallel import make_mesh
    from vfi_tpu.parallel.spatial import spatial_interpolate

    model, params = _perturbed_bounded_model_and_params(rng, 128, 48)
    f = jnp.zeros((2, 120, 48, 3), jnp.float32)  # 120 % 16 != 0
    with pytest.raises(ValueError, match="divide"):
        spatial_interpolate(model, params, f, f, make_mesh(data=2, spatial=4))


def test_frame_interpolator_spatial_pallas_route(rng):
    """FrameInterpolator(spatial=True, use_pallas=True) must route through
    the manual halo-exchange shard_map and match the single-device engine."""
    from jax.experimental.pallas import tpu as pltpu

    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.parallel import make_mesh

    model, params = _perturbed_bounded_model_and_params(
        rng, 128, 48, mid_channels=16, num_blocks=2)
    f0 = rng.uniform(0, 1, (2, 128, 48, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (2, 128, 48, 3)).astype(np.float32)

    single = FrameInterpolator(params, bf16=False, mesh=make_mesh(data=1),
                               dcn_max_offset=1, warp_max_flow=2)
    ref = np.asarray(single.midpoints(f0, f1))

    # 2x2, not 2x4: Pallas interpret mode's internal barrier deadlocks with
    # 8 concurrently-interpreted shard programs on CPU (4 are fine).
    mesh = make_mesh(data=2, spatial=2)
    sp = FrameInterpolator(params, bf16=False, mesh=mesh, spatial=True,
                           dcn_max_offset=1, warp_max_flow=2, use_pallas=True)
    assert sp._spatial_manual
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sp.midpoints(f0, f1))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_frame_interpolator_spatial_pads_misaligned_height(rng):
    """Heights not divisible by 4*spatial (e.g. 1080 at spatial=4) are
    edge-padded and cropped; rows away from the padded boundary match the
    aligned computation."""
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.parallel import make_mesh

    model, params = _perturbed_bounded_model_and_params(
        rng, 128, 48, mid_channels=16, num_blocks=2)
    mesh = make_mesh(data=2, spatial=2)  # 2x2: see deadlock note above
    sp = FrameInterpolator(params, bf16=False, mesh=mesh, spatial=True,
                           dcn_max_offset=1, warp_max_flow=2, use_pallas=True)
    f0 = rng.uniform(0, 1, (2, 116, 48, 3)).astype(np.float32)  # 116 % 8 != 0
    f1 = rng.uniform(0, 1, (2, 116, 48, 3)).astype(np.float32)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(sp.midpoints(f0, f1))
        assert out.shape == (2, 116, 48, 3)
        # aligned run on the padded frames: shared prefix rows must agree
        # (same 120-row jitted fn — cached from the padded first call)
        fp0 = np.concatenate([f0, np.repeat(f0[:, -1:], 4, axis=1)], axis=1)
        fp1 = np.concatenate([f1, np.repeat(f1[:, -1:], 4, axis=1)], axis=1)
        ref = np.asarray(sp.midpoints(fp0, fp1))[:, :116]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_cascade_spatial_shard_map_matches_single_device(rng):
    """cascade_levels=2 under manual spatial sharding (the round-2 gap,
    models/ema_vfi.py cascade loop): the coarse motion pass + unbounded
    pre-warp run globally via all_gather, so the sharded forward must
    reproduce the single-device cascade forward."""
    import dataclasses

    import jax.numpy as jnp

    from vfi_tpu.parallel import make_mesh
    from vfi_tpu.parallel.spatial import spatial_interpolate

    base, params = _perturbed_bounded_model_and_params(rng, 128, 48)
    model = dataclasses.replace(base, cascade_levels=2)
    f0 = jnp.asarray(rng.uniform(0, 1, (2, 128, 48, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.uniform(0, 1, (2, 128, 48, 3)).astype(np.float32))
    ref = jax.jit(model.apply)(params, f0, f1)
    mesh = make_mesh(data=2, spatial=4)
    out = spatial_interpolate(model, params, f0, f1, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
