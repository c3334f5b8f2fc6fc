"""Inference pipeline tests: factor selection, midpoints, recursion, video IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfi_tpu.infer.pair import FrameInterpolator, pick_interpolation_factor


def test_factor_auto_targets_60fps():
    """Reference selection (inference.py:103-114): argmin |fps*(f+1) - 60|."""
    assert pick_interpolation_factor(30.0, None)[0] == 1    # 30*2=60 exact
    assert pick_interpolation_factor(15.0, None)[0] == 3    # 15*4=60
    # 24fps: 48 and 72 tie at |12|; strict < keeps the first (smaller) factor,
    # matching the reference loop (inference.py:106-110)
    assert pick_interpolation_factor(24.0, None)[0] == 1
    f, fps = pick_interpolation_factor(12.0, None)
    assert f == 4 and fps == 60.0


def test_factor_manual_clamped():
    assert pick_interpolation_factor(30.0, 120.0)[0] == 3
    assert pick_interpolation_factor(30.0, 300.0, max_factor=4)[0] == 4
    assert pick_interpolation_factor(30.0, 30.0)[0] == 1  # floor at 1


@pytest.fixture(scope="module")
def tiny_interp():
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    return FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False)


def test_midpoints_shape_and_range(tiny_interp, rng):
    f0 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    mid = np.asarray(tiny_interp.midpoints(f0, f1))
    assert mid.shape == (2, 16, 16, 3)
    assert mid.min() >= 0 and mid.max() <= 1


def test_recursive_counts(tiny_interp, rng):
    f0 = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    for factor in (1, 2, 3, 4):
        frames = tiny_interp.recursive(f0, f1, factor)
        assert len(frames) == factor
    # factor 3 = true bisection: the three frames must not be identical
    frames = [np.asarray(f) for f in tiny_interp.recursive(f0, f1, 3)]
    assert not np.allclose(frames[0], frames[1])


def test_reference_compat_duplicates_midpoint(rng):
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    interp = FrameInterpolator(params, mid_channels=8, num_blocks=1,
                               bf16=False, reference_compat=True)
    f0 = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    frames = [np.asarray(f) for f in interp.recursive(f0, f1, 3)]
    # reference quirk (inference.py:173-177): same midpoint 3 times
    np.testing.assert_array_equal(frames[0], frames[1])
    np.testing.assert_array_equal(frames[1], frames[2])


def test_video_roundtrip(tiny_interp, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from vfi_tpu.infer.video import interpolate_video

    src = str(tmp_path / "in.avi")
    dst = str(tmp_path / "out.avi")
    w, h, n = 64, 48, 6
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    for i in range(n):
        writer.write(np.roll(base, i * 2, axis=1))
    writer.release()

    stats = interpolate_video(src, dst, tiny_interp, target_fps=60.0,
                              scale=0.25, batch_pairs=2)
    assert stats["factor"] == 1
    # n frames in -> (n-1) pairs * 2 + trailing source = 2n - 1
    assert stats["frames_written"] == 2 * n - 1
    cap = cv2.VideoCapture(dst)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 2 * n - 1
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == int(w * 0.25)
    cap.release()


def test_eval_cli_end_to_end(tmp_path, rng):
    """Full eval harness over a synthetic scene dir with a tiny checkpoint
    (BASELINE config 2 shape)."""
    from PIL import Image

    from vfi_tpu.cli.eval import main as eval_main
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.utils.convert import save_params_npz

    scene = tmp_path / "data" / "sceneA"
    scene.mkdir(parents=True)
    for i in range(4):
        img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
        Image.fromarray(img).save(scene / f"f{i}.png")

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    ckpt = str(tmp_path / "m.npz")
    save_params_npz(jax.tree.map(np.asarray, params), ckpt)

    rc = eval_main(["--data-dir", str(tmp_path / "data"),
                    "--model_path", ckpt, "--fp32", "--json"])
    assert rc == 0


def test_infer_two_frame_cli(tmp_path, rng):
    """BASELINE config 1: two images in, midpoint PNG out, via the CLI."""
    from PIL import Image

    from vfi_tpu.cli.infer import main as infer_main
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.utils.convert import save_params_npz

    a = tmp_path / "a.png"
    b = tmp_path / "b.png"
    Image.fromarray(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)).save(a)
    Image.fromarray(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)).save(b)

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    ckpt = str(tmp_path / "m.npz")
    save_params_npz(jax.tree.map(np.asarray, params), ckpt)

    out = tmp_path / "mid.png"
    rc = infer_main(["two-frame", "--frame0", str(a), "--frame1", str(b),
                     "--output", str(out), "--model_path", ckpt, "--fp32"])
    assert rc == 0
    mid = np.asarray(Image.open(out))
    assert mid.shape == (16, 16, 3)


def test_video_reference_compat_ordering(tiny_interp, tmp_path, rng):
    """Compat mode: per pair write [midpoint x factor, pair's FIRST frame],
    plus the final source frame at stream end (reference
    inference.py:173-188,167)."""
    cv2 = pytest.importorskip("cv2")
    from vfi_tpu.infer.video import interpolate_video
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.infer.pair import FrameInterpolator

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    interp = FrameInterpolator(params, bf16=False, reference_compat=True)

    src = str(tmp_path / "in.avi")
    dst = str(tmp_path / "out.avi")
    w, h, n = 64, 48, 4
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 15.0, (w, h))
    base = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    for i in range(n):
        writer.write(np.roll(base, i, axis=1))
    writer.release()

    stats = interpolate_video(src, dst, interp, target_fps=60.0, scale=1.0,
                              batch_pairs=2, reference_compat=True)
    # factor = round(60/15 - 1) = 3; (n-1) pairs * (3 interp + 1 original)
    # + the trailing source frame (reference inference.py:167)
    assert stats["factor"] == 3
    assert stats["frames_written"] == (n - 1) * 4 + 1


def test_multi_clip_batch_inference(tmp_path, rng):
    """BASELINE config 5: N clips over one DP engine — pairs from different
    clips coalesce into shared device batches (vfi_tpu/infer/multi.py)."""
    cv2 = pytest.importorskip("cv2")
    from vfi_tpu.infer.multi import interpolate_videos
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.parallel import make_mesh

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    interp = FrameInterpolator(params, bf16=False, mesh=make_mesh(data=2))

    w, h = 64, 48
    frame_counts = (6, 4)  # different lengths: one clip drains first
    inputs, outputs = [], []
    for ci, n in enumerate(frame_counts):
        src = str(tmp_path / f"in{ci}.avi")
        writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"),
                                 30.0, (w, h))
        base = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        for i in range(n):
            writer.write(np.roll(base, i * 2 + ci, axis=1))
        writer.release()
        inputs.append(src)
        outputs.append(str(tmp_path / f"out{ci}.avi"))

    stats = interpolate_videos(inputs, outputs, interp, target_fps=60.0,
                               scale=1.0, batch_pairs=2, max_delay_ms=100.0)
    for st, n in zip(stats, frame_counts):
        assert st["factor"] == 1
        assert st["frames_written"] == 2 * n - 1
    total_pairs = sum(n - 1 for n in frame_counts)
    assert stats[0]["batcher"]["requests"] == total_pairs
    for dst, n in zip(outputs, frame_counts):
        cap = cv2.VideoCapture(dst)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 2 * n - 1
        cap.release()


def test_video_spatially_sharded(tmp_path, rng):
    """BASELINE config 5 shape: the video pipeline over a ('data','spatial')
    mesh — batch over data, H over spatial (GSPMD halo path)."""
    cv2 = pytest.importorskip("cv2")
    from vfi_tpu.infer.pair import FrameInterpolator
    from vfi_tpu.infer.video import interpolate_video
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.parallel import make_mesh

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    mesh = make_mesh(data=2, spatial=2)
    interp = FrameInterpolator(params, bf16=False, mesh=mesh, spatial=True)

    src = str(tmp_path / "in.avi")
    dst = str(tmp_path / "out.avi")
    w, h, n = 64, 48, 5
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    base = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
    for i in range(n):
        writer.write(np.roll(base, i * 2, axis=1))
    writer.release()

    stats = interpolate_video(src, dst, interp, target_fps=60.0, scale=1.0,
                              batch_pairs=2)
    assert stats["factor"] == 1
    assert stats["frames_written"] == 2 * n - 1
    cap = cv2.VideoCapture(dst)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 2 * n - 1
    cap.release()


def test_tta_equals_mean_of_transformed_forwards(rng):
    """tta=True must equal the mean over the 4 symmetry-transformed plain
    forwards (identity / hflip / vflip / temporal swap), each un-transformed
    back — computed here with the non-TTA engine as the oracle."""
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    plain = FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False)
    tta = FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False,
                            tta=True)
    f0 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    outs = [
        np.asarray(plain.midpoints(f0, f1)),
        np.asarray(plain.midpoints(f0[:, :, ::-1], f1[:, :, ::-1]))[:, :, ::-1],
        np.asarray(plain.midpoints(f0[:, ::-1], f1[:, ::-1]))[:, ::-1],
        np.asarray(plain.midpoints(f1, f0)),
    ]
    expected = np.mean(np.stack(outs), axis=0)
    got = np.asarray(tta.midpoints(f0, f1))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_tta_rejects_spatial():
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.parallel import make_mesh

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    with pytest.raises(ValueError, match="tta"):
        FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False,
                          tta=True, spatial=True,
                          mesh=make_mesh(data=-1, spatial=2))


def test_auto_scale_inference(rng):
    """auto_scale: threshold -inf forces the half-res path (must equal the
    manual downsample->midpoint->upsample oracle), +inf forces native
    (bit-identical to no auto_scale); invalid configs fail loudly."""
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.models.flownet import SimpleFlowNet
    from vfi_tpu.ops.resize import resize_bilinear

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fnet = SimpleFlowNet(mid_channels=8, levels=2)
    fparams = jax.jit(fnet.init)(jax.random.PRNGKey(1), x, x)
    kw = dict(mid_channels=8, num_blocks=1, bf16=False, flow_params=fparams,
              flow_mid_channels=8, flow_levels=2)

    plain = FrameInterpolator(params, **kw)
    always = FrameInterpolator(params, auto_scale=-1.0, **kw)
    never = FrameInterpolator(params, auto_scale=1e9, **kw)

    f0 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)

    native = np.asarray(plain.midpoints(f0, f1))
    np.testing.assert_array_equal(np.asarray(never.midpoints(f0, f1)), native)

    f0h = np.asarray(resize_bilinear(jnp.asarray(f0), (8, 8)))
    f1h = np.asarray(resize_bilinear(jnp.asarray(f1), (8, 8)))
    expected = np.asarray(resize_bilinear(plain.midpoints(f0h, f1h), (16, 16)))
    got = np.asarray(always.midpoints(f0, f1))
    np.testing.assert_allclose(got, expected, atol=1e-6)
    assert not np.allclose(got, native, atol=1e-3)  # the paths really differ

    with pytest.raises(ValueError, match="auto_scale"):
        FrameInterpolator(params, mid_channels=8, num_blocks=1, bf16=False,
                          auto_scale=5.0)  # no flow_params
    with pytest.raises(ValueError, match="auto_scale"):
        FrameInterpolator(params, auto_scale=5.0, io_uint8=True, **kw)


def test_auto_scale_composes_with_tta(rng):
    """auto_scale + tta (the maximal-quality eval config): the forced-on
    scaled path must equal resize(tta_midpoints(half inputs))."""
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.models.flownet import SimpleFlowNet
    from vfi_tpu.ops.resize import resize_bilinear

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    fnet = SimpleFlowNet(mid_channels=8, levels=2)
    fparams = jax.jit(fnet.init)(jax.random.PRNGKey(1), x, x)
    kw = dict(mid_channels=8, num_blocks=1, bf16=False, flow_params=fparams,
              flow_mid_channels=8, flow_levels=2, tta=True)

    tta = FrameInterpolator(params, **kw)
    auto = FrameInterpolator(params, auto_scale=-1.0, **kw)

    f0 = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    f0h = np.asarray(resize_bilinear(jnp.asarray(f0), (8, 8)))
    f1h = np.asarray(resize_bilinear(jnp.asarray(f1), (8, 8)))
    expected = np.asarray(resize_bilinear(tta.midpoints(f0h, f1h), (16, 16)))
    got = np.asarray(auto.midpoints(f0, f1))
    np.testing.assert_allclose(got, expected, atol=1e-6)
    assert auto.auto_scale_stats["scaled"] == 1
    assert len(auto.auto_scale_stats["probes"]) == 1


def test_max_px_per_launch_chunks_match_unchunked(rng):
    """The engine-level HBM guard: an over-budget batch splits into multiple
    launches whose concatenation is identical to the monolithic result."""
    from vfi_tpu.models import EMAVFI

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    kw = dict(mid_channels=8, num_blocks=1, bf16=False)
    whole = FrameInterpolator(params, max_px_per_launch=None, **kw)
    # 16x16 = 256 px/pair; budget 600 px -> cap 2 pairs -> 3 launches for b=5
    chunked = FrameInterpolator(params, max_px_per_launch=600, **kw)
    f0 = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    f1 = rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32)
    a = np.asarray(whole.midpoints(f0, f1))
    b = np.asarray(chunked.midpoints(f0, f1))
    assert a.shape == b.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_graph_aware_default_px_budget(rng):
    """The default launch budget adapts to the graph: flow-prior graphs
    hold more live HBM (hardware-bisected 1080p worker crash), TTA halves
    again; explicit budgets are respected."""
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.models.flownet import SimpleFlowNet

    model = EMAVFI(mid_channels=8, num_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    flow = SimpleFlowNet(mid_channels=8, levels=2)
    fparams = jax.jit(flow.init)(jax.random.PRNGKey(1), x, x)
    kw = dict(mid_channels=8, num_blocks=1, bf16=False)

    assert FrameInterpolator(params, **kw).max_px_per_launch == 8_000_000
    assert FrameInterpolator(params, flow_params=fparams,
                             flow_mid_channels=8, flow_levels=2,
                             **kw).max_px_per_launch == 4_000_000
    assert FrameInterpolator(params, tta=True,
                             **kw).max_px_per_launch == 4_000_000
    assert FrameInterpolator(params, flow_params=fparams,
                             flow_mid_channels=8, flow_levels=2, tta=True,
                             **kw).max_px_per_launch == 2_000_000
    assert FrameInterpolator(params, max_px_per_launch=123_456,
                             **kw).max_px_per_launch == 123_456
