"""Utility coverage: StepTimer, metrics sanity, infer_model_dims."""

import numpy as np

import jax
import jax.numpy as jnp

from vfi_tpu.utils.metrics import psnr, ssim
from vfi_tpu.utils.profiling import StepTimer


def test_step_timer_sections():
    t = StepTimer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        sum(range(1000))
    with t.section("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "b:" in rep
    assert t.mean("a") >= 0.0


def test_psnr_known_value(rng):
    x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(x), jnp.asarray(x))[0]) > 100  # identical
    y = np.clip(x + 0.1, 0, 1)
    mse = np.mean((x - y) ** 2)
    expected = 10 * np.log10(1.0 / mse)
    np.testing.assert_allclose(float(psnr(jnp.asarray(y), jnp.asarray(x))[0]),
                               expected, rtol=1e-4)


def test_ssim_bounds(rng):
    x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    s_same = float(ssim(jnp.asarray(x), jnp.asarray(x))[0])
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    noise = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    s_noise = float(ssim(jnp.asarray(noise), jnp.asarray(x))[0])
    assert s_noise < s_same


def test_infer_model_dims(rng):
    from vfi_tpu.models import EMAVFI
    from vfi_tpu.utils.convert import infer_model_dims

    model = EMAVFI(mid_channels=16, num_blocks=2)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, x)
    dims = infer_model_dims(params)
    assert dims == {"in_channels": 3, "mid_channels": 16,
                    "num_blocks": 2, "fuse_project": False}


def test_flo_io_roundtrip(tmp_path, rng):
    from vfi_tpu.utils.flo import endpoint_error, flow_valid_mask, read_flo, write_flo

    flow = rng.normal(0, 3, (12, 17, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(back, flow)
    assert flow_valid_mask(back).all()
    assert endpoint_error(back, flow) == 0.0


def test_flo_reads_bundled_middlebury_gt():
    import os

    p = "/root/reference/data/processed/other-gt-flow/RubberWhale/flow10.flo"
    if not os.path.exists(p):
        import pytest
        pytest.skip("reference GT flow not mounted")
    from vfi_tpu.utils.flo import flow_valid_mask, read_flo

    flow = read_flo(p)
    assert flow.shape == (388, 584, 2)  # native Middlebury size (SURVEY §2)
    mask = flow_valid_mask(flow)
    assert 0.5 < mask.mean() <= 1.0
    # valid magnitudes are small (RubberWhale is a slow scene)
    assert np.abs(flow[mask]).max() < 10.0


def test_ssim_bf16_inputs_stay_in_range(rng):
    """Regression: bf16 inputs must not blow SSIM out of [-1, 1] (the
    E[x^2]-mu^2 cancellation explodes in low precision)."""
    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    s = float(ssim(jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16))[0])
    assert -1.0 <= s <= 1.0


def _np_ssim_oracle(pred, target, max_val=1.0, size=11, sigma=1.5):
    """Independent float64 SSIM (Wang et al. 2004): Gaussian 11x11 window,
    VALID padding, mean over windows and channels. scipy-free."""
    from numpy.lib.stride_tricks import sliding_window_view

    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x * x) / (2 * sigma * sigma))
    g /= g.sum()
    w = np.outer(g, g)  # (11, 11)
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2

    def filt(img):  # (H, W) -> (H-10, W-10) Gaussian-weighted window sums
        win = sliding_window_view(img, (size, size))
        return np.einsum("hwij,ij->hw", win, w)

    vals = []
    for b in range(pred.shape[0]):
        for c in range(pred.shape[-1]):
            p = pred[b, :, :, c].astype(np.float64)
            t = target[b, :, :, c].astype(np.float64)
            mp, mt = filt(p), filt(t)
            spp = filt(p * p) - mp * mp
            stt = filt(t * t) - mt * mt
            spt = filt(p * t) - mp * mt
            s = ((2 * mp * mt + c1) * (2 * spt + c2) /
                 ((mp * mp + mt * mt + c1) * (spp + stt + c2)))
            vals.append(s.mean())
    return np.mean(np.asarray(vals).reshape(pred.shape[0], -1), axis=1)


def test_ssim_matches_numpy_oracle(rng):
    pred = rng.uniform(0, 1, (2, 24, 20, 3)).astype(np.float32)
    # target = correlated noisy copy so SSIM lands strictly inside (0, 1)
    target = np.clip(pred + rng.normal(0, 0.08, pred.shape), 0, 1).astype(np.float32)
    ours = np.asarray(ssim(jnp.asarray(pred), jnp.asarray(target)))
    ref = _np_ssim_oracle(pred, target)
    assert ours.shape == (2,)
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    assert 0.3 < ref.mean() < 0.999


def test_psnr_matches_numpy_oracle(rng):
    pred = rng.uniform(0, 1, (3, 16, 16, 1)).astype(np.float32)
    target = rng.uniform(0, 1, pred.shape).astype(np.float32)
    ours = np.asarray(psnr(jnp.asarray(pred), jnp.asarray(target)))
    mse = ((pred.astype(np.float64) - target) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(ours, 10 * np.log10(1.0 / mse), rtol=1e-5)


def _write_scene(tmp_path, scene, gh, gw, fh, fw, flow_const=(1.5, -0.75)):
    """Lay out <tmp>/gt/<scene>/flow10.flo + <tmp>/frames/<scene>/frame1{0,1}.png."""
    from PIL import Image

    from vfi_tpu.utils.flo import write_flo

    gt_dir = tmp_path / "gt" / scene
    fr_dir = tmp_path / "frames" / scene
    gt_dir.mkdir(parents=True)
    fr_dir.mkdir(parents=True)
    flow = np.zeros((gh, gw, 2), np.float32)
    flow[..., 0], flow[..., 1] = flow_const
    flow[0, 0] = 1e10  # one unknown-flow pixel (sentinel), must be masked
    write_flo(str(gt_dir / "flow10.flo"), flow)
    r = np.random.default_rng(0)
    for name in ("frame10", "frame11"):
        img = r.integers(0, 255, (fh, fw, 3), np.uint8)
        Image.fromarray(img).save(fr_dir / (name + ".png"))
    return flow


def test_evaluate_flow_exact_match_same_resolution(tmp_path):
    from vfi_tpu.cli.eval import evaluate_flow

    _write_scene(tmp_path, "A", 24, 32, 24, 32)

    def flow_fn(f0, f1):
        out = np.zeros((1,) + f0.shape[1:3] + (2,), np.float32)
        out[..., 0], out[..., 1] = 1.5, -0.75
        return out

    rep = evaluate_flow(flow_fn, str(tmp_path / "frames"), str(tmp_path / "gt"))
    assert set(rep["scenes"]) == {"A"}
    assert rep["mean_epe"] < 1e-5


def test_evaluate_flow_rescales_to_gt_grid(tmp_path):
    """Frames at 2x the GT resolution: a constant flow of 2*(u, v) predicted
    at frame resolution must come back as (u, v) on the GT grid."""
    from vfi_tpu.cli.eval import evaluate_flow

    _write_scene(tmp_path, "B", 16, 24, 32, 48)

    def flow_fn(f0, f1):
        out = np.zeros((1,) + f0.shape[1:3] + (2,), np.float32)
        out[..., 0], out[..., 1] = 3.0, -1.5   # 2x the GT constant
        return out

    rep = evaluate_flow(flow_fn, str(tmp_path / "frames"), str(tmp_path / "gt"))
    assert rep["mean_epe"] < 1e-4


def test_evaluate_flow_raises_when_nothing_matches(tmp_path):
    # An empty sweep must not report a perfect 0.0 EPE (a wrong path would
    # otherwise read as a great score) — it raises instead.
    import pytest

    from vfi_tpu.cli.eval import evaluate_flow
    from vfi_tpu.utils.flo import write_flo

    d = tmp_path / "gt" / "NoFrames"
    d.mkdir(parents=True)
    write_flo(str(d / "flow10.flo"), np.zeros((8, 8, 2), np.float32))
    (tmp_path / "frames").mkdir()
    with pytest.raises(FileNotFoundError):
        evaluate_flow(lambda a, b: None, str(tmp_path / "frames"),
                      str(tmp_path / "gt"))
