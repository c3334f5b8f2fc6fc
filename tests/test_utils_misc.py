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
    assert dims == {"in_channels": 3, "mid_channels": 16, "num_blocks": 2}


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
