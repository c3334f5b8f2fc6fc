"""Native C++ loader core: PNG decode + fused preprocess vs PIL/numpy."""

import io

import numpy as np
import pytest
from PIL import Image

from vfi_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable")


def _png_bytes(img: np.ndarray, mode="RGB") -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img, mode).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.parametrize("shape,mode", [((37, 53, 3), "RGB"), ((24, 31), "L")])
def test_decode_matches_pil(lib_ok, rng, shape, mode):
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    data = _png_bytes(arr, mode)
    ours = native.decode_png_rgb(data)
    assert ours is not None
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, pil)


def test_decode_rgba(lib_ok, rng):
    arr = rng.integers(0, 256, (16, 20, 4), dtype=np.uint8)
    data = _png_bytes(arr, "RGBA")
    ours = native.decode_png_rgb(data)
    assert ours is not None
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # PIL RGBA->RGB drops alpha (no blending) same as ours
    np.testing.assert_array_equal(ours, pil)


def test_decode_real_middlebury(lib_ok):
    import os

    p = "/root/reference/data/processed/train/RubberWhale/frame10.png"
    if not os.path.exists(p):
        pytest.skip("reference data not mounted")
    with open(p, "rb") as f:
        data = f.read()
    ours = native.decode_png_rgb(data)
    assert ours is not None
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, pil)


def test_crop_flip_normalize(lib_ok, rng):
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    out = native.crop_flip_normalize(img, top=3, left=5, crop=(16, 20),
                                     hflip=True, imagenet_norm=True)
    assert out is not None
    ref = img[3:19, 5:25].astype(np.float32) / 255.0
    ref = ref[:, ::-1]
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    ref = (ref - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_load_image_uses_native_and_matches_pil(lib_ok, tmp_path, rng):
    from vfi_tpu.data.dataset import load_image

    arr = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = load_image(p)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0)
