"""Data-acquisition scripts (reference: scripts/download_dataset.py:1-37,
scripts/preprocess_data.py:1-23)."""

import importlib.util
import os
import sys

import numpy as np
from PIL import Image

_SCRIPTS = os.path.join(os.path.dirname(__file__), os.pardir, "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_preprocess_resizes_in_place(tmp_path):
    pre = _load("preprocess_data")
    scene = tmp_path / "scene1"
    scene.mkdir()
    rng = np.random.default_rng(0)
    for name, size in [("a.png", (32, 24)), ("b.png", (16, 12))]:
        Image.fromarray(rng.integers(0, 255, (size[1], size[0], 3),
                                     dtype=np.uint8)).save(scene / name)
    (scene / "notes.txt").write_text("ignored")
    n = pre.resize_images(str(tmp_path), size=(16, 12))
    assert n == 1  # b.png already at target size
    for name in ("a.png", "b.png"):
        with Image.open(scene / name) as im:
            assert im.size == (16, 12)


def test_preprocess_cli(tmp_path, capsys):
    pre = _load("preprocess_data")
    scene = tmp_path / "s"
    scene.mkdir()
    Image.fromarray(np.zeros((24, 32, 3), np.uint8)).save(scene / "f.png")
    assert pre.main(["--root", str(tmp_path), "--width", "8",
                     "--height", "6"]) == 0
    assert "resized 1" in capsys.readouterr().out
    with Image.open(scene / "f.png") as im:
        assert im.size == (8, 6)


def test_download_zip_roundtrip(tmp_path, monkeypatch):
    """download_and_extract_zip with a faked HTTP layer (no egress here)."""
    import io
    import zipfile

    dl = _load("download_dataset")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("scene/frame07.png", b"png-bytes")
    payload = buf.getvalue()

    class FakeResponse:
        content = payload

        def raise_for_status(self):
            pass

    class FakeRequests:
        @staticmethod
        def get(url, timeout):
            return FakeResponse()

    monkeypatch.setitem(sys.modules, "requests", FakeRequests)
    assert dl.download_and_extract_zip("http://x/y.zip", str(tmp_path))
    assert (tmp_path / "scene" / "frame07.png").read_bytes() == b"png-bytes"


def test_download_falls_back_to_bundled(tmp_path, monkeypatch):
    dl = _load("download_dataset")
    bundled = tmp_path / "bundled"
    (bundled / "scene").mkdir(parents=True)
    (bundled / "scene" / "frame07.png").write_bytes(b"x")
    monkeypatch.setattr(dl, "BUNDLED", str(bundled))
    monkeypatch.setattr(dl, "download_and_extract_zip", lambda u, d: False)
    dest = tmp_path / "out"
    assert dl.main(["--dest", str(dest)]) == 0
    assert (dest / "scene" / "frame07.png").exists()


def test_download_no_source_fails(tmp_path, monkeypatch):
    dl = _load("download_dataset")
    monkeypatch.setattr(dl, "BUNDLED", str(tmp_path / "missing"))
    monkeypatch.setattr(dl, "download_and_extract_zip", lambda u, d: False)
    assert dl.main(["--dest", str(tmp_path / "out")]) == 1
