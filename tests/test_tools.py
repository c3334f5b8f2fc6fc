"""Pure-function tests for the measurement tools (tools/)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def test_offset_stats_pair_counts():
    from tools.offset_stats import pair_stats

    R, th = 2, 8
    # all-zero offsets: bounds (0, 0) activate only sx=0 -> 9 pairs
    dx = np.zeros((16, 256, 9), np.float32)
    assert pair_stats(dx, R, th, 256) == 9.0
    assert pair_stats(dx, R, th, 128) == 9.0
    # full-range offsets: every sx in [-R, R] active -> 45 pairs
    dx = np.tile(np.linspace(-R, R, 256, dtype=np.float32)[None, :, None],
                 (16, 1, 9))
    assert pair_stats(dx, R, th, 256) == 45.0
    # spatially-split signs: full-W spans both, 128-col chunks see one side
    dx = np.zeros((8, 256, 9), np.float32)
    dx[:, :128] = 0.5   # sx in {0, 1}
    dx[:, 128:] = -0.5  # sx in {-1, 0}
    assert pair_stats(dx, R, 8, 256) == 27.0  # bounds (-0.5, 0.5) -> 3 each
    assert pair_stats(dx, R, 8, 128) == 18.0  # 2 each per chunk


def test_profile_forward_strip_and_rollup():
    from tools.profile_forward import _strip

    assert _strip("fusion.123") == "fusion"
    assert _strip("%custom-call.4") == "custom-call"
    assert _strip("a/b/convolution.7") == "convolution"
    assert _strip("copy-start") == "copy-start"


def test_bench_batch_sweep(monkeypatch, capsys):
    """bench.main() runs the FULL b2-b16 sweep on the winning config,
    reports the best-throughput batch, and a failed rung (OOM despite the
    chunking guard) is skipped instead of aborting the sweep."""
    import json

    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py"])

    calls = []

    def fake(kwargs, b=4, h=720, w=1280, iters=10):
        calls.append(b)
        if b == 16:
            raise RuntimeError("RESOURCE_EXHAUSTED")  # simulated chip OOM
        return {2: 8.0, 4: 10.0, 6: 12.0, 8: 15.0}[b]

    monkeypatch.setattr(bench, "_measure", fake)
    assert bench.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # two config measurements at the base batch (top-2 adjudication),
    # then the full sweep on the winner
    assert calls == [4, 4, 2, 6, 8, 16]
    assert out["value"] == 15.0
    assert "_b8_" in out["metric"]
    assert out["vs_baseline"] == round(15.0 / bench.CPU_BASELINE_FPS, 2)

    # flat sweep: best stays the base batch
    calls.clear()

    def flat(kwargs, b=4, h=720, w=1280, iters=10):
        calls.append(b)
        return {2: 9.0, 4: 10.0, 6: 9.8, 8: 10.1, 16: 9.5}[b]

    monkeypatch.setattr(bench, "_measure", flat)
    assert bench.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls == [4, 4, 2, 6, 8, 16]
    assert out["value"] == 10.1 and "_b8_" in out["metric"]


def test_make_soup_uniform_average(tmp_path):
    from tools.make_soup import average_npz

    a = {"params/w": np.full((2, 3), 1.0, np.float32),
         "params/b": np.array([0.0, 2.0], np.float32)}
    b = {"params/w": np.full((2, 3), 3.0, np.float32),
         "params/b": np.array([4.0, 0.0], np.float32)}
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez(pa, **a)
    np.savez(pb, **b)
    out = str(tmp_path / "soup.npz")
    average_npz([pa, pb], out)
    z = np.load(out)
    assert sorted(z.files) == ["params/b", "params/w"]
    np.testing.assert_allclose(z["params/w"], 2.0)
    np.testing.assert_allclose(z["params/b"], [2.0, 1.0])
    assert z["params/w"].dtype == np.float32

    # mismatched key sets must fail loudly
    np.savez(str(tmp_path / "c.npz"), **{"params/w": a["params/w"]})
    import pytest
    with pytest.raises(ValueError):
        average_npz([pa, str(tmp_path / "c.npz")], str(tmp_path / "d.npz"))
