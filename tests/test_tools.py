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
