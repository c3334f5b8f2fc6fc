"""Multi-clip batch inference (BASELINE config 5).

Upconverts N videos concurrently through ONE device engine: each clip runs
the standard `interpolate_video` pipeline on its own thread, but instead of
launching its pairs alone, every pair goes through a shared MicroBatcher
(vfi_tpu/serve/batcher.py) — pairs from different clips coalesce into full
device batches (padded to one static shape), so the data-parallel mesh
stays fed even when any single clip's decode trickles. The reference has no
multi-video mode at all (its inference.py:61 processes one file,
one model call per frame).

Clips of different resolutions are handled by the batcher's (H, W)
bucketing; clips of the same resolution share executables and batches.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import numpy as np

from vfi_tpu.infer.pair import FrameInterpolator
from vfi_tpu.infer.video import interpolate_video
from vfi_tpu.serve.batcher import MicroBatcher


class SharedEngine:
    """Per-clip facade over a shared MicroBatcher.

    Duck-types the two methods `interpolate_video` drives
    (`midpoints` / `recursive`): midpoints submits each pair individually
    and blocks on the futures — coalescing across clips happens inside the
    batcher. `recursive` is literally FrameInterpolator's implementation
    (it only touches self.midpoints / self.reference_compat)."""

    def __init__(self, batcher: MicroBatcher, reference_compat: bool = False,
                 timeout: float = 600.0):
        self._batcher = batcher
        self.reference_compat = reference_compat
        self._timeout = timeout

    def midpoints(self, f0: np.ndarray, f1: np.ndarray) -> np.ndarray:
        futs = [self._batcher.submit(f0[i], f1[i]) for i in range(f0.shape[0])]
        return np.stack([f.result(timeout=self._timeout) for f in futs])

    recursive = FrameInterpolator.recursive


def interpolate_videos(
    inputs: Sequence[str],
    outputs: Sequence[str],
    interpolator: FrameInterpolator,
    target_fps: Optional[float] = None,
    max_interpolation_factor: int = 4,
    frame_interval: int = 1,
    codec: str = "mp4v",
    scale: float = 0.5,
    batch_pairs: int = 8,
    reference_compat: bool = False,
    max_delay_ms: float = 50.0,
) -> list[dict]:
    """Upconvert many videos concurrently over one shared device engine.

    Args mirror `interpolate_video`; `batch_pairs` becomes the shared
    device batch size (launches are padded to it). Returns one stats dict
    per clip, plus the shared batcher stats under each dict's
    'batcher' key. Exceptions in any clip propagate after all clips stop.
    """
    if len(inputs) != len(outputs):
        raise ValueError(f"{len(inputs)} inputs vs {len(outputs)} outputs")
    batcher = MicroBatcher(interpolator, max_batch=batch_pairs,
                           max_delay_ms=max_delay_ms)
    results: list = [None] * len(inputs)
    errors: list = [None] * len(inputs)

    def worker(i: int):
        try:
            # batch_pairs=1: the per-clip pipeline submits pairs as they
            # decode; the SHARED batcher owns the actual device batching.
            results[i] = interpolate_video(
                inputs[i], outputs[i],
                SharedEngine(batcher, reference_compat=reference_compat),
                target_fps=target_fps,
                max_interpolation_factor=max_interpolation_factor,
                frame_interval=frame_interval, codec=codec, scale=scale,
                batch_pairs=1, reference_compat=reference_compat)
        except Exception as e:  # noqa: BLE001 - re-raised below
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i,), daemon=True,
                                name=f"vfi-clip-{i}")
               for i in range(len(inputs))]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        batcher.close()
    for i, e in enumerate(errors):
        if e is not None:
            raise RuntimeError(f"clip {inputs[i]} failed") from e
    stats = batcher.stats.snapshot()
    for r in results:
        r["batcher"] = stats
    return results
