"""Frame-triplet dataset over scene directories.

Mirrors the reference's `VideoDataset` scan/index logic
(reference: src/utils/data_utils.py:8-41): each subdirectory of `data_dir`
is a scene; frames are name-sorted .png/.jpg/.jpeg; samples are overlapping
(i, i+interval, i+2*interval) triplets.

Unlike the reference (PIL decode inside `__getitem__` on the training
process, num_workers=0 — data_utils.py:46-48, train.py:61), decode and
augmentation here are plain functions over numpy so the `DataLoader` can
run them on worker threads while the TPU computes.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from vfi_tpu.data.augment import AugmentConfig, augment_triplet

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

_EXTS = (".png", ".jpg", ".jpeg")


def load_image(path: str) -> np.ndarray:
    """Decode to (H, W, 3) float32 RGB in [0, 1].

    PNGs go through the native C++ decoder (vfi_tpu.native) when available;
    anything it can't handle (or other formats) falls back to PIL."""
    if path.lower().endswith(".png"):
        from vfi_tpu import native

        with open(path, "rb") as f:
            data = f.read()
        img = native.decode_png_rgb(data)
        if img is not None:
            return img.astype(np.float32) / 255.0
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


@dataclass
class TripletDataset:
    """Index of (frame0, frame_t, frame1) triplet paths + per-item pipeline.

    Args:
      data_dir: directory of scene subdirectories.
      frame_interval: triplet stride (reference default 1).
      augment: AugmentConfig, or None for no augmentation (eval).
      normalize: apply ImageNet normalization after augmentation — the
        reference's training convention (train.py:40-43). The model output
        stays [0, 1] (the reference's normalization mismatch, preserved for
        checkpoint parity).
      cache_decoded_mb: budget for an in-RAM cache of decoded images
        (0 disables). Middlebury is tiny (train+val ~160 MB decoded) but
        this host has ONE CPU core, so re-decoding 3 PNGs per sample per
        epoch puts the decoder on the critical path of every training
        step; caching removes it after epoch 0. Cached arrays are marked
        read-only — the augment/normalize pipeline is purely functional.
    """

    data_dir: str
    frame_interval: int = 1
    augment: Optional[AugmentConfig] = None
    normalize: bool = True
    cache_decoded_mb: float = 512.0

    def __post_init__(self):
        self._cache: dict[str, np.ndarray] = {}
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()
        self.triplets: list[Tuple[str, str, str]] = []
        for scene in sorted(os.listdir(self.data_dir)):
            scene_path = os.path.join(self.data_dir, scene)
            if not os.path.isdir(scene_path):
                continue
            frames = sorted(
                os.path.join(scene_path, f)
                for f in os.listdir(scene_path)
                if f.lower().endswith(_EXTS)
            )
            fi = self.frame_interval
            for i in range(len(frames) - 2 * fi):
                self.triplets.append((frames[i], frames[i + fi], frames[i + 2 * fi]))

    def __len__(self) -> int:
        return len(self.triplets)

    def _load(self, path: str) -> np.ndarray:
        img = self._cache.get(path)
        if img is not None:
            return img
        img = load_image(path)
        limit = int(self.cache_decoded_mb * 1e6)
        if limit > 0 and img.nbytes <= limit:
            img.setflags(write=False)
            with self._cache_lock:
                while self._cache_bytes + img.nbytes > limit and self._cache:
                    # evict the OLDEST insertion (FIFO): plain popitem() is
                    # LIFO, which pinned the first-loaded images forever and
                    # evicted each new entry on the next insert
                    oldest = next(iter(self._cache))
                    self._cache_bytes -= self._cache.pop(oldest).nbytes
                if path not in self._cache:
                    self._cache[path] = img
                    self._cache_bytes += img.nbytes
        return img

    def get(self, idx: int, rng: np.random.Generator) -> Sequence[np.ndarray]:
        """Load + augment + normalize one triplet -> three (h, w, 3) f32."""
        paths = self.triplets[idx]
        frames = [self._load(p) for p in paths]
        if self.augment is not None:
            frames = augment_triplet(frames, rng, self.augment)
        if self.normalize:
            frames = [(f - IMAGENET_MEAN) / IMAGENET_STD for f in frames]
        return frames
