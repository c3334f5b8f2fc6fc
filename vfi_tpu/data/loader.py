"""Threaded, prefetching batch loader.

The reference trains with `DataLoader(num_workers=0)` — every PNG decode and
augmentation runs serially on the training process, on the critical path of
every step (reference: train.py:61-62, SURVEY §3.4). Here item loading runs
on a thread pool (PIL decode and numpy augmentation release the GIL for the
heavy parts) and finished batches are prefetched a configurable number of
steps ahead, so host data work overlaps device compute.

Determinism: each item draws from `np.random.Generator(Philox(seed, epoch,
index))`, so results are independent of thread scheduling and resumable
mid-epoch.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from vfi_tpu.data.dataset import TripletDataset


class DataLoader:
    """Iterable over epochs of batched triplets.

    Yields (frame0, frame_t, frame1) each (B, H, W, 3) float32. The last
    incomplete batch is dropped when `drop_last` (static shapes keep jit
    cache warm; the reference's torch loader pads instead).
    """

    def __init__(
        self,
        dataset: TripletDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _item_rng(self, index: int) -> np.random.Generator:
        # Philox keys are two 64-bit words: (seed, epoch<<32 | index).
        return np.random.Generator(np.random.Philox(
            key=[self.seed, (self.epoch << 32) + index]))

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.Generator(np.random.Philox(
                key=[self.seed, (self.epoch << 32) + 0xFFFFFFFF])).shuffle(order)
        return order

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        nb = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def load_item(args):
            pos, idx = args
            return self.dataset.get(int(idx), self._item_rng(pos))

        def producer():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        sel = order[b * self.batch_size:(b + 1) * self.batch_size]
                        items = list(pool.map(load_item, [
                            (b * self.batch_size + k, idx) for k, idx in enumerate(sel)
                        ]))
                        batch = tuple(
                            np.stack([it[j] for it in items]) for j in range(3)
                        )
                        out_q.put(batch)
                out_q.put(None)
            except BaseException as e:  # surface loader errors to the consumer
                out_q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            self.epoch += 1
