"""Online serving: shape-bucketed micro-batching + HTTP front end.

A north-star addition — the reference ships no serving path (its
inference.py is an offline batch script). See batcher.py for the TPU-first
design notes (static-shape buckets, pad-to-max launches, deadline-bounded
coalescing)."""

from vfi_tpu.serve.batcher import BatcherStats, MicroBatcher
from vfi_tpu.serve.server import (InterpolationServer, encode_pair_body,
                                  split_pair_body)

__all__ = ["BatcherStats", "MicroBatcher", "InterpolationServer",
           "encode_pair_body", "split_pair_body"]
