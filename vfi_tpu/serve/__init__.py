"""Online serving: shape-bucketed micro-batching + HTTP front end.

A north-star addition — the reference ships no serving path (its
inference.py is an offline batch script). See batcher.py for the TPU-first
design notes (static-shape buckets, pad-to-max launches, deadline-bounded
coalescing)."""

from vfi_tpu.serve.batcher import BatcherStats, MicroBatcher
from vfi_tpu.serve.server import (RAW_CONTENT_TYPE, SEQ_CONTENT_TYPE,
                                  InterpolationServer, encode_pair_body,
                                  encode_raw_body, encode_seq_body,
                                  split_pair_body, split_raw_body,
                                  split_seq_body)

__all__ = ["BatcherStats", "MicroBatcher", "InterpolationServer",
           "RAW_CONTENT_TYPE", "SEQ_CONTENT_TYPE", "encode_pair_body",
           "encode_raw_body", "encode_seq_body", "split_pair_body",
           "split_raw_body", "split_seq_body"]
