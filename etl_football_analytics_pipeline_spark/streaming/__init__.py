"""Structured Streaming surface of the engine.

The reference has no streams (SURVEY.md §2.10) — its closest analog is
checkpoint-gated incremental batch with keyed MERGE
(`scr/Extract.py:222-248,262-303`). This package exposes the same
tables over `readStream` and implements the driver-mandated streaming
operators: watermarked tumbling/sliding windows, session windows,
within-watermark deduplication, and a `foreachBatch` MERGE sink that
reproduces the reference's exactly-once-by-key upsert semantics.
"""

from .join import stream_stream_join
from .windowed import (
    dedup_within_watermark,
    merge_sink,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = [
    "dedup_within_watermark",
    "merge_sink",
    "session_agg",
    "sliding_agg",
    "stream_events",
    "stream_stream_join",
    "tumbling_agg",
]
