"""Structured Streaming variants of the batch event-time queries
(SURVEY §2.9 T4/T6).

The reference's serving loop is already streaming *in spirit* —
ingest one message, transform, append to a sink
(`/root/reference/src/app.py:68-87`); it just has no engine for it.
Here the same logical plans as the batch T-series run through
``readStream`` with watermarks and an append parquet sink.
"""

from bigdata_lab4_spark.streaming.stateful import sessionize_stream
from bigdata_lab4_spark.streaming.windows import (
    dedup_events_stream,
    read_events_stream,
    run_available_now,
    tumbling_event_counts,
)

__all__ = [
    "dedup_events_stream",
    "sessionize_stream",
    "read_events_stream",
    "tumbling_event_counts",
    "run_available_now",
]
