"""Structured Streaming support (SURVEY.md §7 M7).

The reference has zero streaming (SURVEY.md §2.4: ``WindowInto`` is a
silent NoOp and element timestamps are stripped). Here streams are
first-class: event-time windows, watermarks, sessionization, and
stateful per-key processing via ``transformWithStateInPandas``-style
APIs, all through ``readStream``/``writeStream``.
"""

from beam_pyspark_runner_spark.streaming.runner import (
    read_parquet_stream,
    run_stream_to_df,
)

__all__ = ["read_parquet_stream", "run_stream_to_df"]
