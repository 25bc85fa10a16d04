"""Streaming event transformations — watermarked windows and dedup.

The reference has no streaming operators (SURVEY.md §2.9); these extend the
engine for the event-stream side of a data platform, using the standard
Structured Streaming constructs: event-time watermarks bound state, window
aggregation does the rollup, ``dropDuplicates`` within the watermark gives
at-least-once → effectively-once event handling.

Each transformation takes/returns a DataFrame, so the same code runs on a
batch DataFrame (tests compare against the batch oracle) and a streaming
one — Spark's unified API guarantees the semantics match for append-mode
queries once the watermark closes a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window rollup per event_type with late-data bound.

    On a stream: state for a window is dropped once the watermark passes
    window_end + delay; later events are discarded (counted by the
    numLateRows metric). On a batch frame the same plan is a plain window
    aggregation."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def deduped_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once-per-key event feed from an at-least-once input:
    dropDuplicates bounded by the event-time watermark (state for a key is
    held only within the delay)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
        return df.dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)
