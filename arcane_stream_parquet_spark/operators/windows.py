"""Event-time window operators (SURVEY.md §2.9 ST4 — [abs] in the
reference, whose batching is processing-time only; exposed here as
first-class ops for both batch and Structured Streaming use).

All three window families are the SAME DataFrame expressions in batch
and streaming; streaming adds ``withWatermark`` for state eviction
(tests/test_streaming_windows.py drives that path). Batch versions are
oracle-checked (plans/streaming_queries.py).

Scale: a window aggregate is one hash shuffle on (key, window) with
map-side partial aggregation; session windows shuffle on the key and
merge sessions inside the state store (streaming) or via the
aggregation (batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    group_cols: tuple[str, ...] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Fixed, non-overlapping event-time buckets: count (+ optional
    sum) per (window, *group_cols). ``ts_col`` must be TimestampType."""
    aggs = [F.count("*").alias("n_events")]
    if value_col:
        aggs.append(
            F.round(F.sum(F.col(value_col).cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("sum_value")
        )
    return (
        df.groupBy(F.window(ts_col, window_duration).alias("w"), *group_cols)
        .agg(*aggs)
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *group_cols,
            "n_events",
            *(("sum_value",) if value_col else ()),
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping windows: each event lands in window_duration /
    slide_duration buckets (Spark expands internally — no self-union)."""
    return (
        df.groupBy(
            F.window(ts_col, window_duration, slide_duration).alias("w"),
            *group_cols,
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *group_cols,
            "n_events",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str,
    gap_duration: str,
    key_cols: tuple[str, ...],
) -> DataFrame:
    """Gap-based sessions per key: a session closes after
    ``gap_duration`` of silence. Output: session start (min event ts,
    epoch µs), event count, session span µs."""
    return (
        df.groupBy(F.session_window(ts_col, gap_duration).alias("w"), *key_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            *key_cols,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def streaming_windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The streaming flavor: watermark bounds state + drops late rows
    (SURVEY ST3/ST4). Append-output-compatible (windows finalize when
    the watermark passes their end)."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *group_cols,
            "n_events",
        )
    )
