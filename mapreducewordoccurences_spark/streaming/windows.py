"""Event-time windowed streaming aggregations with watermarks.

Covers the streaming checklist (SURVEY.md §2d): tumbling / sliding /
session windows, late-data policy via ``withWatermark`` (events later
than the watermark relative to max seen event-time are dropped; state
older than the watermark is evicted — bounded state at 100 TB/day
streams).

The events table's ``ts`` has shipped as parquet timestamp[us]
(TimestampNTZType in Spark) and, historically, as int64 epoch-nanos
(see sources/readers.py); streaming window functions need an event-time
timestamp, so these helpers accept any of those shapes and normalize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_event_time(df: DataFrame, ts_col: str) -> tuple[DataFrame, str]:
    dtype = dict(df.dtypes)[ts_col]
    if dtype == "bigint":  # legacy epoch-nanos → timestamp (micro precision)
        return (
            df.withColumn("__event_time", F.timestamp_micros((F.col(ts_col) / 1000).cast("long"))),
            "__event_time",
        )
    return df.withColumn("__event_time", F.col(ts_col)), "__event_time"


def tumbling_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Non-overlapping event-time windows: (window, key, n_events
    [, sum_value]). Late rows beyond ``watermark`` are dropped and
    window state is evicted once the watermark passes window end."""
    df, et = _as_event_time(stream_df, ts_col)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(F.col(value_col).cast("decimal(28,2)")).cast("double").alias("sum_value"))
    return (
        df.withWatermark(et, watermark)
        .groupBy(F.window(F.col(et), window), F.col(key_col))
        .agg(*aggs)
    )


def sliding_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping windows (each event lands in window/slide windows)."""
    df, et = _as_event_time(stream_df, ts_col)
    return (
        df.withWatermark(et, watermark)
        .groupBy(F.window(F.col(et), window, slide), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def session_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: per-key activity bursts separated by ≥``gap``
    of silence. Dynamic, data-driven window bounds — state merges as
    sessions coalesce within the watermark horizon."""
    df, et = _as_event_time(stream_df, ts_col)
    return (
        df.withWatermark(et, watermark)
        .groupBy(F.session_window(F.col(et), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
