"""Streaming deduplication.

The streaming face of dedup/exact.py: drop repeated records as they
arrive instead of in a batch pass. Two state regimes:

- ``dedup_stream``: exact ``dropDuplicates`` on key columns — state
  holds every key seen since the query started. Only for keyspaces
  that fit in state (or with a TTL'd state store).
- ``dedup_stream_within_watermark``: ``dropDuplicatesWithinWatermark``
  — a key only needs to be remembered until the event-time watermark
  passes it, so state is bounded by the watermark horizon × arrival
  rate. This is the 100 TB/day answer for exactly-once-per-key with
  at-least-once sources (e.g. Kafka replays land within minutes, not
  days).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(stream_df: DataFrame, keys: str | Sequence[str]) -> DataFrame:
    """Exact streaming dedup; unbounded key state."""
    cols = [keys] if isinstance(keys, str) else list(keys)
    return stream_df.dropDuplicates(cols)


def dedup_stream_within_watermark(
    stream_df: DataFrame,
    keys: str | Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Dedup with evictable state: duplicates are only suppressed if
    they arrive within the watermark horizon of the first copy —
    matching real replay/retry windows while keeping state bounded."""
    cols = [keys] if isinstance(keys, str) else list(keys)
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)
