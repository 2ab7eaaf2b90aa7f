"""Streaming joins.

Absent from the reference (batch-only, SURVEY.md §2d); pure Structured
Streaming built-ins:

- **stream-static**: enrich a stream with a dimension table. The static
  side is re-planned per micro-batch (it can be a slowly-changing
  parquet dir); Spark broadcasts it when small. No state is kept — the
  stream side never waits.
- **stream-stream**: equality key + event-time interval condition, with
  watermarks on BOTH sides so the join state is evictable. Without the
  time bound the state would grow forever; with it, each side buffers
  only ``max_delay`` of history per key — that's the 100 TB/day
  contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream_with_dim(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join (stateless). ``how`` may be inner or left —
    right/full would need unbounded stream state and are rejected by
    Spark. With ``broadcast=True`` (default) the dim side is hinted so
    every micro-batch skips the shuffle — right for broadcast-sized
    dims; pass False for dims larger than executor memory to fall back
    to a shuffled stream-static join instead of OOMing each batch."""
    keys = [on] if isinstance(on, str) else list(on)
    dim = F.broadcast(dim_df) if broadcast else dim_df
    return stream_df.join(dim, on=keys, how=how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + max_delay]``.

    Both sides get watermarks, so Spark evicts buffered rows once the
    event-time horizon passes — state per key is bounded by
    ``watermark + max_delay`` of traffic. Column names must be
    disjoint apart from ``key`` (rename before calling if not).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
