"""Window operators (absent from the reference, SURVEY.md §2d).

Design rule for determinism at scale: every window ORDER BY in this
module must be made total by the caller (include a unique tiebreak
column); a partial order makes rank/running results legal-but-
nondeterministic across shuffles and engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group via ranking window.

    One shuffle on ``partition_by`` + in-partition sort. Spark inserts
    a WindowGroupLimit (partial top-k before the shuffle) for
    rank-function filters like this, so map-side data is pruned to k
    per group per partition — the shuffle carries O(groups × k), not
    the full input. That is the 100 TB-safe shape for "top N per key".
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranker = _RANKERS[method]
    return df.withColumn(rank_col, ranker().over(w)).where(F.col(rank_col) <= k)


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    agg: Column,
    out_col: str,
) -> DataFrame:
    """Running (cumulative) aggregate over an ordered per-key frame:
    rows between unbounded preceding and current row."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, agg.over(w))


def lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "delta",
    offset: int = 1,
) -> DataFrame:
    """value - lag(value, offset) per key, in order. NULL for the first
    ``offset`` rows of each key."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col, offset).over(w))
