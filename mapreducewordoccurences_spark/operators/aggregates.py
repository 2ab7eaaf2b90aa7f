"""Aggregation helpers.

The reference's only aggregate is a grouped count via a shared locked
hashmap (src/chash.c:100-153); Spark's partial→final HashAggregate
subsumes it. These helpers add the numeric-determinism layer the
engine's money-typed aggregates need, plus rollup/cube/top-k wrappers.

Why decimal: floating-point SUM is order-dependent, and at cluster
scale partial-aggregation order is nondeterministic run to run. Every
money aggregate here casts per-row to DECIMAL (deterministic IEEE
double → decimal rounding), sums exactly (order-independent), and
casts the final result back to double. Results are bit-stable across
partitionings, AQE re-plans, and engines (the DuckDB oracle mirrors
the same casts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decimal_sum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Order-independent SUM of a double column via DECIMAL(28, scale).

    Precision 28 leaves Spark's sum-widening (+10 digits, capped at 38)
    room for ~1e24 totals without overflow (ANSI mode would error).
    Mirror in ANSI SQL: CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def decimal_avg(col: Column | str, scale: int = 6, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum, then one double divide.

    Mirror in ANSI SQL:
    CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE) / COUNT(x).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. ``orderBy().limit(k)`` lets Spark plan
    TakeOrderedAndProject: each partition keeps a k-heap, the driver
    merges k×partitions rows — no global sort, no full shuffle. The
    ordering should be total (add a unique tiebreak column) for
    deterministic results."""
    return df.orderBy(*order_by).limit(k)


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Hierarchical subtotals: (k1,k2,…) ⊃ (k1,…) ⊃ … ⊃ grand total.
    Single shuffle; Spark expands grouping sets map-side."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All 2^n grouping-set combinations."""
    return df.cube(*keys).agg(*aggs)


def fixedpoint_sum(expr: str, scale: int = 4, alias: str | None = None) -> Column:
    """Order-independent SUM of a positive double expression via
    per-row half-up rounding to ``scale`` digits and an int64 sum —
    numerically identical to ``decimal_sum`` (DECIMAL casts round
    half-up too) but runs in primitive whole-stage codegen instead of
    Decimal128 aggregation (measured ~5× on TPC-H Q1 at sf0.1).

    Constraints: inputs must be positive (Spark round() is HALF_UP,
    DuckDB round() is half-away-from-zero — they agree only for
    non-negative values), and the unscaled sum must stay below 2⁶³
    (money at scale 4 → ~10¹⁴ rows of 10⁴-sized values; larger
    corpora drop to scale 2 or the decimal path).

    Mirror in ANSI SQL: SUM(CAST(round(x * 1eS, 0) AS BIGINT)) / 1eS.
    """
    out = F.sum(F.expr(f"CAST(round(({expr}) * 1e{scale}, 0) AS BIGINT)")) / F.lit(
        float(10**scale)
    )
    return out.alias(alias) if alias else out
