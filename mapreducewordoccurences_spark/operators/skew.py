"""Skew-mitigation operators.

AQE's skew-join splitting (on by default, session.py) handles most
runtime skew; these operators cover the two shapes AQE can't fix:

- ``salted_agg``: a grouped aggregation where a handful of hot keys
  (stop-word-class tokens, null-ish user ids) overwhelm single
  reducers. Two-stage: aggregate on (key, salt) — hot keys fan out
  over ``n_salts`` reducers — then re-aggregate on key. Only valid
  for algebraic aggregates (sum/count/min/max), which re-combine.
- ``salted_join``: a join where the LEFT side is heavily skewed on
  the join key and the right side is small-ish but above broadcast
  threshold: left gets a random salt, right is replicated across all
  salt values, join key becomes (key, salt). Shuffle of the hot key
  spreads n_salts-ways at the cost of replicating the right side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Example:
        salted_agg(tok, ["word"], {"count": ("word", "count")})
    Stage 1 groups on keys + a uniform random salt (hot keys spread
    across n_salts partial groups); stage 2 combines partials. Cost:
    one extra (tiny — groups×salts rows) shuffle; win: no reducer
    sees more than ~1/n_salts of a hot key's rows.
    """
    supported = {"sum", "count", "min", "max"}
    for out, (col, fn) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{fn} is not algebraic-recombinable; use {supported}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return stage1.groupBy(*keys).agg(
        *[
            recombine[fn](f"__p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed-left equi-join: salt left, replicate right n_salts ways.

    Right-side replication makes this a (|right| × n_salts) shuffle —
    use when right is too big to broadcast but small enough to
    replicate; for mutual skew, split hot keys out and union.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l_salted = left.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(r_replicated, on=[*keys, "__salt"], how=how)
    return out.drop("__salt")
