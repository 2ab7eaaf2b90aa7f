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


def key_skew_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Skew diagnostic for a prospective shuffle key: per-key row
    counts for the ``top_n`` hottest keys plus each key's share of
    total rows and its ratio to the mean key load. ratio_to_mean ≈
    the slowdown factor the hottest reducer imposes on the stage —
    the number that decides between a plain groupBy, salting, or AQE
    skew-join before a job runs at 100 TB.

    The per-key aggregation (map-side combine) is persisted and read
    twice: once through a distributed TakeOrderedAndProject for the
    top-N, once through a single-row totals aggregate that broadcasts
    onto those N rows. No stage ever holds the full key set in one
    task — a global window here would funnel every distinct key
    through one reducer, exactly the skew this function diagnoses.
    """
    per = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows")).persist()
    totals = per.agg(
        F.sum("n_rows").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__n_keys"),
    )
    top = per.orderBy(F.col("n_rows").desc(), *key_cols).limit(top_n)
    return top.join(F.broadcast(totals), how="cross").select(
        *key_cols,
        "n_rows",
        (F.col("n_rows") / F.col("__total")).alias("row_share"),
        (F.col("n_rows") / (F.col("__total") / F.col("__n_keys"))).alias(
            "ratio_to_mean"
        ),
    )
