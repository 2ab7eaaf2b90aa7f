"""Data-quality expectation gates — the contract checks a pipeline
runs before promoting a snapshot (null-rate, key uniqueness, value
ranges, referential integrity).

Shape matters at scale: every row-local expectation (nulls, ranges,
regex, set membership) folds into ONE aggregation pass over the table
— adding an expectation adds an expression, not a scan. Key
uniqueness rides the same pass as an exact count-distinct. Referential
integrity is the only multi-table check: an anti-join count per
foreign key, broadcast when the dimension is small. The report is a
single row of violation counts — gate on `all zeros` or feed it to a
metrics sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    return f"null_{col}", F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))


def expect_in_range(col: str, lo=None, hi=None) -> tuple[str, Column]:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return f"range_{col}", F.sum(F.when(cond, 1).otherwise(0))


def expect_unique(col: str) -> tuple[str, Column]:
    """Duplicate count among NON-NULL keys = count(col) − distinct
    (0 ⇒ unique; nulls are expect_not_null's concern, not double-
    counted here)."""
    return f"dupes_{col}", F.count(F.col(col)) - F.count_distinct(F.col(col))


def expect_regex(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"regex_{col}",
        F.sum(F.when(~F.col(col).rlike(pattern), 1).otherwise(0)),
    )


def expect_report(
    df: DataFrame,
    expectations: list[tuple[str, Column]],
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Single-row violation report: ``n_rows`` plus one BIGINT count
    per expectation (0 = satisfied). ``foreign_keys`` entries are
    (fact column, dimension df, dimension column); each contributes an
    ``orphans_<col>`` count via an anti-join against the broadcast
    distinct dimension keys."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        col.cast("bigint").alias(name) for name, col in expectations
    ]
    report = df.agg(*aggs)
    for fk_col, dim, dim_col in foreign_keys or []:
        orphans = (
            df.select(F.col(fk_col))
            .where(F.col(fk_col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(fk_col)).distinct()),
                on=fk_col,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"orphans_{fk_col}"))
        )
        report = report.crossJoin(F.broadcast(orphans))
    return report
