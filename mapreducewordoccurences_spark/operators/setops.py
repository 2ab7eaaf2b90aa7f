"""Set operators (absent from the reference, SURVEY.md §2d) — thin,
named wrappers over Spark built-ins so the engine's API surface is
explicit and testable.

``union_all`` is shuffle-free (pure concatenation of partitions);
``union_distinct``/``intersect``/``except`` shuffle on the full row as
key — at scale prefer distinct on a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    return a.unionByName(b) if by_name else a.union(b)


def union_distinct(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    return union_all(a, b, by_name).distinct()


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)
