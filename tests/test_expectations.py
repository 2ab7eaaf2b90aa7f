"""Expectation gate (operators/expectations.py): each violation kind
is counted correctly, and a clean table reports all zeros."""

from __future__ import annotations

from mapreducewordoccurences_spark.operators.expectations import (
    expect_in_range,
    expect_not_null,
    expect_regex,
    expect_report,
    expect_unique,
)


def test_violations_counted_per_kind(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, -5.0, "B"),     # dup key + below range
            (None, 50.0, "ok"), # null key + regex violation
            (3, 2000.0, "C"),   # above range
        ],
        ["k", "x", "s"],
    )
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    row = expect_report(
        df,
        [
            expect_not_null("k"),
            expect_in_range("x", lo=0, hi=1000),
            expect_unique("k"),
            expect_regex("s", "^[A-Z]$"),
        ],
        foreign_keys=[("k", dim, "k")],
    ).collect()[0]
    assert row.n_rows == 4
    assert row.null_k == 1
    assert row.range_x == 2
    assert row.dupes_k == 1  # two non-null k=1 rows, one distinct
    assert row.regex_s == 1
    assert row.orphans_k == 1  # k=3 has no dimension row


def test_clean_table_all_zero(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "x"])
    row = expect_report(
        df, [expect_not_null("k"), expect_unique("k"), expect_in_range("x", 0, 10)]
    ).collect()[0]
    assert (row.null_k, row.dupes_k, row.range_x) == (0, 0, 0)
