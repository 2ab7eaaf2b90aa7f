"""Iterative-narrowing exact quantiles (operators/selection.py) vs
Spark's own percentile_disc and brute-force sorts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.operators.selection import exact_quantile_disc
from tests.conftest import SF_DIR


@pytest.mark.parametrize("q", [0.5, 0.9, 0.99])
def test_matches_percentile_disc_on_orders(spark, q):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    got = exact_quantile_disc(orders, "o_totalprice", q, direct_threshold=50)
    want = orders.agg(
        F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)")
    ).collect()[0][0]
    assert got == want


def test_duplicate_heavy_column(spark):
    # 90% of rows share one value — the degenerate-bucket path
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7.0)).otherwise(F.col("id").cast("double")).alias("v")
    )
    got = exact_quantile_disc(df, "v", 0.5, direct_threshold=10)
    want = df.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
    ).collect()[0][0]
    assert got == want == 7.0


def test_small_slice_direct_path(spark):
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    assert exact_quantile_disc(df, "v", 0.25) == 25.0
    assert exact_quantile_disc(df, "v", 1.0) == 100.0
    with pytest.raises(ValueError):
        exact_quantile_disc(df, "v", 0.0)
