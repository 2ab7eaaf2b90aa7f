from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.engine import Engine

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark=spark, data_dir=SF_DIR)


def test_sql_over_registered_tables(engine):
    out = engine.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert sum(r["n"] for r in out) == 6000


def test_sql_join_matches_dataframe_path(engine):
    sql_n = engine.sql(
        """
        SELECT count(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """
    ).collect()[0]["n"]
    from mapreducewordoccurences_spark.operators.joins import semi_join

    df_n = semi_join(
        engine.table("customer"),
        engine.table("orders").select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
    ).count()
    assert sql_n == df_n


def test_catalog_query_by_name(engine):
    df = engine.query("wordcount")
    assert df.columns == ["word", "cnt"]
    assert df.count() > 0


def test_catalog_lists_queries(engine):
    assert "q1_pricing_summary" in engine.catalog
    assert len(engine.catalog) >= 30


def test_observed_metrics_piggyback_single_pass(spark, tmp_path):
    from pyspark.sql import functions as F

    from mapreducewordoccurences_spark.engine import observed

    df = spark.range(0, 1000).select(
        F.col("id"), F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("k")
    )
    obs, out = observed(
        df, "gate",
        n=F.count(F.lit(1)),
        k_nulls=F.sum(F.col("k").isNull().cast("int")),
    )
    out.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n"] == 1000 and got["k_nulls"] == 100
