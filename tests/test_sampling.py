"""functions/sampling.py: deterministic split/sample/shuffle invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.sampling import (
    deterministic_shuffle_key,
    hash_split,
    split_thresholds,
    stratified_sample,
)
from mapreducewordoccurences_spark.sources.readers import load_table

from tests.conftest import SF_DIR


def test_split_thresholds_cumulative():
    edges = split_thresholds([("train", 0.9), ("val", 0.05), ("test", 0.05)])
    assert edges == [("train", 58982), ("val", 62259), ("test", 65536)]
    # weights that don't sum to 1 are normalized
    assert split_thresholds([("a", 1), ("b", 1)]) == [("a", 32768), ("b", 65536)]


def test_hash_split_deterministic_and_proportional(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    s1 = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert s1 == s2  # same row → same split, every run
    n = len(s1)
    train = sum(1 for v in s1.values() if v == "train")
    # 90% ± 5pp at 500 docs (binomial noise)
    assert abs(train / n - 0.9) < 0.05
    assert set(s1.values()) <= {"train", "val", "test"}

    # a different salt draws an independent assignment
    s3 = {r["doc_id"]: r["split"] for r in hash_split(docs, salt="v2").collect()}
    assert s3 != s1


def test_stratified_sample_exact_per_stratum(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = stratified_sample(docs, "lang", 0.1)
    kept = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, total in totals.items():
        assert kept[lang] == math.ceil(0.1 * total), lang  # exact, never 0


def test_shuffle_key_total_order(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    keys = [r["k"] for r in docs.select(deterministic_shuffle_key("doc_id").alias("k")).collect()]
    assert len(keys) == len(set(keys))  # md5 of distinct ids → total order


class TestTokenBudgetSample:
    def test_budget_inclusive_boundary(self, spark):
        # group g: docs of 5, 3, 2 tokens (priority: longest first).
        # budget 8 → keep 5-token and 3-token docs (cum 5, 8); drop 2.
        df = spark.createDataFrame(
            [
                (1, "a b c d e", "g"),
                (2, "a b c", "g"),
                (3, "a b", "g"),
            ],
            "doc_id long, text string, source string",
        )
        from mapreducewordoccurences_spark.functions.sampling import (
            token_budget_sample,
        )

        got = token_budget_sample(df, budget_tokens=8).collect()
        assert sorted((r["doc_id"], r["cum_tokens"]) for r in got) == [
            (1, 5),
            (2, 8),
        ]

    def test_groups_budgeted_independently(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "g1"), (2, "a b c", "g2"), (3, "a", "g2")],
            "doc_id long, text string, source string",
        )
        from mapreducewordoccurences_spark.functions.sampling import (
            token_budget_sample,
        )

        got = sorted(
            r["doc_id"] for r in token_budget_sample(df, budget_tokens=3).collect()
        )
        assert got == [1, 2]  # g2's 1-token doc would push cum to 4

    def test_invalid_budget_raises(self, spark):
        import pytest as _pytest

        from mapreducewordoccurences_spark.functions.sampling import (
            token_budget_sample,
        )

        df = spark.createDataFrame([(1, "a", "g")], "doc_id long, text string, source string")
        with _pytest.raises(ValueError):
            token_budget_sample(df, budget_tokens=0)


def test_pps_systematic_sample_properties(spark):
    """~n_target rows per group, heavy rows overrepresented, and the
    pick set is invariant to input partitioning."""
    from pyspark.sql import functions as F

    from mapreducewordoccurences_spark.functions.sampling import (
        pps_systematic_sample,
    )

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
        # one heavy row per group (still < step), rest light
        F.when(F.col("id") < 4, 50).otherwise(F.col("id") % 7 + 1).alias("w"),
    )
    out = pps_systematic_sample(df, "w", n_target=10, group_col="source",
                                id_col="doc_id")
    rows = out.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r.source, []).append(r.doc_id)
    for g, ids in per_group.items():
        # all weights < step ⇒ sample size = floor(tw/step) ∈ {9, 10}
        assert 9 <= len(ids) <= 10, (g, len(ids))

    out2 = pps_systematic_sample(
        df.repartition(17), "w", n_target=10, group_col="source",
        id_col="doc_id",
    )
    assert {r.doc_id for r in rows} == {r.doc_id for r in out2.collect()}
