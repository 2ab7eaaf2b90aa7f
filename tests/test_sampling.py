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
