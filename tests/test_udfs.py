from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.udfs import (
    SplitSentences,
    vector_norm_udf,
    zscore_by_group,
)
from mapreducewordoccurences_spark.sources.readers import load_table

from tests.conftest import SF_DIR


def test_pandas_udf_matches_jvm_expression(spark):
    from mapreducewordoccurences_spark.functions.similarity import l2_norm

    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    both = emb.select(
        "vec_id",
        vector_norm_udf("embedding").alias("py"),
        l2_norm("embedding").alias("jvm"),
    ).collect()
    for r in both:
        assert math.isclose(r["py"], r["jvm"], rel_tol=1e-6), r


def test_zscore_by_group_matches_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = zscore_by_group(emb).collect()
    pdf = emb.select("vec_id", "label", "embedding").toPandas()
    for label in {r["label"] for r in out}:
        # float64 like the UDF (float32 accumulation would drift ~1e-7,
        # past the oracle's round-4 tolerance — see zscore_by_group)
        mat = np.stack(pdf[pdf.label == label].embedding.to_numpy()).astype(np.float64)
        mean, std = mat.mean(axis=0), mat.std(axis=0)
        std[std == 0] = 1.0
        ids = pdf[pdf.label == label].vec_id.to_numpy()
        expected = {i: (np.stack([v]) - mean)[0] / std for i, v in zip(ids, pdf[pdf.label == label].embedding)}
        got = {r["vec_id"]: np.array(r["zscored"]) for r in out if r["label"] == label}
        for i in ids:
            assert np.allclose(got[i], expected[i], atol=1e-9)


def test_udtf_sentence_split(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    rows = spark.sql(
        "SELECT s.* FROM VALUES ('One two. Three! Four five six?') t(txt), "
        "LATERAL split_sentences(txt) s"
    ).collect()
    got = [(r["sentence"], r["idx"], r["n_words"]) for r in rows]
    assert got == [("One two", 0, 2), ("Three", 1, 1), ("Four five six", 2, 3)]
