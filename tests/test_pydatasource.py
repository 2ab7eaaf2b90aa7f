"""Spark-4 Python DataSource: the synthetic corpus generator must be
partition-parallel, deterministic, and actually push doc_id range
predicates into the generation bounds."""

from __future__ import annotations

import pytest

from mapreducewordoccurences_spark.sources.pydatasource import (
    SyntheticCorpusDataSource,
    _row,
)


@pytest.fixture(scope="module")
def corpus(spark):
    spark.dataSource.register(SyntheticCorpusDataSource)
    return (
        spark.read.format("synthetic_corpus")
        .option("numRows", 500)
        .option("numPartitions", 4)
        .load()
    )


def test_count_partitions_schema(corpus):
    assert corpus.count() == 500
    assert corpus.rdd.getNumPartitions() == 4
    assert corpus.columns == ["doc_id", "text", "lang", "source", "n_tokens"]


def test_rows_are_closed_form(corpus):
    got = corpus.where("doc_id = 7").collect()
    assert len(got) == 1
    assert tuple(got[0]) == _row(7)


def test_range_pushdown_prunes_generation(spark, corpus):
    """An absorbed doc_id equality shrinks the generated range to one
    id → exactly ONE input partition (without pushdown the 4-way
    range split of the full id space would remain). This observes the
    pushdown through the partition planner, not just the result."""
    sub = corpus.where("doc_id = 123")
    assert sub.rdd.getNumPartitions() == 1
    assert [r["doc_id"] for r in sub.collect()] == [123]

    rng = corpus.where("doc_id >= 100 and doc_id < 110")
    assert sorted(r["doc_id"] for r in rng.collect()) == list(range(100, 110))


def test_residual_filters_still_apply(corpus):
    """Non-doc_id predicates are yielded back to Spark (unsupported by
    the source) and must still filter correctly post-scan."""
    rows = corpus.where("lang = 'zh' and doc_id < 20").collect()
    assert {r["doc_id"] for r in rows} == {4, 9, 14, 19}
    assert all(r["lang"] == "zh" for r in rows)


def test_deterministic_across_repartitionings(spark):
    a = (
        spark.read.format("synthetic_corpus")
        .option("numRows", 200)
        .option("numPartitions", 1)
        .load()
        .collect()
    )
    b = (
        spark.read.format("synthetic_corpus")
        .option("numRows", 200)
        .option("numPartitions", 7)
        .load()
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
