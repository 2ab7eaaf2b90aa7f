"""Integer-quantized k-means (functions/clustering.py): partition
invariance (the reproducibility claim), seed determinism, and
assignment sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.clustering import (
    kmeans_cluster_profile,
    kmeans_fit_predict,
)
from tests.conftest import SF_DIR


def test_kmeans_partition_invariant(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = {
        tuple(r)
        for r in kmeans_cluster_profile(emb, "vec_id", "embedding", k=4, iters=2).collect()
    }
    b = {
        tuple(r)
        for r in kmeans_cluster_profile(
            emb.repartition(13), "vec_id", "embedding", k=4, iters=2
        ).collect()
    }
    assert a == b
    assert sum(n for _, n, _ in a) == emb.count()


def test_kmeans_every_vector_assigned_once(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fit = kmeans_fit_predict(emb, "vec_id", "embedding", k=4, iters=2)
    rows = fit.collect()
    assert len(rows) == emb.count()
    assert len({r.vec_id for r in rows}) == len(rows)
    assert all(0 <= r.cluster_id < 4 and r.sq_dist >= 0 for r in rows)


def test_kmeans_more_iters_never_worse_objective(spark):
    """Lloyd monotonicity survives the quantization: total within-
    cluster sq distance after 3 passes <= after 1 pass."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def obj(iters):
        prof = kmeans_cluster_profile(emb, "vec_id", "embedding", k=4, iters=iters)
        return prof.agg(F.sum("sum_sq_dist")).collect()[0][0]

    assert obj(3) <= obj(1)
