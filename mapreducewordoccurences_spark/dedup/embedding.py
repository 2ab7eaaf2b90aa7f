"""Embedding-cosine near-duplicate detection.

Semantic near-dups: pairs whose embedding cosine ≥ threshold. The
scale path bucketizes with sign-LSH first (functions/similarity.py)
so only plausible pairs are scored; ``exact=True`` scores all pairs
(O(n²) — verifier tier / small inputs only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.similarity import (
    cosine_similarity,
    lsh_bucket,
    _hyperplanes,
)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Pairs (a < b) with cosine(vec_a, vec_b) ≥ threshold →
    (id_a, id_b, cos_sim)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if exact:
        cand = a.join(b, on=F.col("id_a") < F.col("id_b"), how="inner")
    else:
        # ONE scan: every table's bucket id in a single projected array,
        # posexploded to (table, bucket) rows — a per-table union would
        # re-scan the corpus n_tables times (see functions/similarity.py
        # lsh_knn bucketize, same pattern).
        buckets = F.array(*[
            lsh_bucket(vec_col, _hyperplanes(dim, n_planes, seed + 1000 * t))
            for t in range(n_tables)
        ])
        bucketed = df.select(
            F.col(id_col),
            F.col(vec_col),
            F.posexplode(buckets).alias("__table", "__bucket"),
        )
        la = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__table", "__bucket"
        )
        lb = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__table", "__bucket"
        )
        cand = (
            la.join(lb, on=["__table", "__bucket"], how="inner")
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return cand.select(
        "id_a", "id_b", cosine_similarity("__va", "__vb").alias("cos_sim")
    ).where(F.col("cos_sim") >= threshold)
