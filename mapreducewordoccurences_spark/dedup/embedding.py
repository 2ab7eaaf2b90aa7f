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


def semantic_dedup_profile(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cells
    bound the semantic near-dup candidates, so cosine is never scored
    across the full n² pair space — only within a cell. The greedy
    SemDeDup drop rule: a vector is dropped iff some SMALLER-id vector
    in the SAME cell has cosine ≥ threshold with it (one deterministic
    representative survives per near-dup neighborhood, no iterative
    closure needed).

    Returns (cluster_id, n_members, n_dropped, n_kept).

    100 TB shape: the trainer (functions/clustering.py) broadcasts the
    k·dim centroid table and never shuffles the vectors; the pair join
    shuffles each vector once on cluster_id, and candidate volume is
    Σ_c |c|² — bounded by choosing k ∝ n/target_cell_size (k=8 here
    only because the testdata is small; production SemDeDup uses
    ~25k-100k cells). Within-cell scoring is embarrassingly parallel
    and stays JVM-side (zip_with/aggregate dot products)."""
    from mapreducewordoccurences_spark.functions.clustering import (
        kmeans_fit_predict,
    )

    from mapreducewordoccurences_spark.functions.similarity import dot, l2_norm

    assign = kmeans_fit_predict(df, id_col, vec_col, k=k, iters=iters).select(
        id_col, "cluster_id"
    )
    # norms computed ONCE per member (n folds), not per pair (2·pairs
    # folds); the per-pair expression dot/(norm_a·norm_b) is the exact
    # same arithmetic as cosine_similarity, just with the sqrt hoisted
    members = df.select(
        id_col, vec_col, l2_norm(vec_col).alias("__norm")
    ).join(assign, id_col)
    a = members.select(
        "cluster_id",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = members.select(
        "cluster_id",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    dropped = (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            dot("__va", "__vb") / (F.col("__na") * F.col("__nb")) >= threshold
        )
        .select("cluster_id", F.col("id_b").alias("__dropped_id"))
        .distinct()
    )
    mem_counts = assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    drop_counts = dropped.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_dropped")
    )
    return mem_counts.join(drop_counts, "cluster_id", "left").select(
        "cluster_id",
        "n_members",
        F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
        (F.col("n_members") - F.coalesce(F.col("n_dropped"), F.lit(0)))
        .cast("long")
        .alias("n_kept"),
    )
