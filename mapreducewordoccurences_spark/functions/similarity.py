"""Embedding similarity search over array<float> columns.

Two tiers:
- ``brute_force_knn``: exact cosine top-k — the correctness baseline.
  O(|queries| × |corpus|); fine when the query set is small enough to
  broadcast (the usual case: a probe/eval set vs a 100 TB corpus).
- ``lsh_knn``: random-hyperplane (sign) LSH — the scale path. Each
  vector hashes to one bucket per table; candidates share a bucket in
  ≥1 table; exact cosine re-ranks candidates. Shuffle is proportional
  to bucket collisions, not |corpus|².

All arithmetic is JVM-side (``zip_with``/``aggregate`` fold in
double) — no Python in the data path; results are deterministic
(sequential fold, no float reassociation).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.operators.windows import top_k_per_group


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as double, sequential left fold (deterministic)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (||a||·||b||), double precision."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is broadcast (it must be small — an eval set, a
    dedup probe batch); the corpus streams through map-side with NO
    shuffle of corpus rows. The only shuffle is the per-query top-k
    (WindowGroupLimit prunes map-side to k rows per query per
    partition, so the shuffle carries O(queries × k × partitions)).

    Returns (query_id, neighbor_id, rnk, sim); ties broken by
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).join(F.broadcast(q), on=(F.lit(True) if include_self else F.col("neighbor_id") != F.col(query_id_col)), how="inner")
    scored = joined.select(
        query_id_col,
        "neighbor_id",
        cosine_similarity("__qvec", "__cvec").alias("sim"),
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    ).select(query_id_col, "neighbor_id", "rnk", "sim")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (Box-Muller over a
    seeded PRNG) — plain literals, no numpy dependency in the plan."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(vec · plane_i), packed into a
    BIGINT. Computed entirely with built-in array ops."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(_c(vec), p) >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH.

    Each table hashes every vector into one of 2^n_planes buckets;
    query and corpus rows join on (table, bucket) — an equi-join that
    shuffles only colliding rows — then exact cosine re-ranks the
    union of candidates. Recall is tuned by (n_planes ↓, n_tables ↑).

    Defaults (4 planes × 16 tables → recall ≈0.86 on isotropic 64-d
    test data) suit top-k retrieval where neighbor similarities are
    modest; for NEAR-DUP detection (cos ≥ 0.9) raise n_planes — high
    similarity survives many hyperplane cuts, and bigger buckets
    aren't needed. Bucket count (2^n_planes) should grow with corpus
    size: target ~corpus/2^n_planes candidates per bucket per table.
    """
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        tables.append((t, planes))

    def bucketize(df: DataFrame, ident: str) -> DataFrame:
        parts = [
            df.select(
                F.col(id_col).alias(ident),
                F.col(vec_col).alias(f"__vec_{ident}"),
                F.lit(t).alias("__table"),
                lsh_bucket(vec_col, planes).alias("__bucket"),
            )
            for t, planes in tables
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    qb = bucketize(queries, query_id_col)
    cb = bucketize(corpus, "neighbor_id")
    cand = (
        cb.join(qb, on=["__table", "__bucket"], how="inner")
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", f"__vec_{query_id_col}", "__vec_neighbor_id")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.select(
        query_id_col,
        "neighbor_id",
        cosine_similarity(f"__vec_{query_id_col}", "__vec_neighbor_id").alias("sim"),
    )
    return top_k_per_group(
        scored,
        [query_id_col],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    ).select(query_id_col, "neighbor_id", "rnk", "sim")
