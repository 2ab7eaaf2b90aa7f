"""Distributed k-means (Lloyd) refinement in pure DataFrame ops —
the centroid trainer behind an IVF index (functions/similarity.py),
expressed so every iteration is EXACTLY reproducible across engines.

Why integer quantization: float centroid means are order-dependent
(IEEE addition doesn't associate), so a naive implementation gives a
different model per shuffle schedule — untestable, and subtly
non-reproducible in production re-runs. Here vectors are quantized
once to non-negative integers (trunc(v·2^20) + 2^21 — shift-invariant
for distances), so

- squared L2 distances are exact integer sums (order-free),
- argmin assignment is totally ordered by (dist, centroid id),
- centroid updates are exact integer sums + truncating division
  (identical semantics on non-negative operands in Spark's ``div``
  and ANSI floor-div engines alike).

Result: bit-identical clustering on any partitioning, any engine —
verified against a DuckDB replay of the same protocol.

Scale shape per iteration (the right one for 10^10 vectors):
- assignment: centroid table (k·dim ints) is BROADCAST; the vector
  table is scanned once, map-side, no shuffle of vectors;
- update: one shuffle of (cluster, dim, partial-sum) rows, bounded by
  k·dim·partitions regardless of row count (map-side partial
  aggregation) — never the vectors themselves.
Driver holds nothing; iterations chain lazily off cached quantized
vectors. ``localCheckpoint`` truncates lineage per round the same way
dedup/clusters.py does for label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1 << 20  # quantization step: trunc(v * 2^20)
_SHIFT = 1 << 21  # makes quantized coords non-negative for |v| < 2


def quantize_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Replace ``vec_col`` with its non-negative integer quantization
    (array<bigint>). Truncation toward zero is what double→bigint
    casts do in Spark; the +shift keeps every coordinate positive so
    later truncating divisions agree with floor-division engines."""
    q = F.transform(
        F.col(vec_col),
        lambda x: (x.cast("double") * _SCALE).cast("long") + F.lit(_SHIFT),
    )
    return df.withColumn(vec_col, q)


def _sq_dist(a, b):
    """Exact integer squared L2 between two array<bigint> columns:
    sequential fold, but integer addition is associative so the result
    is order-free and engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _best_cluster(vec_col, cents_col):
    """argmin over the in-row centroid array: struct(sq_dist,
    cluster_id) minimized lexicographically — the same total order
    ``F.min(F.struct("sq_dist", "cluster_id"))`` used, evaluated in
    one projection. The former shape broadcast-joined the centroid
    TABLE and re-grouped the corpus by (id, vec) to run the argmin —
    a corpus-sized shuffle per assignment pass whose grouping key
    carried the whole quantized vector (guide §2.4: remove the
    exchange, §2.3: never shuffle the payload to make a decision)."""
    return F.array_min(
        F.transform(
            cents_col,
            lambda ct: F.struct(
                _sq_dist(vec_col, ct["c_vec"]).alias("sq_dist"),
                ct["cluster_id"].alias("cluster_id"),
            ),
        )
    )


def kmeans_fit_predict(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds (the k
    smallest ``id_col`` rows) and return the final assignment:
    (id_col, cluster_id, sq_dist).

    Every returned number is an exact integer in quantized space —
    bit-identical across engines and partitionings. Assignment passes
    are map-only (broadcast centroid array + in-row argmin fold); the
    centroid update keeps the posexplode + (cluster, dim) groupBy
    shape — partial aggregation collapses it to k × dim rows per map
    partition before the exchange, so the shuffle is already
    negligible at any scale (a per-dimension columnar-sums variant
    was measured 2–5× SLOWER end-to-end in r12's interleaved A/B:
    the 64-wide aggregate loses to explode + 2-field partial agg).
    """
    vecs = quantize_vectors(df.select(id_col, vec_col), vec_col)

    # deterministic seeds: the k smallest ids, numbered 0..k-1 in id
    # order (a k-row driver-free limit — TakeOrderedAndProject)
    centroids = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cluster_id"),
            F.col(vec_col).alias("c_vec"),
        )
    )

    def _cents_arr(c: DataFrame) -> DataFrame:
        return c.agg(
            F.collect_list(F.struct("cluster_id", "c_vec")).alias("__cents")
        )

    # ``iters`` assignment passes with a centroid update between each
    # consecutive pair (iters=2 ⇒ seeds → assign → update → assign)
    for _ in range(iters - 1):
        assigned = vecs.crossJoin(F.broadcast(_cents_arr(centroids))).select(
            _best_cluster(F.col(vec_col), F.col("__cents"))["cluster_id"].alias(
                "cluster_id"
            ),
            F.col(vec_col),
        )
        # centroid update: exact integer mean per (cluster, dim);
        # truncating div == floor div on these non-negative sums
        exploded = assigned.select(
            "cluster_id", F.posexplode(vec_col).alias("pos", "val")
        )
        centroids = (
            exploded.groupBy("cluster_id", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.expr("s div n").alias("m")))
                    ),
                    lambda st: st["m"],
                ).alias("c_vec")
            )
        )
        centroids = centroids.localCheckpoint(eager=False)

    # final assignment against the last refined centroids — map-only
    best = _best_cluster(F.col(vec_col), F.col("__cents"))
    return vecs.crossJoin(F.broadcast(_cents_arr(centroids))).select(
        id_col,
        best["cluster_id"].alias("cluster_id"),
        best["sq_dist"].alias("sq_dist"),
    )


def kmeans_cluster_profile(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Cluster-level summary of the fit: (cluster_id, n_members,
    sum_sq_dist) — exact integers, the oracle-checkable face of the
    trainer."""
    a = kmeans_fit_predict(df, id_col, vec_col, k=k, iters=iters)
    return a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("sq_dist").alias("sum_sq_dist"),
    )
