"""Streaming materialized aggregate: keep a queryable parquet snapshot
of a grouped aggregate continuously up to date from a stream — the
"materialized view maintenance" pattern, composed from pieces the
engine already has:

    stream → per-batch partial aggregate → merge_upsert into the
    snapshot (algebraic recombination) → atomic snapshot swap

Only ALGEBRAIC aggregates (sum/count/min/max — things partials
recombine into) can be maintained this way; avg is kept as sum+count
and derived at read time. The per-batch work touches |batch keys|
rows of the snapshot via the pk anti-join, not the whole table; at
scale, bucket the snapshot by key and the merge is exchange-free.

Snapshot atomicity: each batch writes a NEW versioned directory then
flips a _CURRENT pointer file — readers never see a half-written
snapshot, and a replayed batch (same epoch id after restart) simply
rewrites the same version: idempotent, so exactly-once end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.operators.merge import merge_upsert
from mapreducewordoccurences_spark.sources.sinks import start_foreach_batch_sink


def read_current_snapshot(spark: SparkSession, base_dir: str) -> DataFrame | None:
    ptr = os.path.join(base_dir, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(base_dir, version))


def start_materialized_sum_count(
    stream_df: DataFrame,
    key_col: str,
    value_col: str,
    base_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain SELECT key, sum(value), count(*) GROUP BY key as a
    parquet snapshot under ``base_dir``. Returns the StreamingQuery."""
    spark = stream_df.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy(key_col).agg(
            F.sum(value_col).alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        current = read_current_snapshot(spark, base_dir)
        if current is None:
            merged = partial
        else:
            # algebraic recombination: updated keys REPLACE their row
            # with old+new partials; untouched keys carry over
            combined = (
                partial.join(
                    current.withColumnRenamed("sum_value", "__s0")
                    .withColumnRenamed("n_rows", "__n0"),
                    on=key_col,
                    how="left",
                )
                .select(
                    key_col,
                    (
                        F.col("sum_value") + F.coalesce(F.col("__s0"), F.lit(0))
                    ).alias("sum_value"),
                    (F.col("n_rows") + F.coalesce(F.col("__n0"), F.lit(0))).alias(
                        "n_rows"
                    ),
                )
            )
            merged = merge_upsert(current, combined, keys=[key_col])
        version = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(base_dir, version))
        tmp = os.path.join(base_dir, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(base_dir, "_CURRENT"))

    return start_foreach_batch_sink(
        stream_df, apply_batch, checkpoint_dir, available_now=available_now
    )


def read_snapshot_version(
    spark: SparkSession, base_dir: str, version: str
) -> DataFrame:
    """Time travel: read a specific retained snapshot version (batch
    epochs never overwrite each other — ``v<batch_id>`` directories
    accumulate until a retention sweep deletes them), so yesterday's
    aggregate state stays queryable for audits and reprocessing
    comparisons."""
    return spark.read.parquet(os.path.join(base_dir, version))
