"""File-level Bloom index for point lookups over plain parquet — the
data-skipping secondary index Delta/Iceberg offer as "bloom filter
indexes", built from this engine's own bitmap machinery
(dedup/bloom.py).

Problem at 100 TB: a point lookup ``key = X`` on a non-partition,
non-sort column scans every file (parquet row-group stats can't prune
what isn't clustered). Fix: one small index table
(file, word, bits) holding a per-file Bloom bitmap of that file's key
set. A lookup probes the index (k bitmap words per candidate file —
the index is KB-per-file, usually broadcastable), reads ONLY the
files whose bitmap says maybe, and pushes the equality predicate into
those scans. No false negatives ⇒ never misses a row; FPR just reads
an extra file occasionally.

Maintenance matches ingest: the index is per-file, so appending files
appends index rows — no rebuild of existing entries (bit_or
re-aggregation is only needed if files are rewritten).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.dedup.bloom import _positions, bloom_params


def build_file_bloom_index(
    spark: SparkSession,
    path: str,
    key_col: str,
    expected_keys_per_file: int = 100_000,
    fpr: float = 0.01,
) -> tuple[DataFrame, int, int]:
    """Index table (file: string, word: long, bits: long) over every
    parquet file under ``path``, plus the (num_bits, num_hashes)
    sizing the probes must reuse. One distributed pass; the groupBy
    key (file, word) is bounded by files × num_bits/64."""
    num_bits, num_hashes = bloom_params(expected_keys_per_file, fpr)
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), F.col(key_col).cast("string").alias("__k")
    )
    pos = df.select(
        "file", F.explode(_positions(F.col("__k"), num_bits, num_hashes)).alias("pos")
    )
    index = (
        pos.select(
            "file",
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("file", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return index, num_bits, num_hashes


def candidate_files(
    index: DataFrame,
    value: str,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Single-column DataFrame of files whose bitmap has ALL k bits of
    ``value`` set (possibly-containing files). The probe is a k-row
    broadcast joined against the index — distributed, no index
    collect."""
    spark = index.sparkSession
    probe = spark.range(1).select(
        F.explode(
            _positions(F.lit(value).cast("string"), num_bits, num_hashes)
        ).alias("pos")
    ).select(
        F.shiftright("pos", 6).alias("word"),
        F.expr("CAST(pos % 64 AS INT)").alias("bit"),
    )
    hits = index.join(F.broadcast(probe), on="word").where(
        F.getbit(F.col("bits"), F.col("bit")) == 1
    )
    return (
        hits.groupBy("file")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") == num_hashes)
        .select("file")
    )


def point_lookup_with_index(
    spark: SparkSession,
    path: str,
    key_col: str,
    value,
    index: DataFrame,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """``SELECT * WHERE key_col = value`` reading only the files the
    index cannot rule out. The candidate list is tiny (point lookup),
    so collecting the file names to drive the pruned scan is bounded
    by the true hit count + FPR·files, not by data size."""
    files = [r.file for r in candidate_files(
        index, str(value), num_bits, num_hashes
    ).collect()]
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return (
        spark.read.parquet(*files)
        .where(F.col(key_col).cast("string") == str(value))
    )
