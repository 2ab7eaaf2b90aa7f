"""SimHash near-duplicate detection.

63-bit SimHash: each token hashes to 63 bits; fingerprint bit i is the
sign of Σ(±1 over tokens' bit i). Near-dups have small Hamming
distance between fingerprints.

Pair generation uses the pigeonhole block trick: split the 63 bits
into ``max_distance+1`` blocks — any pair within Hamming distance d
agrees exactly on ≥1 block — so candidates come from equi-joins on
(block_idx, block_value), never a quadratic scan. This is the
classic Google-crawl dedup shape (Manku et al., WWW'07) expressed as
DataFrame ops.

63 (not 64) bits: keeps every block value and the fingerprint inside
a signed BIGINT — portable, no unsigned wraparound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.text import tokens

_BITS = 63


def _token_hash(col: Column) -> Column:
    """63-bit token hash: xxhash64 masked to nonnegative (run/plan
    deterministic, whole-stage-codegen'd; no md5 string round-trip)."""
    return F.xxhash64(col).bitwiseAND(F.lit((1 << _BITS) - 1))


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash: bigint). One explode + one groupBy(id): the 63
    per-bit vote sums partial-aggregate map-side, so the shuffle is
    O(docs), not O(tokens)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col, lowercase=True)).alias("__t")
    ).select(F.col(id_col), _token_hash(F.col("__t")).alias("__h"))
    votes = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"__v{i}")
        for i in range(_BITS)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(_BITS):
        bit = F.when(F.col(f"__v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    persist: bool = True,
) -> DataFrame:
    """Pairs (a < b) with Hamming(simhash_a, simhash_b) ≤ max_distance.

    Pigeonhole: k = max_distance+1 blocks of ~63/k bits; any qualifying
    pair matches on ≥1 whole block → equi-join per block, then exact
    Hamming verification with bit_count(xor).

    ``persist`` caches the fingerprints feeding both self-join sides
    (otherwise the 63-vote aggregation runs twice).
    """
    k = max_distance + 1
    fps = simhash_fingerprints(df, id_col, text_col)
    if persist:
        fps = fps.persist()
    bounds = [(_BITS * i) // k for i in range(k + 1)]

    def block(col: Column, i: int) -> Column:
        lo, hi = bounds[i], bounds[i + 1]
        width = hi - lo
        return F.shiftright(col, lo).bitwiseAND(F.lit((1 << width) - 1))

    blocked = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(F.array(*[block(F.col("simhash"), i) for i in range(k)])).alias(
            "block_idx", "block_val"
        ),
    )
    a = blocked.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("__fa"), "block_idx", "block_val"
    )
    b = blocked.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("__fb"), "block_idx", "block_val"
    )
    dist = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        a.join(b, on=["block_idx", "block_val"], how="inner")
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", dist.alias("hamming"))
        .where(F.col("hamming") <= max_distance)
    )
