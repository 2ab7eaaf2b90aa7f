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

Two token-hash flavors:
- default (``portable=False``): 63-bit xxhash64 — fastest
  (whole-stage codegen, no string round-trip); the production tier.
- ``portable=True``: the low 60 bits of md5 (15 hex chars parsed as
  an integer). Bit-identical to ANSI-SQL
  ``CAST('0x' || substring(md5(tok),1,15) AS BIGINT)``, so an
  external engine (the DuckDB oracle) can recompute the *exact same
  fingerprints* and the Hamming-ball pair set becomes an
  unconditionally verifiable contract — no sketch-recall assumption.
  (The r7 sf1 sweep caught the conditional Jaccard-recall oracle
  failing at scale; this flavor exists so the catalog row is exact
  at every scale.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.text import tokens

_BITS = 63
_PORTABLE_BITS = 60


def _token_hash(col: Column, portable: bool = False) -> Column:
    """Token hash. Default: 63-bit xxhash64 masked to nonnegative
    (run/plan deterministic, whole-stage-codegen'd; no md5 string
    round-trip). Portable: low 60 bits of md5, reproducible in any
    SQL engine with md5() (verified Spark==DuckDB bit-for-bit)."""
    if portable:
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return F.xxhash64(col).bitwiseAND(F.lit((1 << _BITS) - 1))


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(id, simhash: bigint). One explode + one groupBy(id): the
    per-bit vote sums partial-aggregate map-side, so the shuffle is
    O(docs), not O(tokens)."""
    bits = _PORTABLE_BITS if portable else _BITS
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col, lowercase=True)).alias("__t")
    ).select(F.col(id_col), _token_hash(F.col("__t"), portable).alias("__h"))
    votes = [
        F.sum(
            F.when(F.col("__h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"__v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"__v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    persist: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Pairs (a < b) with Hamming(simhash_a, simhash_b) ≤ max_distance.

    Pigeonhole: k = max_distance+1 blocks of ~bits/k bits; any
    qualifying pair matches on ≥1 whole block → equi-join per block,
    then exact Hamming verification with bit_count(xor). Recall of
    the Hamming ball is 1.0 BY CONSTRUCTION at any scale; only the
    Hamming↔Jaccard correlation is sketchy.

    Scale note: block width = bits/(d+1) sets the join's selectivity
    — d=3 → 15-bit blocks (32k values, scale-safe); d=16 → 3-bit
    blocks whose equi-join degenerates to near-quadratic on large
    corpora (observed 579 s at sf1 before r7 retired that config).
    Keep d ≤ 8 on big data.

    ``persist`` caches the fingerprints feeding both self-join sides
    (otherwise the per-bit vote aggregation runs twice).
    """
    k = max_distance + 1
    bits = _PORTABLE_BITS if portable else _BITS
    fps = simhash_fingerprints(df, id_col, text_col, portable=portable)
    if persist:
        fps = fps.persist()
    bounds = [(bits * i) // k for i in range(k + 1)]

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
