"""MinHash + LSH banding near-duplicate detection — the 100 TB-scale
dedup tier (the shape used by web-scale corpus dedup à la
GPT-3/Gopher/RefinedWeb pipelines).

Pipeline: shingle → 64-bit base hash → ``num_perm`` independent
rehashes h_i(x) = xxhash64(x, i·seed-mix) → per-doc signature
(array of per-hash minima) → split signature into ``bands`` bands of
``rows_per_band`` → docs sharing any band-hash become candidates →
exact signature agreement estimates Jaccard.

Why rehashing, not affine "permutations": the classic
h_i(x) = (a_i·x + b_i) mod p is only a permutation-like shuffle if
the products wrap mod p many times. With BIGINT-safe parameters
(a < 2³¹ over a 30-bit folded domain) a_i·x + b_i < 2p — each map is
order-PRESERVING with a single cut point, so every "permutation"
ranks the shingle set in the same underlying order and the num_perm
minima are massively correlated. The agreement rate then estimates a
gap-weighted overlap with per-pair variance that doesn't shrink with
num_perm — measured at sf1: pairs with exact J=0.95 showed agreement
≈0.37 and were missed by all 32 bands. A fresh xxhash64 of
(base_hash, i) per permutation is a genuinely independent family:
agreement is Binomial(num_perm, J)/num_perm, the S-curve math holds,
and the hot loop stays primitive-BIGINT whole-stage-codegen.

Why this scales where ngram.py's inverted index doesn't: candidate
generation is bounded by band-bucket collisions (tunable via the
S-curve: P(candidate) = 1-(1-J^rows)^bands), independent of shingle
document frequency. Everything is built-in array/agg expressions —
one explode per (doc, shingle), one groupBy per doc, one explode per
(doc, band), one self-join on (band, band_hash).

Base hash is ``xxhash64`` — JVM-native (no string materialization, no
base conversion), deterministic across runs/partitionings/AQE replans,
which is the determinism a rows-only operator needs. (An earlier
md5-hex→bigint variant bought cross-SQL-engine portability nobody
consumes and cost ~25% of end-to-end runtime.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.dedup.ngram import shingles_df


def _base_hash(col: Column) -> Column:
    """64-bit integer hash of a string (signed; consumers pmod it).
    xxhash64 is whole-stage-codegen'd — one pass over the bytes."""
    return F.xxhash64(col)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, signature: array<bigint> of length num_perm).

    One shuffle (groupBy id); the num_perm minima fold into a single
    partial-aggregated pass, so shuffle rows = docs, not shingles.
    """
    sh = shingles_df(df, id_col, text_col, n).select(
        F.col(id_col), _base_hash(F.col("shingle")).alias("__h")
    )
    # Each "permutation" is an independent 64-bit rehash of the base
    # hash: xxhash64(__h, mix_i) where mix_i folds (seed, i) into one
    # literal. Hashing an (int64, int64) pair is one codegen'd call —
    # no mod-p arithmetic, no order-preserving-map bias (see module
    # docstring for why the affine family was statistically broken).
    #
    # The num_perm min-aggregates are composed as ONE SQL string
    # (array of aggregates) instead of num_perm Column objects: each
    # F.xxhash64/F.min/F.alias call is a py4j round-trip, and at 128
    # perms the loop cost ~1.2 s of driver time PER QUERY BUILD
    # (measured r13) before Spark saw the plan. A bare integer SQL
    # literal types exactly like F.lit(int) — IntegerType when it
    # fits int32, LongType above — so the analyzed plan (and thus
    # every hash value) is bit-identical to the former loop; the
    # parity test pins one signature against the Column-API build.
    sig_sql = "array(" + ", ".join(
        f"min(xxhash64(__h, {seed * 1_000_003 + i}))" for i in range(num_perm)
    ) + ")"
    return sh.groupBy(id_col).agg(F.expr(sig_sql).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    persist: bool = True,
) -> DataFrame:
    """Candidate pairs via LSH banding, scored by estimated Jaccard
    (signature agreement rate), filtered at ``threshold``.

    Returns (doc_a, doc_b, est_jaccard). With num_perm=64, bands=16
    (4 rows/band) the S-curve midpoint sits near J≈0.5 — catches
    J≥0.7 pairs with >99% probability.

    ``persist`` caches the banded signatures, which feed both sides of
    the candidate self-join (Spark recomputes repeated subtrees
    otherwise — that would re-shingle and re-hash the corpus twice).
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed)
    if persist:
        sigs = sigs.persist()

    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            # xxhash64 hashes the bigint slice directly — no string
            # round-trip; a 64-bit bucket id keeps false band
            # collisions ~0 (and any are filtered by est_jaccard).
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )
    # The self-join shuffles ids only — carrying the num_perm-long
    # signature through the banding explode would multiply the exchange
    # by bands × (8·num_perm) bytes per doc (~60× at the defaults).
    # Signatures re-join from the persisted table after candidate
    # dedup, when the row set is already collision-pruned.
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "band_hash")
    cand = (
        a.join(b, on=["band", "band_hash"], how="inner")
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand = cand.join(
        sigs.select(F.col(id_col).alias("doc_a"), F.col("signature").alias("__sig_a")),
        "doc_a",
    ).join(
        sigs.select(F.col(id_col).alias("doc_b"), F.col("signature").alias("__sig_b")),
        "doc_b",
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("__sig_a", "__sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_perm))
    )
    return cand.select("doc_a", "doc_b", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )


def minhash_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The persistent LSH INDEX of a corpus: (signatures, band_table).

    ``signatures`` is (id, signature array<long>); ``band_table`` is
    (id, band, band_hash) — the two tables a production pipeline
    writes out ONCE (partitioned by band at scale) so that every
    future batch dedups against the corpus without re-shingling or
    re-hashing a single old document. Same permutations/banding as
    ``minhash_lsh_pairs`` given the same seed, so estimates are
    directly comparable.

    ``persist`` caches the signature table before deriving the band
    table from it — the in-session analog of "written out once".
    Without it, consuming both returned tables recomputes the whole
    shingle→hash→min pipeline twice (band_table shares signatures'
    lineage), which is exactly the rescan the index exists to avoid.
    Measured (r7, interleaved A/B on local[32], incremental-dedup
    shape): wash at sf0.1, ~5% faster at sf1 (6.50 vs 6.85 s) — and
    the win grows with corpus size since the avoided recompute is a
    full corpus scan+shingle+128-slot-min pass.

    Caching contract: the persist is NOT released by this function
    (the returned tables are lazy; the cache must outlive the
    caller's final action). Long-lived sessions indexing many corpora
    should ``signatures.unpersist()`` when done with both tables, or
    pass ``persist=False`` and manage caching themselves — the bench
    harness instead clears the session cache between queries."""
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed)
    if persist:
        sigs = sigs.persist()
    band_table = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )
    return sigs, band_table


def minhash_lsh_incremental_pairs(
    new_df: DataFrame,
    index_sigs: DataFrame,
    index_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Incremental LSH dedup: candidate pairs between a NEW batch and
    an already-indexed corpus (``minhash_band_index`` output), scored
    by signature-agreement Jaccard estimate.

    Returns (new_id, index_id, est_jaccard). The 100 TB contract:
    per batch, only the NEW documents are shingled/hashed (batch-sized
    work); the corpus contributes its stored band table to one
    equi-join on (band, band_hash) — corpus-side cost is a join
    against an index that dynamic partition pruning / bucketing keeps
    cheap, NOT a rescan. new×new dedup within the batch is
    ``minhash_lsh_pairs`` on the batch alone; this function covers
    the new×corpus frontier."""
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    new_sigs, new_bands = minhash_band_index(
        new_df, id_col, text_col, n, num_perm, bands, seed
    )
    cand = (
        new_bands.select(
            F.col(id_col).alias("new_id"), "band", "band_hash"
        )
        .join(
            index_bands.select(
                F.col(id_col).alias("index_id"), "band", "band_hash"
            ),
            on=["band", "band_hash"],
        )
        .where(F.col("new_id") != F.col("index_id"))
        .dropDuplicates(["new_id", "index_id"])
    )
    cand = cand.join(
        new_sigs.select(F.col(id_col).alias("new_id"), F.col("signature").alias("__sa")),
        "new_id",
    ).join(
        index_sigs.select(
            F.col(id_col).alias("index_id"), F.col("signature").alias("__sb")
        ),
        "index_id",
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda eq: eq
            )
        )
        / F.lit(float(num_perm))
    )
    return cand.select("new_id", "index_id", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= threshold
    )
