"""Prefix-filtering set-similarity join (SSJoin/PPJoin family,
Chaudhuri et al. ICDE'06; Xiao et al. WWW'08) — EXACT Jaccard pairs
at corpus scale without the full inverted index.

The exact posting-list tier (dedup/ngram.py) indexes EVERY shingle,
so candidate volume is Σ df² over all shingles — the df cap bounds it
by dropping hot shingles entirely (approximate under the cap). Prefix
filtering keeps the result EXACT while indexing only a fraction:

    order every doc's shingle set by GLOBAL rarity (ascending df,
    shingle as tiebreak — one total order shared by all docs);
    for Jaccard ≥ t, two sets of sizes |A|,|B| must overlap in at
    least ceil(t/(1+t)·(|A|+|B|)) elements, so if each doc indexes
    only its first  p = |d| − ceil(t·|d|) + 1  ordered shingles (its
    "prefix"), any qualifying pair MUST collide on ≥1 indexed
    shingle. Everything outside the prefix is never indexed.

At t=0.8 the prefix is ~20% of each doc's shingles — and because the
global order puts RARE shingles first, the indexed posting lists are
the short ones: candidate volume collapses versus the full index
while recall stays provably 1.0. Candidates are then verified with
the exact Jaccard on xxhash64-folded shingle arrays (same fold as
the other tiers), so the output is identical to the uncapped
posting-list join — the two formulations share one SQL oracle.

Cost model at 100 TB: one groupBy(shingle) for global df, one
per-doc sort (inside groupBy collect), one equi-join on prefix
shingles (short lists ⇒ bounded fan-out), and candidate-bounded
verification. No knob to mis-tune: unlike max_shingle_df, exactness
does not depend on a cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.dedup.ngram import shingles_df


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All doc pairs (a < b) with shingle-Jaccard ≥ threshold —
    bit-identical output to ``ngram_jaccard_pairs`` with no df cap,
    via prefix filtering. Returns (doc_a, doc_b, jaccard)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = shingles_df(df, id_col, text_col, n)
    gdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    # the global order is the (df, shingle) PAIR itself — no global
    # row_number window (that would be a single-partition sort of the
    # whole vocabulary, the exact scale-killer this tier avoids);
    # array_sort on the struct array orders field-lexicographically,
    # which is the same total order on every doc
    ordered = (
        sh.join(gdf, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__ord")
        )
        .select(id_col, "__ord", F.size("__ord").alias("__sz"))
    )
    # prefix length p = sz - ceil(t*sz) + 1
    p = (
        F.col("__sz")
        - F.ceil(F.col("__sz") * F.lit(float(threshold))).cast("int")
        + F.lit(1)
    )
    docs = ordered.select(
        id_col,
        "__sz",
        # verification set: xxhash64-folded shingles (8-byte compares,
        # same fold as the other tiers)
        F.transform("__ord", lambda s: F.xxhash64(s["shingle"])).alias(
            "__set"
        ),
        F.transform(
            F.slice("__ord", 1, p), lambda s: s["shingle"]
        ).alias("__prefix"),
    ).persist()
    pre = docs.select(F.col(id_col), F.explode("__prefix").alias("__tok"))
    cand = (
        pre.select(F.col(id_col).alias("doc_a"), "__tok")
        .join(pre.select(F.col(id_col).alias("doc_b"), "__tok"), "__tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    scored = (
        cand.join(
            docs.select(
                F.col(id_col).alias("doc_a"),
                F.col("__set").alias("__ra"),
                F.col("__sz").alias("__sa"),
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col(id_col).alias("doc_b"),
                F.col("__set").alias("__rb"),
                F.col("__sz").alias("__sb"),
            ),
            "doc_b",
        )
        # length filter (exactness-preserving prune): J ≤ min/max, so
        # J ≥ t requires min(|A|,|B|) ≥ t·max(|A|,|B|) — reject size-
        # mismatched candidates BEFORE paying the array intersection
        .where(
            F.least("__sa", "__sb")
            >= F.greatest("__sa", "__sb") * F.lit(float(threshold))
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("__ra", "__rb"))
                / (
                    F.col("__sa")
                    + F.col("__sb")
                    - F.size(F.array_intersect("__ra", "__rb"))
                )
            ).alias("jaccard"),
        )
    )
    return scored.where(F.col("jaccard") >= threshold)


def prefix_filter_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """All doc pairs (a < b) with set containment
    C(A,B) = |A∩B| / min(|A|,|B|) ≥ threshold — bit-identical output
    to ``ngram_containment_pairs`` with no df cap, via ASYMMETRIC
    prefix filtering. Returns
    (doc_a, doc_b, containment, n_shingles_a, n_shingles_b).

    Why asymmetric: for containment the required overlap
    α = ⌈t·min(|A|,|B|)⌉ scales with the SMALLER set only, so the
    larger set has no useful own-size prefix bound. Instead the
    SMALLER side probes its rarity-ordered prefix of length
    |A| − ⌈t·|A|⌉ + 1 against a FULL token index of the other side:
    if |A∩B| ≥ ⌈t·|A|⌉ then A has at most |A| − ⌈t·|A|⌉ elements
    outside B, so at least one of its |A| − ⌈t·|A|⌉ + 1 prefix
    elements lies in B — exactness holds with only one side pruned.

    Cost: candidate volume is Σ_token df(token) × prefix_df(token),
    not Σ df². Hot tokens (huge df) almost never appear in a
    rarity-ordered prefix (prefix_df ≈ 0); rare tokens have small df
    — so the product stays bounded where the full posting-list join
    explodes. Pairs of equal size are found from either side and
    deduped.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sh = shingles_df(df, id_col, text_col, n)
    gdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ordered = (
        sh.join(gdf, "shingle")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__ord")
        )
        .select(id_col, "__ord", F.size("__ord").alias("__sz"))
    )
    p = (
        F.col("__sz")
        - F.ceil(F.col("__sz") * F.lit(float(threshold))).cast("int")
        + F.lit(1)
    )
    docs = ordered.select(
        id_col,
        "__sz",
        F.transform("__ord", lambda s: F.xxhash64(s["shingle"])).alias(
            "__set"
        ),
        F.transform(
            F.slice("__ord", 1, p), lambda s: s["shingle"]
        ).alias("__prefix"),
    ).persist()
    # probe side: smaller doc's prefix tokens (folded); index side:
    # ALL tokens (folded full set) — exactness needs the full index
    probe = docs.select(
        F.col(id_col).alias("__pid"),
        F.col("__sz").alias("__psz"),
        F.explode(
            F.transform("__prefix", lambda s: F.xxhash64(s))
        ).alias("__tok"),
    )
    index = docs.select(
        F.col(id_col).alias("__iid"),
        F.col("__sz").alias("__isz"),
        F.explode("__set").alias("__tok"),
    )
    cand = (
        probe.join(index, "__tok")
        .where(
            (F.col("__psz") < F.col("__isz"))
            | (
                (F.col("__psz") == F.col("__isz"))
                & (F.col("__pid") < F.col("__iid"))
            )
        )
        .select(
            F.least("__pid", "__iid").alias("doc_a"),
            F.greatest("__pid", "__iid").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    scored = (
        cand.join(
            docs.select(
                F.col(id_col).alias("doc_a"),
                F.col("__set").alias("__ra"),
                F.col("__sz").alias("__sa"),
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col(id_col).alias("doc_b"),
                F.col("__set").alias("__rb"),
                F.col("__sz").alias("__sb"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("__ra", "__rb"))
                / F.least("__sa", "__sb")
            ).alias("containment"),
            F.col("__sa").alias("n_shingles_a"),
            F.col("__sb").alias("n_shingles_b"),
        )
    )
    return scored.where(F.col("containment") >= threshold)


def prefix_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """One-row audit of what prefix filtering saves: total shingle
    postings vs indexed prefix postings, and the implied index
    fraction — the number that justifies the tier at corpus scale."""
    sh = shingles_df(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    pref = F.col("sz") - F.ceil(F.col("sz") * F.lit(float(threshold))).cast(
        "int"
    ) + F.lit(1)
    return sizes.agg(
        F.sum("sz").cast("bigint").alias("total_postings"),
        F.sum(pref).cast("bigint").alias("prefix_postings"),
        (F.sum(pref) / F.sum("sz")).alias("index_fraction"),
    )
