"""Distribution-drift detection: chi-square contingency, Population
Stability Index, and grid-ECDF Kolmogorov-Smirnov — the monitoring
layer a production data pipeline runs between ingest batches ("did
this week's crawl shift against last week's?") and between
train/serve populations.

No reference counterpart (the reference is a word-count CLI). Scale
design shared by all three: the only data-scale work is ONE grouped
count per operator (categorical cells or fixed-width numeric
buckets); every statistic is then computed on the group-bounded
aggregate — cells ∝ cardinality², buckets ∝ range/width, both
independent of row count. Classical exact KS needs a global sort of
both samples (a non-starter at 100 TB); the grid-ECDF variant
trades a bounded discretization error (≤ bucket mass) for a
shuffle-free cumulative pass over the bucket axis.

Determinism protocol (the engine-wide rule): counts are exact
integers; per-cell float contributions are truncated to fixed point
BEFORE the final sum, so the total is an order-free integer sum; a
single closing divide rescales. Cross-engine oracles mirror the same
truncations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi2_contingency(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square cell contributions for a two-way
    contingency table: per (row, col), the observed count, the
    expected count under independence (row_tot · col_tot / N), and
    the (O-E)²/E contribution (both rounded to 6).

    One shuffle (the cell count); marginals come from windows over
    the cell aggregate, never from re-scanning the data. Σ contrib
    vs the chi²(dof) critical value is the independence test; the
    per-cell view is returned because the CELLS are what an
    investigation needs (which segment drifted).
    """
    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("observed"))
    wr = Window.partitionBy(row_col)
    wc = Window.partitionBy(col_col)
    wn = Window.partitionBy()
    # cast before the product: long·long marginal products overflow
    # int64 around N ≈ 3·10⁹ rows; double holds exact counts to 2⁵³
    expected = (
        F.sum("observed").over(wr).cast("double")
        * F.sum("observed").over(wc)
        / F.sum("observed").over(wn)
    )
    contrib = (F.col("observed") - expected) * (
        F.col("observed") - expected
    ) / expected
    return cells.select(
        row_col,
        col_col,
        "observed",
        F.round(expected, 6).alias("expected"),
        F.round(contrib, 6).alias("chi2_contrib"),
    )


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bucket_width: float,
    floor_p: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric
    column over fixed-width buckets:
    PSI = Σ_i (p_i - q_i) · ln(p_i / q_i), with shares floored at
    ``floor_p`` (the standard guard — an empty bucket on one side
    would otherwise send the term to ±∞).

    Returns ONE row: (psi, n_buckets, n_a, n_b). Rule-of-thumb
    thresholds: <0.1 stable, 0.1-0.25 moderate shift, >0.25 major.

    Each side pays one bucketed count; the union of buckets is
    range/width-sized. Per-bucket terms are truncated at 1e-8 fixed
    point and integer-summed — order-free, engine-portable.
    """
    return psi_from_bucket_counts(
        bucket_counts(df_a, value_col, bucket_width, "na"),
        bucket_counts(df_b, value_col, bucket_width, "nb"),
        floor_p=floor_p,
    )


def bucket_counts(
    df: DataFrame, value_col: str, bucket_width: float, name: str = "n"
) -> DataFrame:
    """Fixed-width bucket histogram (bucket, count) — the one
    data-scale pass every drift statistic starts from. Freeze this
    for a reference population (write it out at train time) and the
    serving-side comparison never rescans training data."""
    return (
        df.select(
            F.floor(F.col(value_col) / bucket_width).cast("bigint").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(name))
    )


def psi_from_bucket_counts(
    a: DataFrame,
    b: DataFrame,
    floor_p: float = 1e-6,
) -> DataFrame:
    """PSI from two (bucket, count) histograms — the recombination
    half of ``psi``, exposed so a streaming monitor can score each
    micro-batch against a FROZEN reference histogram without
    re-bucketing the reference (streaming/drift_monitor.py)."""
    # Contract: each input is exactly (bucket, count), bucket FIRST —
    # asserted here because the rename below is positional. Positional
    # (not by-name) because resolving count columns by name breaks
    # when both histograms carry the same count name — e.g. two
    # bucket_counts() outputs with the default "n" — making the name
    # ambiguous after the full_outer join (AMBIGUOUS_REFERENCE). A
    # swapped column order would silently bind counts as buckets, so
    # reject anything that isn't the documented two-column shape.
    for side, df_ in (("a", a), ("b", b)):
        if len(df_.columns) != 2 or df_.columns[0].lower() != "bucket":
            raise ValueError(
                "psi_from_bucket_counts expects (bucket, count) with "
                f"'bucket' first; side {side} has columns {df_.columns}"
            )
    a = a.toDF("bucket", "na")
    b = b.toDF("bucket", "nb")
    joined = a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    w = Window.partitionBy()
    p = F.greatest(F.col("na") / F.sum("na").over(w), F.lit(float(floor_p)))
    q = F.greatest(F.col("nb") / F.sum("nb").over(w), F.lit(float(floor_p)))
    term = (p - q) * F.log(p / q)
    per_bucket = joined.select("na", "nb", term.alias("term")).select(
        "na", "nb", F.expr("CAST(term * 1e8 AS BIGINT)").alias("term_fp")
    )
    return per_bucket.agg(
        (F.sum("term_fp") / F.lit(1e8)).alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
    )


def ks_grid(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bucket_width: float,
) -> DataFrame:
    """Kolmogorov-Smirnov distance between two samples on a fixed
    bucket grid: D = max_i |ECDF_a(i) - ECDF_b(i)| evaluated at
    bucket upper edges. Exact KS needs both samples globally sorted;
    on the grid the cumulative pass is a window over the BUCKET AXIS
    (range/width rows), so nothing data-scale ever sorts. The
    discretization error is bounded by the largest single-bucket
    mass.

    Returns ONE row: (ks_stat rounded to 6, at_bucket = the lowest
    bucket achieving the max, n_a, n_b).
    """
    def bucketed(d: DataFrame, name: str) -> DataFrame:
        return d.select(
            F.floor(F.col(value_col) / bucket_width).cast("bigint").alias("bucket")
        ).groupBy("bucket").agg(F.count(F.lit(1)).alias(name))

    joined = (
        bucketed(df_a, "na")
        .join(bucketed(df_b, "nb"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    wcum = (
        Window.partitionBy()
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy()
    ecdf = joined.select(
        "bucket",
        "na",
        "nb",
        (F.sum("na").over(wcum) / F.sum("na").over(wtot)).alias("fa"),
        (F.sum("nb").over(wcum) / F.sum("nb").over(wtot)).alias("fb"),
    )
    diff = F.abs(F.col("fa") - F.col("fb"))
    return ecdf.select(
        "na", "nb", "bucket", diff.alias("d")
    ).agg(
        F.round(F.max("d"), 6).alias("ks_stat"),
        F.min_by(F.col("bucket"), F.struct((-F.col("d")).alias("nd"), "bucket")).alias(
            "at_bucket"
        ),
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
    )
