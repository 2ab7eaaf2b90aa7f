"""Distribution drift and label-noise monitoring: chi-square/PSI/KS/CUSUM/JS-divergence tests, vocabulary shift, and kNN label-noise screening on exact and IVF tiers.

Split from the former single-module queries.py (round 7). The
QUERIES/ORACLES registration contract is unchanged: importing this
module registers its queries with the shared registry.
"""

from __future__ import annotations

from mapreducewordoccurences_spark.queries._shared import *  # noqa: F401,F403

@register(
    "chi2_lang_source",
    """
    WITH cells AS (
      SELECT lang, source, count(*) AS observed
      FROM documents GROUP BY 1, 2
    )
    SELECT lang, source, observed,
           CAST(ROUND(CAST(SUM(observed) OVER (PARTITION BY lang) AS DOUBLE)
                      * SUM(observed) OVER (PARTITION BY source)
                      / SUM(observed) OVER (), 6) AS DOUBLE) AS expected,
           CAST(ROUND(
             (observed - CAST(SUM(observed) OVER (PARTITION BY lang) AS DOUBLE)
                         * SUM(observed) OVER (PARTITION BY source)
                         / SUM(observed) OVER ())
             * (observed - CAST(SUM(observed) OVER (PARTITION BY lang) AS DOUBLE)
                           * SUM(observed) OVER (PARTITION BY source)
                           / SUM(observed) OVER ())
             / (CAST(SUM(observed) OVER (PARTITION BY lang) AS DOUBLE)
                * SUM(observed) OVER (PARTITION BY source)
                / SUM(observed) OVER ()), 6) AS DOUBLE) AS chi2_contrib
    FROM cells
    """,
)
def q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for the lang × source
    contingency table (operators/drift.py chi2_contingency):
    per-cell observed vs expected-under-independence and the (O-E)²/E
    contribution — which segment drifted, not just whether. The only
    data-scale work is the cell count; marginals are windows over the
    cardinality²-bounded cell table."""
    from mapreducewordoccurences_spark.operators.drift import chi2_contingency

    return chi2_contingency(
        _t(spark, sf_dir, "documents"), row_col="lang", col_col="source"
    )


@register(
    "psi_price_drift",
    """
    WITH a AS (
      SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
             count(*) AS na
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    ), b AS (
      SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
             count(*) AS nb
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    ), j AS (
      SELECT COALESCE(a.bucket, b.bucket) AS bucket,
             COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ), terms AS (
      SELECT na, nb,
             CAST(trunc(
               (greatest(na / SUM(na) OVER (), 1e-6)
                - greatest(nb / SUM(nb) OVER (), 1e-6))
               * ln(greatest(na / SUM(na) OVER (), 1e-6)
                    / greatest(nb / SUM(nb) OVER (), 1e-6)) * 1e8
             ) AS BIGINT) AS term_fp
      FROM j
    )
    SELECT SUM(term_fp) / 1e8 AS psi,
           count(*) AS n_buckets,
           SUM(na) AS n_a,
           SUM(nb) AS n_b
    FROM terms
    """,
)
def q_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between finished ('F') and open
    ('O') orders' price distributions (operators/drift.py psi) — THE
    industry drift gate between scoring batches (<0.1 stable, >0.25
    major shift). Two bucketed counts at data scale; all PSI terms
    live on the range/width-bounded bucket axis, truncated to 1e-8
    fixed point before an order-free integer sum."""
    from mapreducewordoccurences_spark.operators.drift import psi

    orders = _t(spark, sf_dir, "orders")
    return psi(
        orders.where(F.col("o_orderstatus") == "F"),
        orders.where(F.col("o_orderstatus") == "O"),
        value_col="o_totalprice",
        bucket_width=25000.0,
    )


@register(
    "ks_price_drift",
    """
    WITH a AS (
      SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
             count(*) AS na
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    ), b AS (
      SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
             count(*) AS nb
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    ), j AS (
      SELECT COALESCE(a.bucket, b.bucket) AS bucket,
             COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ), ecdf AS (
      SELECT bucket, na, nb,
             abs(SUM(na) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                   / SUM(na) OVER ()
                 - SUM(nb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                   / SUM(nb) OVER ()) AS d
      FROM j
    )
    SELECT CAST(ROUND(max(d), 6) AS DOUBLE) AS ks_stat,
           min(CASE WHEN d = (SELECT max(d) FROM ecdf) THEN bucket END)
             AS at_bucket,
           SUM(na) AS n_a,
           SUM(nb) AS n_b
    FROM ecdf
    """,
)
def q_ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-ECDF Kolmogorov-Smirnov distance between the two order
    populations (operators/drift.py ks_grid): classical exact KS
    needs BOTH samples globally sorted — a non-starter at 100 TB —
    so the ECDFs are evaluated on a fixed bucket grid and the
    cumulative pass is a window over the range/width-bounded bucket
    axis. Discretization error ≤ the largest single-bucket mass."""
    from mapreducewordoccurences_spark.operators.drift import ks_grid

    orders = _t(spark, sf_dir, "orders")
    return ks_grid(
        orders.where(F.col("o_orderstatus") == "F"),
        orders.where(F.col("o_orderstatus") == "O"),
        value_col="o_totalprice",
        bucket_width=10000.0,
    )


@register(
    "cusum_daily_value_shift",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(round(value * 10000) AS BIGINT)) AS x_fp
      FROM events GROUP BY 1
    ), c AS (
      SELECT day, x_fp,
             count(*) OVER () AS n,
             SUM(x_fp) OVER () AS total
      FROM daily
    ), p AS (
      -- deviations scaled by n so the mean subtraction stays integral:
      -- d = n*x - total  (exact; no mean rounding anywhere)
      SELECT day,
             SUM(n * x_fp - total) OVER (ORDER BY day
                                         ROWS UNBOUNDED PRECEDING) AS pref,
             n
      FROM c
    ), s AS (
      -- one-sided CUSUM via the prefix identity:
      -- S_t = max(0, S_{t-1} + d_t) = P_t - min(0, min_{j<=t} P_j)
      SELECT day,
             pref - least(CAST(0 AS BIGINT),
                          min(pref) OVER (ORDER BY day
                                          ROWS UNBOUNDED PRECEDING))
               AS cusum_fp,
             n
      FROM p
    )
    SELECT day, cusum_fp,
           -- alarm: cusum > 3·sd_pop·n, compared in SQUARES so the
           -- whole predicate is exact integer arithmetic (HUGEINT):
           -- cusum² > 9·n²·var = 9·(n·Σx² − (Σx)²). No libm stddev,
           -- no float truncation → bit-portable across engines.
           CAST(cusum_fp AS HUGEINT) * cusum_fp >
             9 * (SELECT max(n) * SUM(CAST(x_fp AS HUGEINT) * x_fp)
                         - SUM(CAST(x_fp AS HUGEINT)) * SUM(CAST(x_fp AS HUGEINT))
                  FROM c) AS alarm
    FROM s
    """,
)
def q_cusum_daily_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily value series — the
    sequential-analysis complement to the distributional drift family
    (PSI/KS/chi² catch WHAT shifted; CUSUM catches WHEN a persistent
    mean shift began). The recursion S_t = max(0, S_{t-1} + d_t) is
    not a plain window aggregate, but the classic identity
    S_t = P_t − min(0, min_{j≤t} P_j) over prefix sums P makes it two
    running windows — no iterative driver loop. ALL arithmetic is
    exact integer: values fix-point at 1e-4, deviations scale by n
    (d = n·x − Σx) so the mean never rounds, and the 3σ alarm is
    compared in SQUARES — cusum² > 9·(n·Σx² − (Σx)²) — so even the
    population variance stays integral (decimal(38,0) on the Spark
    side, HUGEINT in the oracle; magnitudes ≤ ~1e29 at any plausible
    day count, well inside both). No libm stddev/sqrt anywhere →
    bit-portable and immune to one-ulp truncation flips. Day axis is
    one global ordered window over the DAILY aggregate (days ≪
    events — bounded)."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.select(
            (ts_micros(events, "ts") / F.lit(86400000000)).cast("long").alias("day"),
            F.expr("CAST(round(value * 10000) AS BIGINT)").alias("v_fp"),
        )
        .groupBy("day")
        .agg(F.sum("v_fp").alias("x_fp"))
    )
    # bounded axis: calendar days (the DAILY aggregate, ≪ events)
    wall = Window.partitionBy()
    c = daily.select(
        "day",
        "x_fp",
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x_fp").over(wall).alias("total"),
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = c.select(
        "day",
        F.sum(F.col("n") * F.col("x_fp") - F.col("total")).over(wrun).alias("pref"),
        "n",
        "x_fp",
    )
    s = p.select(
        "day",
        (
            F.col("pref")
            - F.least(F.lit(0).cast("bigint"), F.min("pref").over(wrun))
        ).alias("cusum_fp"),
        "n",
        "x_fp",
    )
    xdec = F.col("x_fp").cast("decimal(38,0)")
    thresh = daily.agg(
        (
            F.lit(9).cast("decimal(38,0)")
            * (
                F.count(F.lit(1)) * F.sum(xdec * xdec)
                - F.sum(xdec) * F.sum(xdec)
            )
        ).alias("h9")
    )
    cdec = F.col("cusum_fp").cast("decimal(38,0)")
    return s.crossJoin(F.broadcast(thresh)).select(
        "day", "cusum_fp", (cdec * cdec > F.col("h9")).alias("alarm")
    )


@register(
    "label_noise_knn_disagreement",
    """
    WITH nn AS (
      SELECT q.vec_id AS query_id, q.label AS q_label,
             e.label AS n_label,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
                        e.vec_id) AS rnk
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 50
    )
    SELECT query_id, q_label AS label,
           count(CASE WHEN n_label <> q_label THEN 1 END) AS n_disagree,
           count(CASE WHEN n_label <> q_label THEN 1 END) * 1.0 / 5
             AS disagreement
    FROM nn WHERE rnk <= 5
    GROUP BY query_id, q_label
    """,
)
def q_label_noise_knn_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screening via kNN disagreement — a standard
    training-data QA pass (Confident Learning's cheap cousin): for
    each probe vector, the share of its 5 nearest neighbors (cosine)
    carrying a DIFFERENT label; points whose neighborhoods
    consistently disagree are mislabel candidates for human review.
    Reuses the brute-force kNN probe tier (rank order is float-stable
    on random embeddings; output is ids + integer counts + one
    int/int divide, all portable). 50 probes here; the scale path is
    ``label_noise_knn_ivf``, which feeds the same disagreement
    aggregate from the IVF tier and is acceptance-gated against this
    row's scores."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)
    nn = brute_force_knn(emb, queries, k=5)
    labeled = (
        nn.join(
            emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")),
            "query_id",
        )
        .join(
            emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")),
            "neighbor_id",
        )
    )
    return labeled.groupBy("query_id", F.col("q_label").alias("label")).agg(
        F.count(F.when(F.col("n_label") != F.col("q_label"), 1)).alias("n_disagree"),
        (
            F.count(F.when(F.col("n_label") != F.col("q_label"), 1)) * 1.0 / 5
        ).alias("disagreement"),
    )


@register(
    "label_noise_knn_ivf",
    # acceptance-row oracle (sketch-tier protocol): the exact probe
    # count is hash-matched; the booleans must come back TRUE.
    """
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           TRUE AS flag_agreement_ok, TRUE AS mad_ok
    FROM embeddings WHERE vec_id < 50
    """,
)
def q_label_noise_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screening on the IVF ANN tier — the full-corpus
    scale path the brute-force row points at: the same 5-NN
    disagreement aggregate, but neighbors come from ``ivf_knn``
    (k-means cells, nprobe/nlist of the corpus touched per probe;
    functions/similarity.py documents the persisted-index layout at
    real scale).

    Acceptance contract: the review-flag decision (disagreement ≥
    0.6) must AGREE with the brute-force tier on ≥ 0.9 of the
    50-probe panel, and the mean |Δ disagreement| must be ≤ 0.15
    (observed: agreement 0.98-1.0 and mean |Δ| ≈ 0.06 at every
    tested sf, nlist=16/nprobe=4 — the downstream label statistic is
    far more stable than raw neighbor recall, which is the point of
    gating the metric, not the neighbor sets). Runs both tiers; the
    oracle hash-matches the exact probe count and the two acceptance
    booleans."""
    from mapreducewordoccurences_spark.functions.similarity import ivf_knn

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 50)

    def per_probe(nn: DataFrame, out: str) -> DataFrame:
        labeled = nn.join(
            emb.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
            ),
            "query_id",
        ).join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
            ),
            "neighbor_id",
        )
        # divide by the ACTUAL neighbor count, not a hard-coded k:
        # an IVF probe whose nprobe cells hold < k other vectors
        # returns fewer neighbors, and a fixed denominator would
        # silently deflate its disagreement (ADVICE r6)
        return labeled.groupBy("query_id").agg(
            (
                F.count(F.when(F.col("n_label") != F.col("q_label"), 1))
                / F.count(F.lit(1))
            ).alias(out)
        )

    bf = per_probe(brute_force_knn(emb, queries, k=5), "d_bf")
    ivf = per_probe(ivf_knn(emb, queries, k=5, nlist=16, nprobe=4), "d_ivf")
    # anchor on the probe set and LEFT-join both tiers: a probe with
    # zero IVF neighbors keeps its row (n_probes stays hash-exact)
    # and its coalesced d_ivf = -1 fails the flag comparison — the
    # failure surfaces in the gated boolean, not as an opaque count
    # mismatch (ADVICE r6)
    j = (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(bf, "query_id", "left")
        .join(ivf, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("d_bf", F.lit(-1.0)).alias("d_bf"),
            F.coalesce("d_ivf", F.lit(-1.0)).alias("d_ivf"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_probes"),
        (
            F.avg(
                (
                    ((F.col("d_bf") >= 0.6) == (F.col("d_ivf") >= 0.6))
                    & (F.col("d_ivf") >= 0)
                    & (F.col("d_bf") >= 0)
                ).cast("double")
            )
            >= 0.9
        ).alias("flag_agreement_ok"),
        (F.avg(F.abs(F.col("d_bf") - F.col("d_ivf"))) <= 0.15).alias("mad_ok"),
    )


@register(
    "vocab_shift_js_divergence",
    """
    WITH toks AS (
      SELECT CAST(substr(source, 4) AS INT) < 10 AS side_a,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents
    ), a AS (
      SELECT word, count(*) AS na FROM toks WHERE side_a GROUP BY word
    ), b AS (
      SELECT word, count(*) AS nb FROM toks WHERE NOT side_a GROUP BY word
    ), j AS (
      SELECT COALESCE(a.word, b.word) AS word,
             COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
      FROM a FULL OUTER JOIN b ON a.word = b.word
    ), tot AS (
      SELECT SUM(na) AS ta, SUM(nb) AS tb FROM j
    ), terms AS (
      SELECT na, nb,
             CAST(trunc((
               CASE WHEN na > 0 THEN
                 0.5 * (na / ta)
                     * ln((na / ta)
                          / (0.5 * (na / ta) + 0.5 * (nb / tb)))
               ELSE 0 END
               +
               CASE WHEN nb > 0 THEN
                 0.5 * (nb / tb)
                     * ln((nb / tb)
                          / (0.5 * (na / ta) + 0.5 * (nb / tb)))
               ELSE 0 END) * 1e6) AS BIGINT) AS term_fp
      FROM j, tot
    )
    SELECT SUM(term_fp) / 1e6 AS js_divergence,
           count(*) AS vocab_size,
           SUM(na) AS n_tokens_a,
           SUM(nb) AS n_tokens_b
    FROM terms
    """,
)
def q_vocab_shift_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-distribution shift between two corpus halves
    (sources src0-9 vs src10-19) as Jensen-Shannon divergence — the
    TEXT-drift gate next to the numeric family (PSI/KS monitor value
    columns; JS over token distributions answers 'did the language
    itself move', bounded in [0, ln 2], symmetric, zero-safe without
    smoothing because p·ln(p/m) → 0). Token terms follow the drift
    family's portability protocol: exact int ratios, per-term trunc
    to fixed point, order-free integer sum; the grain is 1e-6 —
    coarse enough that a one-ulp libm difference between engines'
    ln() can't plausibly straddle a truncation boundary, fine enough
    for a drift metric bounded by ln 2.

    Scale design: corpus token totals come from a plain two-value
    ``agg`` broadcast-crossJoined back onto the vocabulary — NOT an
    unpartitioned window, which would funnel the full vocabulary
    (10⁸-10⁹ rows web-scale, hapax-heavy) through one partition's
    sort. Per-term math is embarrassingly parallel; the only
    full-data shuffles are the two word-count groupBys."""
    from mapreducewordoccurences_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        (F.substring("source", 4, 10).cast("int") < 10).alias("side_a"),
        F.explode(tokens("text", lowercase=True)).alias("word"),
    )
    a = toks.where("side_a").groupBy("word").agg(F.count(F.lit(1)).alias("na"))
    b = toks.where("NOT side_a").groupBy("word").agg(F.count(F.lit(1)).alias("nb"))
    j = (
        a.join(b, "word", "full_outer")
        .select(
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    tot = j.agg(F.sum("na").alias("__ta"), F.sum("nb").alias("__tb"))
    jt = j.crossJoin(F.broadcast(tot))
    pa = F.col("na") / F.col("__ta")
    pb = F.col("nb") / F.col("__tb")
    m = 0.5 * pa + 0.5 * pb
    term = (
        F.when(F.col("na") > 0, 0.5 * pa * F.log(pa / m)).otherwise(F.lit(0.0))
        + F.when(F.col("nb") > 0, 0.5 * pb * F.log(pb / m)).otherwise(F.lit(0.0))
    )
    # cast("bigint") truncates toward zero ≡ the oracle's trunc; every
    # JS term is a KL(·||M) contribution ≥ 0, so no sign subtleties
    terms = jt.select(
        "na",
        "nb",
        (term * F.lit(1e6)).cast("bigint").alias("term_fp"),
    )
    return terms.agg(
        (F.sum("term_fp") / F.lit(1e6)).alias("js_divergence"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("na").alias("n_tokens_a"),
        F.sum("nb").alias("n_tokens_b"),
    )
