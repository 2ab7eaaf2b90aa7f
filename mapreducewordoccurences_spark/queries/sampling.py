"""Dataset assembly: deterministic hash splits, stratified/curriculum sampling, token-budget mixing, sequence packing, shard layout, and leakage audits.

Split from the former single-module queries.py (round 7). The
QUERIES/ORACLES registration contract is unchanged: importing this
module registers its queries with the shared registry.
"""

from __future__ import annotations

from mapreducewordoccurences_spark.queries._shared import *  # noqa: F401,F403

@register(
    "dataset_split_counts",
    # md5-hex bucket (engine-portable) → cumulative integer thresholds
    # over 65536: train <58982, val <62259, test otherwise. Same-row →
    # same-split on every engine and every run (functions/sampling.py).
    """
    WITH b AS (
      SELECT lang,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 58982 THEN 'train'
                WHEN bucket < 62259 THEN 'val'
                ELSE 'test' END AS split,
           lang, count(*) AS n_docs
    FROM b GROUP BY 1, 2
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split — reproducible across
    runs and engines (no rand()), pure projection before the count."""
    from mapreducewordoccurences_spark.functions.sampling import hash_split

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return hash_split(docs).groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "shuffled_shard_head",
    """
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents ORDER BY shuffle_key LIMIT 100
    """,
)
def q_shuffled_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffling for training shards: total order
    by md5(id). Top-100 compiles to TakeOrderedAndProject — no global
    sort materialization."""
    from mapreducewordoccurences_spark.functions.sampling import (
        deterministic_shuffle_key,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.select("doc_id", deterministic_shuffle_key("doc_id").alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(100)
    )


@register(
    "deterministic_sample_documents",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
          % 100 < 10
    """,
)
def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample by hashing the key — the at-scale
    sampling idiom. ``df.sample(seed)`` depends on partitioning (AQE
    replans, file splits, cluster size all change the rows); hashing
    the primary key gives the SAME sample on any engine, any layout,
    any day — which is what an eval-set extraction needs. md5 here
    (not xxhash64) because the sample must be portable across engines
    by construction."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int") % 100
    return docs.where(bucket < 10).select("doc_id", "lang", "n_chars")


@register(
    "source_mix_weights",
    """
    WITH per AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS t, count(*) AS ns FROM per
    )
    SELECT source, n_docs, n_tokens,
           n_tokens / t AS token_share,
           (t / ns) / n_tokens AS mix_weight
    FROM per, tot
    """,
)
def q_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and uniform-mixture sampling weights
    (functions/sampling.py source_mix_weights)."""
    from mapreducewordoccurences_spark.functions.sampling import source_mix_weights

    return source_mix_weights(_t(spark, sf_dir, "documents"))


@register(
    "resample_user_value_hourly",
    """
    WITH obs AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, MAX(value) AS v
      FROM events GROUP BY 1, 2
    ), axis AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS bucket
      FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
            FROM obs GROUP BY user_id)
    )
    SELECT a.user_id, a.bucket, o.v,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY a.user_id ORDER BY a.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM axis a LEFT JOIN obs o USING (user_id, bucket)
    """,
)
def q_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + forward fill per user: dense bucket axis
    between each user's first/last event, gaps carry the last observed
    hourly max (operators/timeseries.py resample_with_gap_fill)."""
    from mapreducewordoccurences_spark.operators.timeseries import (
        resample_with_gap_fill,
    )

    return resample_with_gap_fill(_t(spark, sf_dir, "events"))


@register(
    "pps_sample_documents",
    # weighted systematic sampling: every quantity integer (exact
    # window cumsum, integer division) — no transcendental ranking key
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS w,
             md5(concat('pps', CAST(doc_id AS VARCHAR))) AS ok
      FROM documents
    ), c AS (
      SELECT *,
             sum(w) OVER (PARTITION BY source ORDER BY ok, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY source) AS tw
      FROM t
    )
    SELECT doc_id, source, CAST(w AS INT) AS n_tokens
    FROM c
    WHERE (cw // ((tw + 7) // 8)) > ((cw - w) // ((tw + 7) // 8))
    """,
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (token-proportional) systematic sample, ~8 docs per
    source (functions/sampling.py pps_systematic_sample): long
    documents are proportionally likelier, selection is deterministic
    in the md5 shuffle order, and every step is integer-exact."""
    from mapreducewordoccurences_spark.functions.sampling import (
        pps_systematic_sample,
    )
    from mapreducewordoccurences_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    return pps_systematic_sample(
        docs, "n_tokens", n_target=8, group_col="source", id_col="doc_id"
    )


@register(
    "pareto_price_buckets",
    """
    WITH hist AS (
      SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
             count(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS rev
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(rev) AS DOUBLE) AS trev, SUM(n_orders) AS tn FROM hist
    )
    SELECT bucket, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / tot.trev AS rev_share,
           CAST(SUM(rev) OVER (ORDER BY bucket DESC
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / tot.trev AS cum_rev_share_from_top,
           CAST(SUM(n_orders) OVER (ORDER BY bucket DESC
                                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / tot.tn AS cum_order_share_from_top
    FROM hist CROSS JOIN tot
    """,
)
def q_pareto_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto) curve on the price-bucket axis:
    walking buckets from the top, what share of revenue do the top
    x% of orders carry? The classical version ranks every order
    (global sort); the bucket-grid version is exact per bucket and
    all cumulative work runs on the range/width-bounded axis.
    Cumulative sums stay DECIMAL (exact) until the closing share
    divides, so window-evaluation order can't flip a bit."""
    orders = _t(spark, sf_dir, "orders")
    hist = orders.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,4)")).alias("rev"),
    )
    tot = hist.agg(
        F.sum("rev").cast("double").alias("trev"),
        F.sum("n_orders").alias("tn"),
    )
    # bounded axis: price buckets (fixed bucket width over a bounded
    # price domain → hundreds of rows regardless of order volume)
    wtop = (
        Window.partitionBy()
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.col("trev")).alias("rev_share"),
        (F.sum("rev").over(wtop).cast("double") / F.col("trev")).alias(
            "cum_rev_share_from_top"
        ),
        (F.sum("n_orders").over(wtop).cast("double") / F.col("tn")).alias(
            "cum_order_share_from_top"
        ),
    )


@register(
    "padding_waste_by_bucket",
    """
    WITH toks AS (
      SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok
      FROM documents
    ), b AS (
      SELECT n_tok, CAST(n_tok // 32 AS BIGINT) AS bucket FROM toks
    )
    SELECT bucket,
           count(*) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS bucket_max_tokens,
           CAST(count(*) * max(n_tok) - SUM(n_tok) AS BIGINT)
             AS padding_tokens,
           CAST(count(*) * max(n_tok) AS BIGINT) AS padded_total_tokens
    FROM b GROUP BY bucket
    """,
)
def q_padding_waste_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: group documents into 32-token
    length buckets and measure the padding a per-bucket-max batching
    scheme wastes — the number a training-data engineer uses to pick
    bucket boundaries (uniform batching pads everything to the global
    max; bucketing trades a shuffle for mostly-dense batches). One
    token-count projection, one bucket groupBy — padding falls out of
    the aggregate identity n·max(n_tok) − Σ n_tok, no second pass."""
    from mapreducewordoccurences_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        F.size(tokens("text", lowercase=True)).alias("n_tok")
    ).select("n_tok", F.expr("CAST(n_tok div 32 AS BIGINT)").alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tok").cast("bigint").alias("bucket_max_tokens"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("bigint")
        .alias("padding_tokens"),
        (F.count(F.lit(1)) * F.max("n_tok")).cast("bigint").alias(
            "padded_total_tokens"
        ),
    )


@register(
    "group_split_leakage_audit",
    _EXACT_PAIRS_CTE.format(thr=0.7)
    + _GROUP_SPLIT_SQL
    + """
    , pairsplit AS (
      SELECT a.split AS sa, b.split AS sb
      FROM exact JOIN splits a ON exact.doc_a = a.doc_id
                 JOIN splits b ON exact.doc_b = b.doc_id
    )
    SELECT
      (SELECT count(*) FROM splits WHERE split = 'train') AS n_train,
      (SELECT count(*) FROM splits WHERE split = 'val') AS n_val,
      (SELECT count(*) FROM splits WHERE split = 'test') AS n_test,
      (SELECT count(DISTINCT source) FROM splits) AS n_sources,
      (SELECT count(*) FROM (
         SELECT source FROM splits
         GROUP BY source HAVING count(DISTINCT split) > 1)
      ) AS n_group_violations,
      (SELECT count(*) FROM pairsplit) AS n_near_dup_pairs,
      (SELECT count(*) FROM pairsplit WHERE sa <> sb) AS n_cross_split_pairs
    """,
)
def q_group_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test split + eval-leakage audit — the
    split discipline a training pipeline actually needs: splitting by
    document id leaks a source's boilerplate and near-duplicate pages
    across the eval boundary; splitting by the GROUP key (source)
    guarantees no group straddles splits (audited to 0 here), and the
    residual risk — near-duplicate pairs (shingle Jaccard >= 0.7)
    whose endpoints landed in DIFFERENT splits — is counted
    explicitly as the metric eval-decontamination teams review.

    Scale: split assignment is a pure md5 projection (no shuffle,
    engine-portable — functions/sampling.py); the audit reuses the
    uncapped posting-list pair generation (dedup/ngram.py), already
    linear-by-banding; the split labels join onto pairs as two
    id-keyed equi-joins. The one-row output aggregates via broadcast
    crossJoins of three bounded aggregates."""
    from mapreducewordoccurences_spark.functions.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    splits = hash_split(
        docs.select("doc_id", "source"),
        id_col="source",
        weights=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        salt="grp",
    )
    split_counts = splits.agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
        F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
        F.count_distinct("source").alias("n_sources"),
    )
    violations = (
        splits.groupBy("source")
        .agg(F.count_distinct("split").alias("k"))
        .agg(F.count(F.when(F.col("k") > 1, 1)).alias("n_group_violations"))
    )
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.7)
    labeled = pairs.join(
        splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
        "doc_a",
    ).join(
        splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
        "doc_b",
    )
    leak = labeled.agg(
        F.count(F.lit(1)).alias("n_near_dup_pairs"),
        F.count(F.when(F.col("sa") != F.col("sb"), 1)).alias(
            "n_cross_split_pairs"
        ),
    )
    return split_counts.crossJoin(F.broadcast(violations)).crossJoin(
        F.broadcast(leak)
    )


@register(
    "sequence_packing_stats",
    """
    WITH toks AS (
      SELECT source, doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok
      FROM documents
    ), placed AS (
      SELECT source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST((sum(n_tok) + 511) // 512 AS BIGINT) AS n_chunks,
           CAST((sum(n_tok) + 511) // 512 * 512 - sum(n_tok) AS BIGINT)
             AS waste_tokens,
           sum(n_tok) * 1.0 / ((sum(n_tok) + 511) // 512 * 512) AS fill_rate,
           CAST(count(*) FILTER (WHERE n_tok > 0 AND
                  (cum - n_tok) // 512 <> (cum - 1) // 512) AS BIGINT)
             AS n_straddling_docs
    FROM placed GROUP BY source
    """,
)
def q_sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing audit for LLM pretraining: per source, pack
    the corpus concat-then-chunk style (concatenate token streams in
    deterministic doc_id order, cut every 512 tokens — the standard
    pretraining packing) and report chunks, tail waste, fill rate,
    and how many documents straddle a chunk boundary (the
    attention-contamination statistic packing-with-masking papers
    track).

    Scale: token counts are a scan-side projection; the prefix sum is
    a window partitioned BY SOURCE — the packing axis itself, so the
    sort is per-source and parallel across sources. A single
    pathological mega-source would serialize its own prefix sum (any
    engine's sequential-concat semantics does); shard such sources
    upstream (split_thresholds on a finer key) if packing order
    within the source is not semantic. fill_rate is one int/int
    divide (deterministic IEEE)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    placed = toks.select(
        "source",
        "n_tok",
        F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    chunks = F.expr("(sum(n_tok) + 511) div 512")
    return placed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        chunks.alias("n_chunks"),
        (chunks * 512 - F.sum("n_tok")).alias("waste_tokens"),
        (F.sum("n_tok") * F.lit(1.0) / (chunks * 512)).alias("fill_rate"),
        F.count(
            F.when(
                (F.col("n_tok") > 0)
                & (
                    F.expr("(cum - n_tok) div 512")
                    != F.expr("(cum - 1) div 512")
                ),
                1,
            )
        ).alias("n_straddling_docs"),
    )


@register(
    "dsir_importance_weights",
    # mirrors functions/sampling.py dsir_log_weights bit-for-bit:
    # portable md5-low-60-bit gram hash, add-1 smoothing over 10k
    # buckets, per-bucket log-ratio truncated toward zero at 1e-6
    # into BIGINT, order-free integer sum per doc (the drift family's
    # fixed-point portability protocol).
    """
    WITH tok AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS s
      FROM documents
    ), grams AS (
      SELECT doc_id, source, unnest(s) AS g FROM tok
      UNION ALL
      SELECT doc_id, source,
             unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
      FROM tok WHERE len(s) >= 2
    ), feats AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) % 10000 AS b
      FROM grams
    ), rc AS (
      SELECT b, count(*) AS cr FROM feats GROUP BY b
    ), tc AS (
      SELECT b, count(*) AS ct FROM feats WHERE source = 'src0' GROUP BY b
    ), tot AS (
      SELECT (SELECT SUM(cr) FROM rc) AS r, (SELECT SUM(ct) FROM tc) AS t
    ), ratio AS (
      SELECT rc.b,
             CAST(trunc((ln((COALESCE(tc.ct, 0) + 1.0) / (t + 10000.0))
                       - ln((rc.cr + 1.0) / (r + 10000.0))) * 1e6) AS BIGINT)
               AS lr_fp
      FROM rc LEFT JOIN tc ON rc.b = tc.b, tot
    )
    SELECT f.doc_id,
           SUM(lr_fp) / 1e6 AS dsir_logw,
           count(*) AS n_grams
    FROM feats f JOIN ratio ON f.b = ratio.b
    GROUP BY 1
    """,
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): score every
    document by the log-likelihood ratio of a hashed-unigram+bigram
    model of the TARGET distribution (source 'src0' stands in for the
    high-quality corpus) against the raw-pool model — the importance
    weight a web-scale pretraining pipeline resamples by. Exact
    oracle via the fixed-point protocol; see
    functions/sampling.py dsir_log_weights for the scale shape
    (two combinable count passes, broadcast ratio table, no text
    shuffle)."""
    from mapreducewordoccurences_spark.functions.sampling import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs,
        target_cond=F.col("source") == "src0",
        buckets=10_000,
        lam=1.0,
        portable=True,
    )


@register(
    "contribution_cap_per_source",
    # deterministic hash-order cap: same md5(doc_id) ordering both
    # engines, so the KEPT SET is identical, not just its size
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           count(*) FILTER (WHERE rn <= 20) AS n_kept,
           CAST(sum(CASE WHEN rn <= 20 THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_sum
    FROM ranked GROUP BY source
    """,
)
def q_contribution_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution capping (C4 per-URL / Llama per-domain bounding):
    at most 20 documents per source, chosen by deterministic hash
    order so the kept set is append-stable and engine-portable. The
    kept_id_sum column makes the oracle check the exact KEPT SET, not
    just its cardinality. Plan: one source-keyed shuffle; the rank
    filter lowers to WindowGroupLimit so heavy sources forward at
    most cap rows per map task (functions/sampling.py cap_per_key)."""
    from mapreducewordoccurences_spark.functions.sampling import cap_per_key

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = (
        cap_per_key(docs, "source", 20)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
        )
    )
    # both sides are per-source aggregates (enum-sized); the fact table
    # shuffles once, inside the cap
    return totals.join(kept, "source")
