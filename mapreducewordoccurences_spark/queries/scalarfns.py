"""Scalar-function surfaces and corpus-prep utilities: string/date/map/JSON/variant/interval expressions, pivot/unpivot, text chunking and packing, fuzzy matching, collocations, and sampling-adjacent corpus transforms.

Split from the former single-module queries.py (round 7). The
QUERIES/ORACLES registration contract is unchanged: importing this
module registers its queries with the shared registry.
"""

from __future__ import annotations

from mapreducewordoccurences_spark.queries._shared import *  # noqa: F401,F403

@register(
    "json_extract_event_stats",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON surface: get_json_object over the events.props
    column, grouped aggregation downstream."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        decimal_sum("value", 4, "sum_value"),
    )


@register(
    "tfidf_top_terms",
    """
    WITH tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
            FROM documents)
      GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(*) AS df FROM tf GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, word, tf, df,
           CAST(ROUND(tf * ln(n_docs / CAST(df AS DOUBLE)), 4) AS DOUBLE) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
    WHERE df < (SELECT n_docs FROM n) / 2
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the documents table: tf per (doc, word), document
    frequency per word (broadcast — distinct-word set is small), idf =
    ln(N/df); terms appearing in ≥ half the corpus are dropped as
    stopwords. Round(…,4) absorbs libm-vs-Java ulp noise in ln()."""
    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word")
        )
        .where(F.length("word") > 0)
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    from mapreducewordoccurences_spark.sources.readers import parquet_row_count

    n_docs = parquet_row_count(sf_dir, "documents")  # footer metadata, no scan
    tfidf = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 4
    ).cast("double")
    return (
        tf.join(F.broadcast(df_), "word")
        .where(F.col("df") < n_docs / 2)
        .select("doc_id", "word", "tf", "df", tfidf.alias("tfidf"))
    )


@register(
    "string_functions_part",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS INT) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS is_steel,
           concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size
    FROM part
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface: upper/length/substr/like/concat in one
    projection (no shuffle — streams at scan speed)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("is_steel"),
        F.concat_ws(":", F.col("p_brand"), F.col("p_size").cast("string")).alias("brand_size"),
    )


@register(
    "exists_heavy_lineitem_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderpriority
    """,
)
def q_exists_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape via the SQL front door: correlated EXISTS.
    Exercises the parser/analyzer path (spark.sql over temp views);
    Catalyst rewrites the subquery to a left-semi hash join — the same
    physical plan as the DataFrame semi_join operator."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sql_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("sql_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM sql_orders
        WHERE EXISTS (SELECT 1 FROM sql_lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        GROUP BY o_orderpriority
        """
    )


@register(
    "date_functions_orders",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(quarter(o_orderdate) AS INT) AS o_quarter,
           COUNT(*) AS n_orders,
           CAST(MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS TIMESTAMP)
             AS first_month,
           CAST(MAX(last_day(CAST(o_orderdate AS DATE))) AS TIMESTAMP)
             AS last_month_end,
           CAST(MAX(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)))
             AS INT) AS max_days_since_epoch_start
    FROM orders
    GROUP BY year(o_orderdate), quarter(o_orderdate)
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: year/quarter buckets with trunc,
    last_day, and datediff aggregates — calendar arithmetic only
    (no timezones, no fractional months), identical on both engines."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.quarter("o_orderdate").alias("o_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # TIMESTAMP (not DATE) output: date values round-trip to
            # driver-side Python date objects while the oracle yields
            # datetime64 — a dtype mismatch with equal values. One
            # timestamp type on both sides removes the ambiguity.
            F.min(F.date_trunc("month", "o_orderdate").cast("date"))
            .cast("timestamp")
            .alias("first_month"),
            F.max(F.last_day(F.col("o_orderdate").cast("date")))
            .cast("timestamp")
            .alias("last_month_end"),
            F.max(
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            ).alias("max_days_since_epoch_start"),
        )
    )


@register(
    "unpivot_orders_status",
    """
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                 AS status_F,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                 AS status_O,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
                 AS status_P
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n
    FROM wide UNPIVOT (n FOR status IN (status_F, status_O, status_P))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (inverse of the pivot query) via the
    ``stack`` generator — a map-side Generate, no shuffle beyond the
    upstream aggregate."""
    orders = _t(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("status_F"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("status_O"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("status_P"),
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'status_F', status_F, 'status_O', status_O, 'status_P', status_P)"
        " AS (status, n)",
    )


@register(
    "length_filtered_documents",
    """
    WITH bounds AS (
        SELECT quantile_disc(n_chars, 0.05) AS lo,
               quantile_disc(n_chars, 0.95) AS hi
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept,
           MIN(n_chars) AS min_c, MAX(n_chars) AS max_c
    FROM documents, bounds
    WHERE n_chars >= lo AND n_chars <= hi
    GROUP BY lang
    """,
)
def q_length_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile length gate (drop the shortest/longest 5%) — the
    standard pre-training length filter. The [p5, p95] bounds are a
    1-row aggregate broadcast-cross-joined to the corpus (no driver
    collect); percentile_disc keeps the bounds exact and
    engine-portable."""
    docs = _t(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").alias("hi"),
    )
    kept = docs.crossJoin(F.broadcast(bounds)).where(
        (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("n_chars").alias("min_c"),
        F.max("n_chars").alias("max_c"),
    )


@register(
    "pack_documents_to_sequences",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT)
                 AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, lang, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens) / 256) AS BIGINT)
                 AS pack_id
        FROM toks
    )
    SELECT lang, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: assign docs to ~256-token bins
    (the pre-training packing step, scaled down). pack_id =
    floor(exclusive-prefix-token-sum / capacity) over a doc_id-ordered
    window — fully deterministic (vs. greedy per-partition packers
    whose output depends on partitioning), one shuffle per lang
    partition, and the window + final groupBy share it."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.size(F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), 0)).alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 256).cast("bigint"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


@register(
    "listagg_nations_per_region",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG, Spark 4 /
    DuckDB string_agg). The WITHIN GROUP ordering is mandatory for
    determinism — an unordered listagg is partitioning-dependent."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "interval_arithmetic_orders",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS due_date,
           CAST(o_orderdate - INTERVAL 90 DAY AS TIMESTAMP) AS lookback,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (1995 * 12 + 1) AS INT) AS months_since
    FROM orders
    """,
)
def q_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic (month add with end-of-month
    clamping, day subtract). Month distance is computed as a
    year*12+month difference — boundary-count semantics identical on
    both engines (Spark's months_between is FRACTIONAL and would
    diverge)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("due_date"),
        F.expr("o_orderdate - INTERVAL 90 DAY").alias("lookback"),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - F.lit(1995 * 12 + 1)
        )
        .cast("int")
        .alias("months_since"),
    )


@register(
    "map_functions_order_status",
    """
    SELECT o_orderpriority,
           m['F'][1] AS n_f,
           m['O'][1] AS n_o,
           CAST(cardinality(m) AS INT) AS n_keys
    FROM (
        SELECT o_orderpriority,
               MAP(['F', 'O'],
                   [CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT),
                    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)])
                 AS m
        FROM orders GROUP BY o_orderpriority
    )
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: build a map from aggregates
    (map_from_arrays), extract by key (element_at), measure
    (size) — emitted as plain scalars so the comparison is
    engine-neutral (map column layouts aren't)."""
    orders = _t(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("o"),
    )
    m = F.map_from_arrays(F.array(F.lit("F"), F.lit("O")), F.array("f", "o"))
    return agg.select(
        "o_orderpriority",
        F.element_at(m, "F").alias("n_f"),
        F.element_at(m, "O").alias("n_o"),
        F.size(m).cast("int").alias("n_keys"),
    )


@register(
    "pivot_orders_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with a FIXED value list — never let pivot
    infer values at scale (that's an extra distinct scan and a
    nondeterministic schema)."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@register(
    "chunk_documents_sliding",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(u.cid AS INT) AS chunk_id,
           CAST(len(u.c) AS INT) AS n_chunk_tokens,
           array_to_string(u.c, ' ') AS chunk_text
    FROM (
      SELECT doc_id,
             unnest([{'cid': (i - 1) // 16, 'c': s[i:i+31]}
                     for i in range(1, len(s) + 1, 16)]) AS u
      FROM toks WHERE len(s) >= 1
    )
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 32-token chunks, stride 16 (50%
    overlap) — retrieval-index prep. Map-only plan
    (functions/text.py chunk_documents)."""
    from mapreducewordoccurences_spark.functions.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=16
    )


@register(
    "unigram_logprob_scores",
    """
    WITH tf AS (
      SELECT doc_id, w AS word, count(*) AS tf
      FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      GROUP BY 1, 2
    ), vocab AS (
      SELECT word, SUM(tf) AS cw FROM tf GROUP BY word
    ), tot AS (SELECT CAST(SUM(cw) AS DOUBLE) AS total FROM vocab)
    SELECT doc_id,
           CAST(ROUND(-SUM(tf.tf * ln(vocab.cw / tot.total)) / SUM(tf.tf), 4)
                AS DOUBLE) AS mean_nll,
           SUM(tf.tf) AS n_tokens
    FROM tf JOIN vocab USING (word) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-prob per doc under the corpus unigram model —
    cheap fluency/quality signal. Vocab model is a broadcast
    distinct-word aggregate (functions/ranking.py unigram_logprob)."""
    from mapreducewordoccurences_spark.functions.ranking import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.round("mean_nll", 4).alias("mean_nll"), "n_tokens"
    )


@register(
    "pmi_collocations",
    """
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ), pairs AS (
      SELECT t[i] AS word_a, t[i+1] AS word_b
      FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
    ), big AS (
      SELECT word_a, word_b, count(*) AS pair_count
      FROM pairs GROUP BY 1, 2 HAVING count(*) >= 25
    ), uni AS (
      SELECT w AS word, count(*) AS cw
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
    ), tu AS (SELECT CAST(SUM(cw) AS DOUBLE) AS tu FROM uni),
       tb AS (SELECT CAST(count(*) AS DOUBLE) AS tb FROM pairs)
    SELECT word_a, word_b, pair_count,
           CAST(ROUND(ln((pair_count / tb.tb)
                         / ((ua.cw / tu.tu) * (ub.cw / tu.tu))), 4)
                AS DOUBLE) AS pmi
    FROM big
    JOIN uni ua ON ua.word = big.word_a
    JOIN uni ub ON ub.word = big.word_b
    CROSS JOIN tu CROSS JOIN tb
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair PMI collocation mining (min pair count 25) —
    phrase/tokenizer-vocab induction. Bigram counts shuffle once;
    unigram model broadcasts (functions/ranking.py pmi_collocations)."""
    from mapreducewordoccurences_spark.functions.ranking import pmi_collocations

    return pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=25
    ).select("word_a", "word_b", "pair_count", F.round("pmi", 4).alias("pmi"))


@register(
    "corpus_prep_pipeline",
    """
    WITH measured AS (
      SELECT doc_id, source, text,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
      FROM documents
    ), gated AS (
      SELECT * FROM measured WHERE n_tokens >= 20
    ), keepers AS (
      SELECT min(doc_id) AS doc_id FROM gated
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    ), deduped AS (
      SELECT g.* FROM gated g JOIN keepers USING (doc_id)
    )
    SELECT doc_id, source, n_tokens, cum_tokens FROM (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM deduped
    ) WHERE cum_tokens <= 600
    """,
)
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus prep: length gate (≥20 tokens) → exact-dedup
    survivors (min-id per normalized-text fingerprint) → per-source
    600-token curriculum cut. Composes quality gate + drop_exact_dups
    + token_budget_sample; shuffle inventory = fingerprint groupBy +
    semi-join + one source-keyed window — nothing quadratic, nothing
    driver-side."""
    from mapreducewordoccurences_spark.dedup.exact import drop_exact_dups
    from mapreducewordoccurences_spark.functions.sampling import token_budget_sample
    from mapreducewordoccurences_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    gated = docs.where(token_count("text") >= 20)
    deduped = drop_exact_dups(gated)
    return token_budget_sample(deduped, budget_tokens=600).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )


@register(
    "fuzzy_match_part_names",
    # probes are deterministically typo'd part names (one char deleted
    # past the blocking prefix); classic unit-cost levenshtein is
    # identical in both engines, and the rank-1 pick is totally
    # ordered by (dist, candidate key)
    """
    WITH probes AS (
      SELECT p_partkey AS probe_key,
             concat(substr(p_name, 1, CAST(pos AS INT) - 1),
                    substr(p_name, CAST(pos AS INT) + 1)) AS probe_name
      FROM (SELECT p_partkey, p_name,
                   5 + p_partkey % (length(p_name) - 5) AS pos
            FROM part WHERE p_partkey % 29 = 3)
    ), cand AS (
      SELECT pr.probe_key, pr.probe_name, p.p_partkey, p.p_name,
             levenshtein(pr.probe_name, p.p_name) AS dist
      FROM probes pr JOIN part p
        ON substr(pr.probe_name, 1, 4) = substr(p.p_name, 1, 4)
       AND abs(length(pr.probe_name) - length(p.p_name)) <= 2
      WHERE levenshtein(pr.probe_name, p.p_name) <= 2
    )
    SELECT probe_key, probe_name,
           p_partkey AS match_key, p_name AS match_name, dist
    FROM (SELECT *, row_number() OVER (
            PARTITION BY probe_key ORDER BY dist, p_partkey) AS rn
          FROM cand)
    WHERE rn = 1
    """,
)
def q_fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (functions/fuzzy.py): probes are part
    names with one char deleted past position 4; candidates share a
    4-char prefix block and a ±2 length band; levenshtein <= 2 inside
    blocks only; rank-1 per probe by (dist, key). The blocking
    equi-join is the whole scale story — no cross join exists in the
    plan."""
    from mapreducewordoccurences_spark.functions.fuzzy import best_fuzzy_match

    parts = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    probes = parts.where(F.col("p_partkey") % 29 == 3).select(
        F.col("p_partkey").alias("probe_key"),
        F.expr(
            "concat(substring(p_name, 1, CAST(5 + p_partkey % (length(p_name) - 5) AS INT) - 1),"
            " substring(p_name, CAST(5 + p_partkey % (length(p_name) - 5) AS INT) + 1))"
        ).alias("probe_name"),
    )
    return best_fuzzy_match(
        probes,
        parts,
        probe_col="probe_name",
        cand_col="p_name",
        probe_id="probe_key",
        cand_id="p_partkey",
        # part names are a small vocabulary over many rows — distance
        # per distinct name pair, not per catalog row (same output)
        catalog_dedup=True,
    ).select(
        "probe_key",
        "probe_name",
        F.col("p_partkey").alias("match_key"),
        F.col("p_name").alias("match_name"),
        "dist",
    )


@register(
    "variant_props_stats",
    # oracle uses plain JSON extraction — VARIANT is an encoding
    # choice, not a semantics change, so the numbers must agree
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_even_k,
           CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_path
    FROM events GROUP BY event_type
    """,
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: props is
    parsed ONCE into the binary variant encoding (the at-scale pattern:
    parse at ingest, store VARIANT, typed field access afterwards needs
    no string re-parsing), then fields come out via variant_get with
    target types; try_variant_get probes an absent path without error."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    parsed = ev.select(
        "event_type",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "string").alias("missing"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0)).alias("n_even_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias(
            "n_missing_path"
        ),
    )


@register(
    "kfold_assignment_counts",
    # reproducible k-fold eval assignment: fold = md5 bucket % 5 — the
    # same engine-portable hash family the split/sample ops use
    """
    SELECT CAST(CAST(concat('0x', substr(md5(concat('fold', CAST(doc_id AS VARCHAR))), 1, 4))
                AS INT) % 5 AS BIGINT) AS fold,
           source, count(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (cross-validation splits that
    survive reruns, engine swaps, and repartitioning): fold = md5
    bucket mod k via the sampling module's portable hash family."""
    from mapreducewordoccurences_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            (hash_bucket(F.col("doc_id"), salt="fold") % 5)
            .cast("bigint")
            .alias("fold"),
            "source",
        )
        .groupBy("fold", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "boilerplate_shingle_ratio",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(t[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS s
      FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 5
    ), dfreq AS (
      SELECT s, count(*) AS df FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           count(*) AS n_shingles,
           count(CASE WHEN dfreq.df >= 2 THEN 1 END) AS n_common,
           count(CASE WHEN dfreq.df >= 2 THEN 1 END) / count(*)
             AS boilerplate_ratio
    FROM sh JOIN dfreq ON sh.s = dfreq.s
    GROUP BY sh.doc_id
    """,
)
def q_boilerplate_shingle_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection (C4/RefinedWeb-style): the
    fraction of a document's distinct 5-gram shingles that also occur
    in at least one OTHER document — headers, footers, and templated
    text score high and get dropped before near-dup pairing even
    runs. Distinct from repetition_stats (within-doc repeats) and
    dedup_ngram_jaccard (pairwise similarity): this is a corpus-wide
    document-frequency join. Two shuffles (shingle df-count, join
    back + per-doc agg); shingles are folded to 64-bit xxhash64
    before either shuffle so the exchanges carry 8-byte longs, not
    ~5-word strings (the same ~3× exchange cut the Jaccard tier
    uses; collision odds ~n²/2⁶⁴ are far below any gate's
    sensitivity)."""
    from mapreducewordoccurences_spark.dedup.ngram import shingles_df

    docs = _t(spark, sf_dir, "documents")
    sh = shingles_df(docs, id_col="doc_id", text_col="text", n=5).select(
        "doc_id", F.xxhash64("shingle").alias("shingle")
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    joined = sh.join(dfreq, "shingle")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count(F.when(F.col("df") >= 2, 1)).alias("n_common"),
        (
            F.count(F.when(F.col("df") >= 2, 1)) / F.count(F.lit(1))
        ).alias("boilerplate_ratio"),
    )


@register(
    "temperature_source_weights",
    """
    WITH per AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), pw AS (
      SELECT source, n_docs, n_tokens,
             trunc(pow(n_tokens, 0.7) * 1e6) / 1e6 AS w
      FROM per
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
             CAST(sum(CAST(trunc(w * 1e6) AS BIGINT)) AS BIGINT) AS wt_fp
      FROM pw
    )
    SELECT source, n_docs, n_tokens,
           n_tokens / t AS p_raw,
           CAST(ROUND(w / (wt_fp / 1e6), 6) AS DOUBLE) AS p_temp
    FROM pw, tot
    """,
)
def q_temperature_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling (the multilingual/multi-
    source rebalancing rule of XLM-R / mT5: p_s ∝ tokens_s^α, α=0.7)
    — upweights tail sources without flattening the mix entirely.
    Complements source_mix_weights (uniform mixture). The per-source
    table is group-cardinality-sized, so the normalizing constant is
    a broadcast scalar; pow() is truncated to 6 digits before the
    fixed-point normalizer sum so the output is engine-portable."""
    from mapreducewordoccurences_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    per = (
        docs.select("source", F.size(tokens("text", lowercase=True)).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
    )
    pw = per.withColumn(
        "w",
        F.expr("CAST(pow(n_tokens, 0.7) * 1e6 AS BIGINT)") / F.lit(1e6),
    )
    tot = pw.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.sum(F.expr("CAST(w * 1e6 AS BIGINT)")).cast("bigint").alias("wt_fp"),
    )
    return pw.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("t")).alias("p_raw"),
        F.round(F.col("w") / (F.col("wt_fp") / F.lit(1e6)), 6).alias("p_temp"),
    )


@register(
    "basket_part_pairs_lift",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM b
    ), supp AS (
      SELECT l_partkey, count(*) AS c FROM b GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, bb.l_partkey AS part_b, count(*) AS c_ab
      FROM b a JOIN b bb
        ON a.l_orderkey = bb.l_orderkey AND a.l_partkey < bb.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT part_a, part_b, c_ab,
           c_ab / sa.c AS confidence_a_to_b,
           (c_ab * n.n_orders) / (sa.c * sb.c) AS lift
    FROM pairs
    JOIN supp sa ON sa.l_partkey = part_a
    JOIN supp sb ON sb.l_partkey = part_b
    CROSS JOIN n
    """,
)
def q_basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order line items: support,
    confidence and lift for every part pair co-occurring in ≥2 orders.
    Pair generation is a self-join CO-KEYED ON THE ORDER — the blow-up
    is bounded by basket_size²/2 per order (baskets are small by
    nature), never by part popularity, so the plan survives any order
    count. The order total is a broadcast scalar; the per-part
    support joins carry NO broadcast hint — part cardinality scales
    with the data, so AQE broadcasts while the supports fit and
    falls back to pair-co-keyed shuffle joins when they don't.
    Lift/confidence are single integer divides (bit-portable)."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = b.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    supp = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    bb = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(bb, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= 2)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    return (
        # per-part supports scale with part cardinality — no broadcast
        # hint; AQE broadcasts them while they fit and shuffle-joins
        # co-keyed on the pair columns when they don't
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "c_ab",
            (F.col("c_ab") / F.col("ca")).alias("confidence_a_to_b"),
            ((F.col("c_ab") * F.col("n_orders")) / (F.col("ca") * F.col("cb"))).alias(
                "lift"
            ),
        )
    )


@register(
    "lateral_top2_orders_per_customer",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
)
def q_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table) —
    the parser/decorrelation surface. Catalyst rewrites the
    correlated ORDER BY … LIMIT 2 into a rank-over-partition with
    map-side WindowGroupLimit pruning + one equi-join — the exact
    plan a hand-written top-k-per-group would get, so the SQL sugar
    costs nothing at scale (verified via explain: no per-row
    re-execution, no nested loop)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM __lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM __lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


@register(
    "hard_negatives_topk",
    """
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
                        e.vec_id) AS rnk
      FROM embeddings q JOIN embeddings e ON e.label <> q.label
      WHERE q.vec_id < 10)
    WHERE rnk <= 3
    """,
)
def q_hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    most-similar corpus vectors with a DIFFERENT label — the negatives
    that actually teach the margin (random negatives are trivially
    far). Same broadcast-probe plan as embedding_cosine_topk with the
    label-mismatch predicate applied BEFORE scoring (the filter
    shrinks the candidate stream map-side; nothing is scored then
    discarded), and the same WindowGroupLimit top-k. IDs+rank output
    (rank order is float-stable; raw sims aren't bit-portable)."""
    from mapreducewordoccurences_spark.functions.similarity import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qvec"),
        F.col("label").alias("__qlabel"),
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cvec"),
            "label",
        )
        .join(F.broadcast(q), F.col("label") != F.col("__qlabel"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("__qvec", "__cvec").alias("sim"),
        )
    )
    return top_k_per_group(
        scored, ["query_id"], [F.col("sim").desc(), F.col("neighbor_id").asc()], 3
    ).select("query_id", "neighbor_id", F.col("rnk").cast("int").alias("rnk"))


@register(
    "negative_sampling_pairs",
    """
    WITH n AS (SELECT count(*) AS n FROM embeddings),
    cand AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label, u.i,
             CAST(concat('0x', substr(md5('neg' || CAST(a.vec_id * 8 + u.i
                                                        AS VARCHAR)), 1, 4))
                  AS INT) % n.n AS sampled_id
      FROM embeddings a CROSS JOIN n, unnest(range(0, 4)) AS u(i)
    )
    SELECT anchor_id, CAST(i AS INT) AS i, sampled_id,
           e.label = anchor_label AS same_label
    FROM cand JOIN embeddings e ON e.vec_id = cand.sampled_id
    WHERE sampled_id <> anchor_id
    """,
)
def q_negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random negative sampling for contrastive
    training: 4 candidates per anchor drawn by the engine's portable
    md5 hash family (functions/sampling.py hash_bucket) mod corpus
    size — reproducible across runs, engines, and repartitioning
    (rand() would be none of those). Self-collisions drop (standard);
    same_label flags the accidental-positive rate the loss masks out.
    Map-side candidate generation; ONE equi-join on the dense id to
    fetch labels — at 100 TB this join is exchange-free if the corpus
    is bucketed by id. Complements hard_negatives_topk (mined vs
    random negatives)."""
    from mapreducewordoccurences_spark.functions.sampling import hash_bucket

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.agg(F.count(F.lit(1)).alias("n"))
    cand = (
        emb.select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "anchor_label",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            "n",
        )
        .select(
            "anchor_id",
            "anchor_label",
            F.col("i").cast("int").alias("i"),
            (
                hash_bucket(F.col("anchor_id") * 8 + F.col("i"), salt="neg")
                % F.col("n")
            ).alias("sampled_id"),
        )
    )
    labels = emb.select(
        F.col("vec_id").alias("sampled_id"), F.col("label").alias("__slabel")
    )
    return (
        cand.join(labels, "sampled_id")
        .where(F.col("sampled_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "i",
            "sampled_id",
            (F.col("__slabel") == F.col("anchor_label")).alias("same_label"),
        )
    )


@register(
    "pivot_status_priority_matrix",
    """
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: order counts as a priority × status matrix via
    DataFrame.pivot with EXPLICIT pivot values — passing the value
    list is the scale-relevant form (omitting it triggers an eager
    distinct scan of the pivot column just to name the output
    columns). Catalyst compiles this to one groupBy with conditional
    aggregates — exactly the portable SQL the oracle spells out — so
    the matrix costs a single #priorities-row shuffle."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "unpivot_part_measures",
    """
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
    FROM part
    """,
)
def q_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt surface: wide part measures to long
    (key, measure, value) rows via DataFrame.unpivot — the reshape
    feeding any per-metric pipeline (drift monitors, metric stores).
    unpivot is a zero-shuffle map-side expand (each input row emits
    #measures output rows in place), unlike the UNION ALL the oracle
    uses, which would scan the table once per measure."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "pydatasource_corpus_stats",
    # oracle needs no tables: the source's rows are a closed-form
    # function of the id, so DuckDB regenerates them from range()
    """
    SELECT ['en','es','fr','de','zh'][CAST(i % 5 AS INT) + 1] AS lang,
           count(*) AS n_docs,
           CAST(SUM(8 + (i * 13) % 25) AS BIGINT) AS total_tokens
    FROM range(0, 10000) t(i)
    GROUP BY 1
    """,
)
def q_pydatasource_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python DataSource (sources/pydatasource.py, Spark-4
    DataSource API) driven through the correctness gate: 10k rows
    generated partition-parallel by the synthetic_corpus source,
    aggregated per language. The oracle regenerates the same rows
    from range() arithmetic — a hash-match proves the source's
    partition-split generation (and the API plumbing around it)
    produces exactly the declared closed form, the same oracle
    convention the multimodal fakes use."""
    from mapreducewordoccurences_spark.sources.pydatasource import (
        SyntheticCorpusDataSource,
    )

    spark.dataSource.register(SyntheticCorpusDataSource)
    corpus = (
        spark.read.format("synthetic_corpus")
        .option("numRows", 10_000)
        .option("numPartitions", 8)
        .load()
    )
    return corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
