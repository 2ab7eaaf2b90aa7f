"""Query catalog: every operator surface exposed as a named
(spark, sf_dir) -> DataFrame query, with a matching ANSI-SQL oracle
(DuckDB) where SQL can express the semantics.

Cross-engine determinism rules used throughout (see
operators/aggregates.py):
- money/double SUM/AVG go through DECIMAL(28,s) per-row casts → exact,
  order-independent sums → final CAST TO DOUBLE. The oracle mirrors
  the identical casts. Hot scan-aggregate paths use the equivalent
  fixed-point int64 form (fixedpoint_sum: per-row half-up round to
  scale, long sum — value-identical, stays in primitive codegen);
  statistics use the trunc-based variant (corr protocol) where
  negative values must truncate consistently.
- every window/top-k ORDER BY is made total with a unique tiebreak.
- ratios are single int/int divides (deterministic IEEE) — no float
  accumulation.
- all event-time arithmetic runs on int64 epoch-MICROseconds via the
  schema-adaptive ``sources.readers.ts_micros`` helper (Spark:
  unix_micros, or ``div 1000`` on legacy bigint-nanos input; DuckDB:
  epoch_us) — micros is the precision Spark TimestampType and DuckDB
  TIMESTAMP share, and integer ops are bit-deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.core.wordcount import count_words
from mapreducewordoccurences_spark.dedup.exact import exact_dup_groups
from mapreducewordoccurences_spark.dedup.minhash import minhash_lsh_pairs
from mapreducewordoccurences_spark.dedup.ngram import ngram_jaccard_pairs
from mapreducewordoccurences_spark.dedup.prefix import (
    prefix_filter_containment_pairs,
    prefix_filter_jaccard_pairs,
)
from mapreducewordoccurences_spark.dedup.simhash import simhash_near_dup_pairs
from mapreducewordoccurences_spark.dedup.verify import exact_verify_pairs
from mapreducewordoccurences_spark.functions.similarity import brute_force_knn, lsh_knn
from mapreducewordoccurences_spark.functions.text import language_id, quality_score, text_stats
from mapreducewordoccurences_spark.operators.aggregates import (
    decimal_avg,
    decimal_sum,
    fixedpoint_sum,
)
from mapreducewordoccurences_spark.operators.joins import anti_join, asof_join, semi_join
from mapreducewordoccurences_spark.operators.windows import running_agg, top_k_per_group
from mapreducewordoccurences_spark.sources.readers import load_table, ts_micros

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# shared exact-pair CTE for the sketch-tier oracles (3-gram shingle
# Jaccard, the same text pipeline as dedup_ngram_jaccard). Defined
# before first use — both the verified pair-set queries (early) and
# the recall-acceptance rows (later) format it.
_EXACT_PAIRS_CTE = """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
               [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]
             )) AS shingle
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
            FROM documents)
      WHERE len(s) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), exact AS (
      SELECT doc_a, doc_b
      FROM inter JOIN sizes x ON x.doc_id = doc_a
                 JOIN sizes y ON y.doc_id = doc_b
      WHERE i / (x.n + y.n - i) >= {thr}
    )
"""


# ---------------------------------------------------------------------------
# Reference surface: wordcount (SURVEY.md §2a — the reference's one query)
# ---------------------------------------------------------------------------

@register(
    "wordcount",
    """
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS word
          FROM documents)
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's single hardcoded query (src/main.c:14-27) over
    the documents table: case-sensitive [A-Za-z0-9]+ token counts."""
    docs = _t(spark, sf_dir, "documents")
    return count_words(docs, "text", sort=False).withColumnRenamed("count", "cnt")


@register(
    "wordcount_topk",
    """
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS word
          FROM documents)
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 100
    """,
)
def q_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 words — exercises TakeOrderedAndProject (per-partition
    k-heaps, no global sort)."""
    docs = _t(spark, sf_dir, "documents")
    counts = count_words(docs, "text", sort=False).withColumnRenamed("count", "cnt")
    return counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(100)


# ---------------------------------------------------------------------------
# Relational surface (SURVEY.md §2d: scans/filters/joins/aggs/windows/…)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(round(l_quantity * 1e4, 0) AS BIGINT)) / 1e4      AS sum_qty,
           SUM(CAST(round(l_extendedprice * 1e4, 0) AS BIGINT)) / 1e4 AS sum_base_price,
           SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1e6, 0) AS BIGINT)) / 1e6 AS sum_disc_price,
           SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6, 0) AS BIGINT)) / 1e6 AS sum_charge,
           SUM(CAST(round(l_quantity * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(l_quantity)      AS avg_qty,
           SUM(CAST(round(l_extendedprice * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(l_extendedprice) AS avg_price,
           SUM(CAST(round(l_discount * 1e6, 0) AS BIGINT)) / 1e6 / COUNT(l_discount)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation. Filter reaches
    the parquet scan (PushedFilters); partial aggregation bounds the
    shuffle at (groups × partitions) rows. Sums use the fixed-point
    int64 protocol (operators/aggregates.py fixedpoint_sum): per-row
    half-up rounding makes it value-identical to the DECIMAL path,
    but the aggregation stays in primitive whole-stage codegen —
    measured ~5× over Decimal128 on this 7-aggregate scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc = "l_extendedprice * (1 - l_discount)"
    charge = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fixedpoint_sum("l_quantity", 4, "sum_qty"),
            fixedpoint_sum("l_extendedprice", 4, "sum_base_price"),
            fixedpoint_sum(disc, 6, "sum_disc_price"),
            fixedpoint_sum(charge, 6, "sum_charge"),
            (fixedpoint_sum("l_quantity", 6) / F.count("l_quantity")).alias("avg_qty"),
            (fixedpoint_sum("l_extendedprice", 6) / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (fixedpoint_sum("l_discount", 6) / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → grouped
    revenue → top-k. Customer side shrinks ~1/5 before the join; AQE
    picks broadcast when the filtered side fits."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(decimal_sum(revenue, 6, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join across all six relational tables.
    region/nation are broadcast-hinted (≤25 rows at any SF); the
    fact-side joins shuffle on their keys and AQE handles skew."""
    region = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .join(cust, cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey))
        .groupBy("n_name")
        .agg(decimal_sum(revenue, 6, "revenue"))
    )


@register(
    "semi_join_customers_with_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        semi_join(cust, orders, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "anti_join_customers_without_recent_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders since 2001 (every customer has SOME
    order in this data, so the unfiltered variant is vacuous — the
    date predicate makes the anti-join discriminating)."""
    cust = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        anti_join(cust, recent, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "rollup_orders",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        decimal_sum("o_totalprice", 4, "total_price"),
    )


@register(
    "cube_lineitem_flags",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum("l_quantity", 4, "sum_qty"),
    )


@register(
    "distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "window_topk_orders_per_cust",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — WindowGroupLimit prunes to 3 rows
    per customer per partition before the shuffle."""
    orders = _t(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


@register(
    "window_running_user_spend",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,2)))
                OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user spend, ordered by event time (epoch nanos) with
    event_id tiebreak. Decimal frame-sum keeps it engine-exact even
    though window sums fold in different orders per engine."""
    ev = _t(spark, sf_dir, "events")
    return running_agg(
        ev.select("event_id", "user_id", "ts", "value"),
        ["user_id"],
        [F.col("ts").asc(), F.col("event_id").asc()],
        F.sum(F.col("value").cast("decimal(28,2)")),
        "__run",
    ).select(
        "event_id", "user_id", F.col("__run").cast("double").alias("running_spend")
    )


@register(
    "setop_nations_intersect",
    """
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
    """,
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    cust_n = _t(spark, sf_dir, "customer").join(
        nation, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    supp_n = _t(spark, sf_dir, "supplier").join(
        nation, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    return cust_n.intersect(supp_n)


@register(
    "setop_nations_except",
    """
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    EXCEPT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
                  WHERE s_acctbal > 5000
    """,
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no high-balance (>5000) supplier
    (the unrestricted variant is empty on this data — every nation
    has both; the balance predicate makes EXCEPT discriminating)."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    cust_n = _t(spark, sf_dir, "customer").join(
        nation, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
    )
    return cust_n.subtract(supp_n)


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
    "asof_join_purchase_signup",
    """
    SELECT p.event_id, p.user_id,
           (epoch_us(p.ts) - epoch_us(s.ts)) // 1000000 AS gap_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest signup at
    or before it (union + single window pass — one shuffle; see
    operators/joins.py)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    signups = ev.where(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=[],
        direction="backward",
    )
    # gap in whole seconds from epoch-micros (schema-adaptive; a direct
    # timestamp subtraction would yield an INTERVAL, which floor rejects)
    gap = F.floor(
        (ts_micros(joined, "ts") - ts_micros(joined, "ts_right")) / F.lit(1_000_000)
    ).cast("long")
    return joined.select("event_id", "user_id", gap.alias("gap_seconds"))


# ---------------------------------------------------------------------------
# Text-analytics / LLM-pipeline surface
# ---------------------------------------------------------------------------

@register(
    "text_stats",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS INT) AS n_distinct_tokens,
           length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
             / NULLIF(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 0) AS avg_token_len,
           length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
             / NULLIF(length(text), 0) AS alnum_ratio
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(_t(spark, sf_dir, "documents"))


@register(
    "dedup_exact",
    """
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS dup_cnt
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dup_groups(_t(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
               [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]
             )) AS shingle
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
            FROM documents)
      WHERE len(s) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, i / (x.n + y.n - i) AS jaccard
    FROM inter JOIN sizes x ON x.doc_id = doc_a
               JOIN sizes y ON y.doc_id = doc_b
    WHERE i / (x.n + y.n - i) >= 0.8
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_shingle_df caps posting-list length (a shingle in d docs
    contributes d² candidate pairs) — the scale-safe invocation. The
    cap never binds on the testdata (max observed df: 25 at sf0.1) so
    the unbounded DuckDB oracle still matches exactly; the uncapped
    variant stays the verifier tier in tests."""
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.8, max_shingle_df=1000
    )


@register(
    "dedup_minhash_lsh_pairs",
    _EXACT_PAIRS_CTE.format(thr=0.7)
    + """
    SELECT doc_a, doc_b, i / (x.n + y.n - i) AS jaccard
    FROM inter JOIN sizes x ON x.doc_id = doc_a
               JOIN sizes y ON y.doc_id = doc_b
    WHERE i / (x.n + y.n - i) >= 0.7
    """,
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pair set, EXACT-VERIFIED: banded LSH
    candidates (generated at a low est-Jaccard cut of 0.5 — the band
    S-curve midpoint — so recall is ~1) are re-scored with exact
    distinct-shingle Jaccard (dedup/verify.py) and cut at 0.7. The
    output is therefore the exact Jaccard-0.7 pair set whenever LSH
    recall is 1.0 — a CONDITIONAL oracle by design: a borderline
    J≈0.7 pair missed by every band would break the hash-match. With
    128 perms / 32 bands of 4 rows, the per-pair miss probability at
    J=0.7 is (1-0.7⁴)³² ≈ 1.5e-4 (at the former 16 bands it was
    (1-0.7⁴)¹⁶ ≈ 1.2e-2 — worth the 2× signature cost), it vanishes
    as J → 1 (planted dups are never missed), and the separate
    acceptance row ``dedup_minhash_lsh`` gates recall ≥ 0.9 if the
    corpus ever grows an unlucky borderline pair. The hash-match
    against the exact-pair oracle doubles as an end-to-end recall
    gate; the raw hash-seeded candidate set itself is not portable
    SQL — this verified formulation is.

    Scale shape: banding bounds candidate volume; the exact scorer
    touches candidates only (same tier as dedup_cascade's LSH path).
    """
    docs = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(
        docs, num_perm=128, bands=32, threshold=0.5
    ).select("doc_a", "doc_b")
    return exact_verify_pairs(docs, cand, threshold=0.7)


@register(
    "dedup_simhash_pairs",
    _EXACT_PAIRS_CTE.format(thr=0.8)
    + """
    SELECT doc_a, doc_b, i / (x.n + y.n - i) AS jaccard
    FROM inter JOIN sizes x ON x.doc_id = doc_a
               JOIN sizes y ON y.doc_id = doc_b
    WHERE i / (x.n + y.n - i) >= 0.8
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pair set, EXACT-VERIFIED: pigeonhole-block
    candidates at Hamming ≤ 16 (a generous cut — recall of the
    Jaccard-0.8 set observed 1.0; the acceptance row ``dedup_simhash``
    gates ≥ 0.85 at the tighter Hamming ≤ 8) re-scored with exact
    distinct-shingle Jaccard and cut at 0.8, making the output the
    exact Jaccard-0.8 pair set — portable SQL, unlike the raw 63-bit
    vote arithmetic. Like ``dedup_minhash_lsh_pairs`` this is a
    CONDITIONAL oracle: it hash-matches exactly when sketch recall is
    1.0 (observed at every tested sf at this generous Hamming-16
    cut); a future corpus with an adversarial borderline pair would
    surface as a hash mismatch here while the ``dedup_simhash``
    acceptance row still gates recall ≥ 0.85. Hash-match against the
    exact-pair oracle is an end-to-end recall gate for the sketch
    tier."""
    docs = _t(spark, sf_dir, "documents")
    cand = simhash_near_dup_pairs(docs, max_distance=16).select(
        "doc_a", "doc_b"
    )
    return exact_verify_pairs(docs, cand, threshold=0.8)


@register(
    "dedup_embedding_cosine",
    # threshold applied to the UNROUNDED cosine on both engines; the
    # rounded column only canonicalizes the output for value-hashing.
    # (testdata embeddings are isotropic — max pairwise cos ≈ 0.51 —
    # so 0.4 stands in for the ≥0.9 near-dup threshold real corpora use)
    """
    WITH p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 1000 AND b.vec_id < 1000
    )
    SELECT id_a, id_b, ROUND(cos_sim, 6) AS cos_sim FROM p WHERE cos_sim >= 0.4
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact (verifier) tier on a
    bounded slice; the LSH-bucketed scale tier is exercised in
    tests/test_clusters.py with planted near-duplicates."""
    from mapreducewordoccurences_spark.dedup.embedding import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    pairs = embedding_near_dup_pairs(emb, threshold=0.4, exact=True)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


@register(
    "embedding_cosine_topk",
    """
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
                        e.vec_id) AS rnk
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 10)
    WHERE rnk <= 5
    """,
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 probe vectors. IDs+rank only in
    the output: rank order is float-stable (random embeddings → sim
    gaps ≫ ulp), sim values themselves are not bit-portable."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return brute_force_knn(emb, queries, k=5).select("query_id", "neighbor_id", "rnk")


def _knn_recall_acceptance(approx_knn: DataFrame, exact_knn: DataFrame,
                           queries: DataFrame, k: int, min_recall: float) -> DataFrame:
    """Per-query recall@k of an ANN tier vs the exact brute-force tier,
    reduced to an oracle-checkable boolean. The query-id set and k are
    genuinely computed by both engines; the threshold is deterministic
    given the tiers' fixed seeds (observed per-query recall ≥ 0.6 at
    sf 0.001-0.1; min_recall leaves margin below that)."""
    hits = (
        approx_knn.select("query_id", "neighbor_id")
        .join(exact_knn.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__n_hits"))
    )
    qids = queries.select(F.col("vec_id").alias("query_id"))
    return qids.join(hits, "query_id", "left").select(
        "query_id",
        F.lit(k).cast("int").alias("k"),
        (F.coalesce(F.col("__n_hits"), F.lit(0)) / F.lit(k) >= min_recall).alias(
            "recall_ok"
        ),
    )


@register(
    "embedding_lsh_topk",
    # LSH hyperplane hashes aren't SQL-portable, but the tier's quality
    # contract is: per-query recall@5 vs the exact tier (both computed
    # Spark-side, deterministic under the fixed hash seeds) must clear
    # a floor. The oracle verifies the probe-query set, k, and the
    # claimed acceptance.
    """
    SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN acceptance: per-probe recall@5 against the exact
    brute-force tier, thresholded at 0.4 (observed ≥ 0.6; seeds fixed
    in functions/similarity.py). Raw top-k output is covered by the
    recall pytest (tests/test_operators_extra.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = lsh_knn(emb, queries, k=5, dim=64)
    exact = brute_force_knn(emb, queries, k=5)
    return _knn_recall_acceptance(approx, exact, queries, k=5, min_recall=0.4)


@register(
    "embedding_ivf_topk",
    # same acceptance contract as embedding_lsh_topk, for the IVF tier
    """
    SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN acceptance (k-means cells + nprobe probing; see
    functions/similarity.py ivf_knn for the at-scale index layout):
    per-probe recall@5 vs the exact tier, thresholded at 0.4
    (observed ≥ 0.6 across sf 0.001-0.1; Lloyd seeding is fixed)."""
    from mapreducewordoccurences_spark.functions.similarity import ivf_knn

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = ivf_knn(emb, queries, k=5, nlist=16, nprobe=4)
    exact = brute_force_knn(emb, queries, k=5)
    return _knn_recall_acceptance(approx, exact, queries, k=5, min_recall=0.4)


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
    "stratified_sample_by_lang",
    """
    WITH t AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT doc_id, lang FROM t WHERE rn <= CAST(ceil(0.1 * n) AS BIGINT)
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% stratified sample per language: preserves
    stratum proportions exactly, never empties a non-empty stratum."""
    from mapreducewordoccurences_spark.functions.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang", 0.1)


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
    "dedup_survivors_best_quality",
    # survivorship policy: keep the HIGHEST-QUALITY doc per exact-dup
    # group (not min-id) — ties broken by min doc_id. quality is the
    # same closed-form heuristic the quality_score query oracles.
    """
    WITH q AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
             (CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) BETWEEN 10 AND 100000 THEN 0.25 ELSE 0.0 END
              + CASE WHEN length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                          / NULLIF(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 0)
                          BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END
              + COALESCE(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                          / NULLIF(length(text), 0), 0.0) * 0.25
              + LEAST(len(list_intersect(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
                  ['the','and','of','to','is','in','that','it','for','with'])) / 10.0 * 2, 1.0) * 0.25
             ) AS quality
      FROM documents
    ), r AS (
      SELECT fingerprint, doc_id, quality,
             row_number() OVER (PARTITION BY fingerprint ORDER BY quality DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY fingerprint) AS dup_cnt,
             max(quality) OVER (PARTITION BY fingerprint) AS best_q
      FROM q
    )
    SELECT fingerprint, doc_id AS survivor_id,
           ROUND(best_q, 6) AS best_quality, dup_cnt
    FROM r WHERE rn = 1
    """,
)
def q_dedup_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivorship: one shuffle on the md5
    fingerprint, max_by picks (quality DESC, doc_id ASC) per group."""
    from mapreducewordoccurences_spark.functions.text import doc_fingerprint

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs).select("doc_id", "quality")
    fp = docs.select("doc_id", doc_fingerprint("text").alias("fingerprint"))
    return (
        fp.join(scored, "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.max_by(
                "doc_id", F.struct(F.col("quality"), (-F.col("doc_id")).alias("neg"))
            ).alias("survivor_id"),
            F.round(F.max("quality"), 6).alias("best_quality"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


@register(
    "bigram_counts",
    """
    SELECT bigram, count(*) AS cnt FROM (
      SELECT unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS bigram
      FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS s FROM documents)
    ) GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM counts (wordcount generalized to order-2): top-20
    bigrams. zip_with over adjacent token slices — one scan, one
    shuffle, TakeOrderedAndProject for the top-k."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0).alias("t")
    )
    n = F.size("t")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("t", 1, n - 1),
            F.slice("t", 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(20)
    )


@register(
    "media_image_dims",
    # the Spark side round-trips encode (mapInPandas) -> binary payload
    # -> decode (mapInPandas) -> dims histogram; the oracle predicts
    # the same histogram arithmetically from make_fake_media's
    # closed-form dims — any plumbing break (header packing, Arrow
    # batch shape, NULL handling) diverges the hash.
    """
    SELECT CAST(16 + doc_id % 48 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 40 AS INT) AS height,
           count(*) AS n_images
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_media_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: deterministic REAL PNG payloads
    (multimodal/media.py png_encode — stdlib zlib/struct codec, CRC'd
    chunks, deflated scanlines) encoded and decoded back through the
    codec in Arrow-batched mapInPandas, then a relational dims
    histogram. The oracle predicts the histogram arithmetically from
    the closed-form dims, so any codec or plumbing break diverges the
    hash."""
    from mapreducewordoccurences_spark.multimodal.media import (
        decode_image_meta,
        make_fake_media,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    meta = decode_image_meta(make_fake_media(docs))
    return meta.groupBy("width", "height").agg(F.count(F.lit(1)).alias("n_images"))


@register(
    "media_frame_sample",
    # n_frames = 1 + doc_id % 5 (make_fake_media), every_nth=2 →
    # kept frame indices are range(0, n_frames, 2), oracle-computable
    # without touching payload bytes
    """
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, CAST(1 + doc_id % 5 AS INT), 2)) AS INT) AS frame_idx
    FROM documents
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame-sampling fan-out (one row per kept frame)
    over deterministic REAL APNG clips — frame counts come from the
    acTL chunk via the stdlib codec."""
    from mapreducewordoccurences_spark.multimodal.media import (
        make_fake_media,
        sample_frames,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return sample_frames(make_fake_media(docs), every_nth=2)


@register(
    "udf_vector_norms",
    """
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(
               embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_udf_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas-UDF surface: per-row L2 norms of embeddings.
    (Deliberately the one catalog entry with Python in the plan — the
    extension contract, not a hot path.)"""
    from mapreducewordoccurences_spark.functions.udfs import vector_norm_udf

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(vector_norm_udf("embedding"), 6).alias("l2_norm")
    )


@register(
    "udaf_zscore_by_label",
    # z-scores recomputed relationally: per-(label, dim) mean/stddev_pop
    # join. round(4) absorbs numpy-pairwise vs streaming-agg accumulation
    # noise (~1e-12 on a ~64-term sum of O(1) values).
    """
    WITH e AS (
      SELECT vec_id, label,
             unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), s AS (
      SELECT label, i, AVG(CAST(x AS DOUBLE)) AS mu,
             STDDEV_POP(CAST(x AS DOUBLE)) AS sd
      FROM e GROUP BY label, i
    )
    SELECT e.vec_id, e.label,
           ROUND(SUM(POW((CAST(e.x AS DOUBLE) - s.mu)
                         / (CASE WHEN s.sd = 0 THEN 1.0 ELSE s.sd END), 2)), 4)
             AS z_sq_sum
    FROM e JOIN s ON e.label = s.label AND e.i = s.i
    GROUP BY e.vec_id, e.label
    """,
)
def q_udaf_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas (UDAF shape): per-label z-scored
    embeddings, summarized to a checkable scalar per vector."""
    from mapreducewordoccurences_spark.functions.udfs import zscore_by_group

    emb = _t(spark, sf_dir, "embeddings")
    z = zscore_by_group(emb)
    return z.select(
        "vec_id",
        "label",
        F.round(
            F.aggregate("zscored", F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("z_sq_sum"),
    )


@register(
    "udtf_sentence_stats",
    # mirrors SplitSentences.eval: split on [.!?]+, drop all-whitespace
    # parts, idx = position among kept parts, n_words = \\S+ runs
    r"""
    WITH parts AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(text, '[.!?]+')) AS part,
             generate_subscripts(regexp_split_to_array(text, '[.!?]+'), 1) AS pos
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS INT) AS idx,
           CAST(len(regexp_extract_all(part, '\S+')) AS INT) AS n_words
    FROM parts WHERE regexp_matches(part, '\S')
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one row → many): per-sentence stats over documents
    via a lateral join."""
    from mapreducewordoccurences_spark.functions.udfs import SplitSentences

    spark.udtf.register("split_sentences", SplitSentences)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


@register(
    "language_id",
    # mirrors functions/text.py STOPWORDS + argmax with lexicographic-
    # first tie-break (langs in sorted order: de,en,es,fr,zh; zh list is
    # empty so s_zh = 0). Scores are single int/int divides — exact.
    """
    WITH sc AS (
      SELECT doc_id,
             COALESCE(len(list_intersect(list_distinct(toks),
               ['der','die','und','das','ist','von','mit','den','nicht','ein']))
               / NULLIF(len(toks), 0), 0.0) AS s_de,
             COALESCE(len(list_intersect(list_distinct(toks),
               ['the','and','of','to','is','in','that','it','for','with']))
               / NULLIF(len(toks), 0), 0.0) AS s_en,
             COALESCE(len(list_intersect(list_distinct(toks),
               ['el','la','de','que','y','en','los','del','se','las']))
               / NULLIF(len(toks), 0), 0.0) AS s_es,
             COALESCE(len(list_intersect(list_distinct(toks),
               ['le','la','les','de','et','est','des','une','dans','que']))
               / NULLIF(len(toks), 0), 0.0) AS s_fr,
             0.0 AS s_zh
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
            FROM documents)
    )
    SELECT doc_id,
           CASE
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END AS lang_guess,
           GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS lang_score
    FROM sc
    """,
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_t(spark, sf_dir, "documents"))


@register(
    "quality_score",
    # mirrors functions/text.py quality_score term by term, in the same
    # left-to-right addition order (IEEE754 doubles: same operands +
    # same order = bit-identical result across engines).
    """
    WITH b AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
             length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
             length(text) AS chars
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             alnum / NULLIF(len(toks), 0) AS avg_token_len,
             alnum / NULLIF(chars, 0) AS alnum_ratio,
             len(list_intersect(list_distinct(toks),
               ['the','and','of','to','is','in','that','it','for','with'])) / 10.0
               AS stopword_ratio
      FROM b
    )
    SELECT doc_id, n_tokens, avg_token_len, alnum_ratio, stopword_ratio,
           (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END
            + CASE WHEN avg_token_len >= 2.0 AND avg_token_len <= 12.0 THEN 0.25 ELSE 0.0 END
            + COALESCE(alnum_ratio, 0.0) * 0.25
            + LEAST(stopword_ratio * 2, 1.0) * 0.25) AS quality
    FROM m
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Extended relational surface (round 1 widening)
# ---------------------------------------------------------------------------

@register(
    "brand_revenue",
    """
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dim join on the part table; part is broadcast-hinted (it is
    a per-SKU dimension — orders of magnitude smaller than lineitem)."""
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            decimal_sum(revenue, 6, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (neither rollup nor cube): per-priority
    and per-status marginals in ONE pass over orders (Spark expands
    sets map-side — no double scan)."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


@register(
    "range_join_quantity_bands",
    """
    SELECT band, count(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 25.0),
                 ('high', 25.0, 40.0), ('bulk', 40.0, 1e9)) AS bands(band, lo, hi)
      ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join of lineitem quantities into bands.
    The band table is tiny → broadcast nested-loop with the range
    predicate; at scale with many intervals use
    operators.joins.range_join(bucket_width=...) for an equi-join plan."""
    li = _t(spark, sf_dir, "lineitem").select("l_quantity")
    bands = F.broadcast(
        spark.createDataFrame(
            [("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 40.0), ("bulk", 40.0, 1e9)],
            "band string, lo double, hi double",
        )
    )
    return (
        li.join(bands, (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            decimal_sum("l_quantity", 4, "sum_qty"),
        )
    )


@register(
    "lag_delta_user_values",
    """
    SELECT event_id, user_id,
           CAST(ROUND(CAST(value AS DECIMAL(28,2))
                 - LAG(CAST(value AS DECIMAL(28,2)))
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id), 2) AS DOUBLE) AS delta
    FROM events
    """,
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-over-event value delta (lag window). Decimal
    subtraction keeps the difference exact; NULL for each user's first
    event."""
    ev = _t(spark, sf_dir, "events")
    from mapreducewordoccurences_spark.operators.windows import lag_delta

    out = lag_delta(
        ev.select("event_id", "user_id", "ts", F.col("value").cast("decimal(28,2)").alias("__v")),
        ["user_id"],
        [F.col("ts").asc(), F.col("event_id").asc()],
        "__v",
        out_col="__delta",
    )
    return out.select(
        "event_id", "user_id", F.col("__delta").cast("double").alias("delta")
    )


@register(
    "union_customer_supplier_nations",
    """
    SELECT 'customer' AS side, c_nationkey AS nationkey, count(*) AS n
    FROM customer GROUP BY c_nationkey
    UNION ALL
    SELECT 'supplier' AS side, s_nationkey AS nationkey, count(*) AS n
    FROM supplier GROUP BY s_nationkey
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two grouped scans — concatenation only, no
    dedup shuffle."""
    from mapreducewordoccurences_spark.operators.setops import union_all

    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("customer").alias("side"), "nationkey", "n")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("supplier").alias("side"), "nationkey", "n")
    )
    return union_all(cust, supp)


@register(
    "topk_words_per_doc",
    """
    SELECT doc_id, word, tf, CAST(rnk AS INT) AS rnk FROM (
      SELECT doc_id, word, tf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, word) AS rnk
      FROM (
        SELECT doc_id, word, count(*) AS tf
        FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS word
              FROM documents)
        GROUP BY doc_id, word
      )
    ) WHERE rnk <= 3
    """,
)
def q_topk_words_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent words per document (integer-only ordering:
    tf desc, word asc — fully deterministic cross-engine)."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", "[^A-Za-z0-9]+")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return top_k_per_group(
        tf, ["doc_id"], [F.col("tf").desc(), F.col("word").asc()], 3
    ).select("doc_id", "word", "tf", "rnk")


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
    n_docs = docs.count()  # driver-side scalar (one cheap count scan)
    tfidf = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 4
    ).cast("double")
    return (
        tf.join(F.broadcast(df_), "word")
        .where(F.col("df") < n_docs / 2)
        .select("doc_id", "word", "tf", "df", tfidf.alias("tfidf"))
    )


@register(
    "approx_distinct_users",
    # Sketch internals are engine-specific, so the sketch VALUE can't be
    # hash-matched — but the sketch's documented accuracy CONTRACT can:
    # each engine computes its own HLL estimate and checks it against
    # the exact count (3× the configured 2% rsd = 6% bound). The exact
    # count and event totals hash-match exactly.
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact_users,
           COUNT(*) AS n_events,
           abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
               / COUNT(DISTINCT user_id) - 1) <= 0.06 AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type — the
    at-scale replacement for exact distinct counts (no per-key state
    blow-up). The oracle-checkable output: exact distinct count
    (hash-matched) plus an acceptance boolean asserting this engine's
    sketch landed within the documented 2%-rsd × 3σ error bound —
    DuckDB asserts the same property of its own HLL sketch."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.02).cast("double")
                / F.count_distinct("user_id")
                - 1
            )
            <= 0.06
        ).alias("approx_ok"),
    )


@register(
    "approx_value_percentiles",
    # percentile_disc picks an actual data value (no interpolation
    # arithmetic) so the exact quantiles are bit-portable across
    # engines; each engine then checks its own sketch quantile against
    # a ±2%-rank window of the exact distribution.
    """
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99,
           approx_quantile(value, 0.5)
             BETWEEN quantile_disc(value, 0.48) AND quantile_disc(value, 0.52)
             AS p50_ok,
           approx_quantile(value, 0.9)
             BETWEEN quantile_disc(value, 0.88) AND quantile_disc(value, 0.92)
             AS p90_ok,
           approx_quantile(value, 0.99)
             BETWEEN quantile_disc(value, 0.97) AND quantile_disc(value, 1.0)
             AS p99_ok
    FROM events GROUP BY event_type
    """,
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles per event_type, restated as an
    oracle-checkable acceptance test: exact discrete quantiles
    (hash-matched — percentile_disc returns an actual data value, so
    no cross-engine float interpolation) plus booleans asserting this
    engine's approx_percentile sketch sits inside a ±2%-rank window of
    the exact distribution. DuckDB asserts the same property of its
    own t-digest sketch."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__approx_pct_events")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
               approx_percentile(value, 0.5, 10000)
                 BETWEEN percentile_disc(0.48) WITHIN GROUP (ORDER BY value)
                     AND percentile_disc(0.52) WITHIN GROUP (ORDER BY value)
                 AS p50_ok,
               approx_percentile(value, 0.9, 10000)
                 BETWEEN percentile_disc(0.88) WITHIN GROUP (ORDER BY value)
                     AND percentile_disc(0.92) WITHIN GROUP (ORDER BY value)
                 AS p90_ok,
               approx_percentile(value, 0.99, 10000)
                 BETWEEN percentile_disc(0.97) WITHIN GROUP (ORDER BY value)
                     AND percentile_disc(1.0)  WITHIN GROUP (ORDER BY value)
                 AS p99_ok
        FROM __approx_pct_events GROUP BY event_type
        """
    )


@register(
    "left_join_order_item_counts",
    """
    SELECT o_orderkey, o_orderstatus,
           count(l_orderkey) AS n_items,
           CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(28,4))), 0) AS DOUBLE) AS sum_qty
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderstatus
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join surface: per-order item counts keeping zero-item
    orders (count(col) skips the NULLs a left join produces)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.coalesce(
                F.sum(F.col("l_quantity").cast("decimal(28,4)")), F.lit(0)
            ).cast("double").alias("sum_qty"),
        )
    )


@register(
    "orders_by_month",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-dimension scalar functions (year/month extraction) feeding
    a grouped aggregate — the time-series reporting shape."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            decimal_sum("o_totalprice", 4, "total_price"),
        )
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
    "dedup_survivors",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id IN (
      SELECT min(doc_id) FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))
    """,
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exact-dedup pipeline output: the kept rows (min-id
    representative per content group) — the actual training-data
    deliverable, not just the group table."""
    from mapreducewordoccurences_spark.dedup.exact import drop_exact_dups

    return drop_exact_dups(_t(spark, sf_dir, "documents")).select("doc_id", "n_chars")


@register(
    "dedup_clusters",
    """
    WITH RECURSIVE edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM (
        WITH sh AS (
          SELECT doc_id, unnest(list_distinct(
                   [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]
                 )) AS shingle
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
                FROM documents)
          WHERE len(s) >= 3
        ), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b
        FROM inter JOIN sizes x ON x.doc_id = doc_a
                   JOIN sizes y ON y.doc_id = doc_b
        WHERE i / (x.n + y.n - i) >= 0.8
      )
    ), undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), reach AS (
      SELECT src AS node, src AS comp FROM undirected
      UNION
      SELECT u.dst AS node, r.comp
      FROM reach r JOIN undirected u ON u.src = r.node
      WHERE r.comp < u.dst
    )
    SELECT comp AS component, count(*) AS size, min(node) AS keep_id
    FROM (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
    GROUP BY comp
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (Jaccard ≥ 0.8) resolved into connected
    components via iterative min-label propagation — the iterative-
    algorithm surface. Oracle uses a recursive CTE reachability
    closure (min-reachable-id per node ≡ component)."""
    from mapreducewordoccurences_spark.dedup.clusters import dup_clusters

    pairs = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.8)
    return dup_clusters(pairs)


@register(
    "token_count_bpe",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ 	
A-Za-z0-9'']+|[ 	
]+')) AS INT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_word_tokens
    FROM documents
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style pre-tokenizer count (contraction suffixes, letter
    runs, digit runs, punctuation runs, whitespace runs) next to plain
    word-token counts — the length signal an LLM-data pipeline
    budgets with. Pattern is RE2-and-Java-compatible (no lookahead)."""
    docs = _t(spark, sf_dir, "documents")
    bpe_pattern = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \\t\\nA-Za-z0-9']+|[ \\t\\n]+"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(bpe_pattern), 0)).alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), 0)).alias("n_word_tokens"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped relational widening (round-1 batch 2): filter-agg,
# deep stars, two-level aggs, self-agg thresholds, SQL subqueries.
# ---------------------------------------------------------------------------

@register(
    "q6_discount_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + ungrouped aggregate. The whole
    predicate set reaches the parquet scan (PushedFilters on shipdate /
    discount / quantity) and only 3 columns are read — at 100 TB this
    is the canonical scan-bound query; no shuffle beyond the final
    single-row partial-agg merge. Product l_extendedprice*l_discount is
    one IEEE multiply per row (deterministic), then decimal-exact sum."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q9_profit_by_nation_year",
    """
    SELECT n_name,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: fact-to-fact join (lineitem⋈orders, both big →
    sort-merge / AQE's choice) plus two broadcast dims (supplier,
    nation). Group keys come from both sides of the big join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q10_returned_revenue_topk",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    Filter on l_returnflag is pushed to the scan; final top-k is
    TakeOrderedAndProject (no global sort). c_custkey tiebreak makes
    the ordering total, so the LIMIT frontier is deterministic."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q13_order_count_distribution",
    """
    SELECT order_count, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY order_count
    """,
)
def q_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. Two-level
    aggregate over a filtered LEFT join; the filter lives in the join
    condition (NOT the WHERE — that would turn the join inner and drop
    zero-order customers). Second agg's input is one row per customer,
    so its shuffle is tiny."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(cust.c_custkey)
        .agg(F.count(orders.o_orderkey).alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q14_promo_revenue_ratio",
    """
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                  AS DOUBLE) AS promo_ratio,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
)
def q_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue
    share). Both sums are decimal-exact; the ratio is ONE double
    divide at the end — deterministic across partitionings. part is
    broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1998-01-01")
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev).cast("double")
            ).alias("promo_ratio"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH thresh AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(l_quantity) * 0.5 AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
             AS total_price,
           COUNT(*) AS n_items
    FROM lineitem l JOIN thresh t ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_thresh
    """,
)
def q_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their part's average quantity.
    The per-part average is a self-aggregation joined back to the fact;
    both sides share the l_partkey partitioning, so with matched
    shuffle keys Catalyst reuses one exchange. The threshold is
    decimal-exact-sum / count * 0.5 — two IEEE ops, same on both
    engines, so the < boundary is bit-identical."""
    li = _t(spark, sf_dir, "lineitem")
    thresh = li.groupBy("l_partkey").agg(
        (decimal_avg("l_quantity") * F.lit(0.5)).alias("qty_thresh")
    )
    return (
        li.join(thresh, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            decimal_sum("l_extendedprice", scale=6, alias="total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_order_customers",
    """
    SELECT c_name, o.o_orderkey, o_orderdate,
           CAST(sq.total_qty AS DOUBLE) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 300) sq
      ON o.o_orderkey = sq.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def q_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300 (the
    HAVING subquery), joined back to orders+customer. The HAVING
    output is tiny → both upstream joins broadcast it under AQE."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
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
    "rich_idle_customers_by_nation",
    """
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                              / COUNT(c_acctbal)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY n_name
    """,
)
def q_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers richer than the global positive-
    balance average with no jumbo (>400k) order. The scalar subquery becomes
    a broadcast cross-join of a 1-row aggregate (never a driver-side
    collect — the scalar stays on executors); NOT EXISTS is a left-anti
    join."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(decimal_avg("c_acctbal", alias="avg_bal"))
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    jumbo = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    idle = anti_join(rich, jumbo, "c_custkey")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            decimal_sum("c_acctbal", scale=4, alias="total_bal"),
        )
    )


@register(
    "sessionize_events",
    """
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, event_id, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
        FROM ordered
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session breaks after
    a 30-minute silence. One shuffle total — the lag window, the
    running-sum window, and the final groupBy all share the user_id
    partitioning (the two windows additionally share one sort). All
    arithmetic is int64 epoch-MICROseconds (via the schema-adaptive
    ``ts_micros`` helper): bit-deterministic, and (event_id) tiebreaks
    make both windows total orders."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = ev.select(
        "user_id", "event_id", ts_micros(ev, "ts").alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sessions = ordered.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


@register(
    "minmax_by_priority",
    """
    SELECT o_orderpriority,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_orderkey,
           min(struct_pack(p := o_totalprice, k := o_orderkey)).k AS bottom_orderkey,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by scalar aggregates: the cheapest / priciest order
    per priority in a single pass (no window, no join-back). The
    ordering key is a (price, orderkey) struct — lexicographic struct
    comparison gives a total order, so ties on price can't flip the
    answer. Oracle: DuckDB lacks struct-keyed arg_max, so it uses
    max(struct).field — same lexicographic semantics."""
    orders = _t(spark, sf_dir, "orders")
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("top_orderkey"),
        F.min_by("o_orderkey", key).alias("bottom_orderkey"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "array_stats_embeddings",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                          AS DECIMAL(28,10)))) AS DOUBLE) AS l2_norm_sq
    FROM embeddings
    """,
)
def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column, all
    JVM-side (no UDF): size, element_at, filter, and a
    transform+aggregate squared-norm. Each float product is cast to
    decimal BEFORE summing, so the reduction is order-independent —
    the only way a float fold matches bit-for-bit across engines."""
    emb = _t(spark, sf_dir, "embeddings")
    sq = lambda x: (x.cast("double") * x.cast("double")).cast("decimal(28,10)")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            "embedding",
            F.lit(0).cast("decimal(28,10)"),
            lambda acc, x: (acc + sq(x)).cast("decimal(28,10)"),
        )
        .cast("double")
        .alias("l2_norm_sq"),
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
    "histogram_totalprice",
    """
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS bucket_total
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals. floor(x/width) is one
    divide + one floor per row (deterministic); the bucketed groupBy
    is an ordinary hash aggregate — at 100 TB this is how you profile
    a column without a sort."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("price_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            decimal_sum("o_totalprice", scale=4, alias="bucket_total"),
        )
    )


@register(
    "quantiles_disc_order_price",
    """
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS median_price,
           quantile_disc(o_totalprice, 0.9) AS p90_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_quantiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (percentile_disc): returns an ACTUAL
    element of the group — no interpolation arithmetic, so the result
    is bit-identical across engines and partitionings (interpolating
    percentile_cont is float-order-sensitive; the approximate tier is
    percentile_approx, covered elsewhere)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "median_price"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p90_price"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "collect_sorted_sources_by_lang",
    """
    SELECT lang,
           array_to_string(list_sort(list(source))[1:3], ',') AS first_sources,
           COUNT(*) AS n_pairs
    FROM (SELECT DISTINCT lang, source FROM documents)
    GROUP BY lang
    """,
)
def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-to-array surface: collect_list is UNORDERED in a distributed
    engine, so any use feeding output must array_sort before slicing —
    the only way a collected array is deterministic. Output is a
    joined string so the comparison is value-stable."""
    docs = _t(spark, sf_dir, "documents")
    pairs = docs.select("lang", "source").distinct()
    return pairs.groupBy("lang").agg(
        F.array_join(
            F.slice(F.array_sort(F.collect_list("source")), 1, 3), ","
        ).alias("first_sources"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


@register(
    "setop_nationkeys_except_all",
    """
    SELECT nationkey, COUNT(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (bag semantics — multiplicities subtract,
    unlike the distinct EXCEPT elsewhere in the catalog). Spark plans
    it as a single hash aggregation over tagged counts."""
    from mapreducewordoccurences_spark.operators.setops import except_all

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return except_all(cust, supp).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "setop_nationkeys_intersect_all",
    """
    SELECT nationkey, COUNT(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL (pairwise with the EXCEPT ALL query:
    min-of-multiplicities semantics)."""
    from mapreducewordoccurences_spark.operators.setops import intersect

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return intersect(cust, supp, all=True).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n")
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
    "range_frame_hourly_spend",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_spend
    FROM events
    """,
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: each event's trailing-hour spend. Unlike a
    ROWS frame, peers (equal timestamps) always share a frame, so the
    result needs no tiebreak to be deterministic. Epoch-micros ordering
    keys on both engines; decimal-exact sums."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id", "event_id", ts_micros(ev, "ts").alias("ts_us"), "value"
    ).select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("hour_spend"),
    )


@register(
    "rank_family_part_prices",
    """
    SELECT p_partkey,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-function family (ntile / percent_rank / cume_dist) per
    brand. The (price, partkey) composite makes the order total, so
    there are no peer rows and both ratio functions are single int/int
    divisions — deterministic doubles."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_partkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "profile_documents",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(text) AS n_text_nonnull,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(CAST(n_chars AS DECIMAL(28,0))) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (row/null/distinct/min/max/total) — the
    data-quality audit a pipeline runs before training ingestion.
    Single scan, single-row output; exact distincts are fine for
    low-cardinality columns (swap in approx_count_distinct for
    high-cardinality ones)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("text").alias("n_text_nonnull"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum(F.col("n_chars").cast("decimal(28,0)")).cast("bigint").alias(
            "total_chars"
        ),
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


_STOPWORDS = (
    "the and of to is in that it for with a on as are was".split()
)


@register(
    "wordcount_no_stopwords_topk",
    f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
          FROM documents)
    WHERE word NOT IN ({", ".join("'" + w + "'" for w in _STOPWORDS)})
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 50
    """,
)
def q_wordcount_no_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowercased wordcount with a stopword gate — vocabulary-building
    shape. The stopword list is a literal isin() filter (Catalyst
    compiles it to a hash set); at real vocabulary scale it would be a
    broadcast semi-join against a stopword table."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("word")
    )
    return (
        words.where(~F.col("word").isin(_STOPWORDS))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(50)
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
    "q7_nation_pair_revenue",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def q_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume. The nation dim joins
    TWICE under different roles (customer's vs supplier's) — broadcast
    both; the n_name inequality dedupes unordered pairs."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .where(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q11_top_value_parts",
    """
    WITH pv AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS val
        FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT CAST(SUM(val) AS DOUBLE) AS total,
                      COUNT(*) AS n_parts FROM pv)
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE CAST(val AS DOUBLE) > total / n_parts * 1.2
    """,
)
def q_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a multiple of the GLOBAL mean
    (parts 20% above average value — scale-free, so the predicate
    stays selective at every SF). The global aggregate re-aggregates
    the per-part aggregate (tiny) and broadcasts back as a 1-row cross
    join — two shuffles total, no driver collect, no second lineitem
    scan. total/n*1.2 is a fixed op sequence — same double on both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias("val")
    )
    tot = pv.agg(
        F.sum("val").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(
            F.col("val").cast("double")
            > F.col("total") / F.col("n_parts") * 1.2
        )
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 5)
       OR (p_type = 'PROMO' AND l_quantity < 5)
    """,
)
def q_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicates. The OR
    spans both sides so it can't push below the join — the join stays
    a plain broadcast equi-join and the disjunction filters after;
    Catalyst still pushes the p_brand/p_type IN-set and per-branch
    ranges where it can."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 5))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") < 5))
    )
    return joined.where(cond).agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum("l_extendedprice", scale=6, alias="total"),
    )


@register(
    "q21_sole_qualifying_supplier",
    """
    SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.l_quantity >= 45
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_quantity >= 45)
    GROUP BY s_name
    """,
)
def q_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: orders where exactly ONE supplier ships a
    jumbo (≥45) line while other suppliers participate. The correlated
    EXISTS/NOT-EXISTS pair is rewritten as per-order aggregates joined
    back (count of distinct suppliers, count of distinct QUALIFYING
    suppliers) — one extra pass over lineitem instead of two
    correlated probes; the tiny per-order table broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(
            F.when(F.col("l_quantity") >= 45, F.col("l_suppkey"))
        ).alias("n_qual_supps"),
    )
    qual = li.where(F.col("l_quantity") >= 45)
    return (
        qual.join(per_order, "l_orderkey")
        .where((F.col("n_supps") >= 2) & (F.col("n_qual_supps") == 1))
        .join(F.broadcast(supp), qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("n_orders"))
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_0'
                         THEN CAST(volume AS DECIMAL(28,6))
                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_items
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
    )
    GROUP BY o_year
    """,
)
def q_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's import volume
    per year — a 7-relation join where nation again plays two roles,
    then a conditional-sum ratio (decimal-exact numerator and
    denominator, one double divide)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_0", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q12_priority_by_quantity_band",
    """
    SELECT CASE WHEN l_quantity < 25 THEN 'small' ELSE 'large' END AS qty_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-way conditional counts after a fact-fact
    join, grouped by a derived band."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.when(F.col("l_quantity") < 25, "small").otherwise("large").alias("qty_band")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_revenue_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                 AS total_rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving maximum revenue —
    scalar MAX subquery over an aggregate, joined back by exact
    DECIMAL equality (safe: both sides carry the identical exact sum;
    this would be wrong over floats)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(28,6)"
            )
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


@register(
    "q16_supplier_counts_excluding_flagged",
    """
    SELECT p_brand, CAST(p_size % 5 AS INT) AS size_band,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size % 5
    """,
)
def q_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per attribute combo,
    excluding a flagged-supplier list (NOT IN → left-anti against the
    broadcast-small exclusion set; never a NOT IN over a big list,
    which null-traps and can't broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    flagged = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        anti_join(li, flagged, "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", (F.col("p_size") % 5).cast("int").alias("size_band"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_dominant_part_suppliers",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(28,6))) AS sq
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), pt AS (
        SELECT l_partkey, CAST(SUM(sq) AS DOUBLE) AS tq FROM ps GROUP BY l_partkey
    )
    SELECT s_name, COUNT(*) AS n_dominated_parts
    FROM ps
    JOIN pt ON ps.l_partkey = pt.l_partkey
    JOIN supplier ON ps.l_suppkey = s_suppkey
    WHERE CAST(sq AS DOUBLE) > tq * 0.2
    GROUP BY s_name
    """,
)
def q_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers carrying an outsized share (>20%) of
    some part's total shipped quantity. Two-level aggregation where the
    second level re-aggregates the first (cheap), then joins back —
    both keyed on l_partkey, so the exchange is shared."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("sq")
    )
    pt = ps.groupBy("l_partkey").agg(F.sum("sq").cast("double").alias("tq"))
    return (
        ps.join(pt, "l_partkey")
        .where(F.col("sq").cast("double") > F.col("tq") * 0.2)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


@register(
    "q2_min_acctbal_supplier_per_part",
    # TPC-H Q2 shape (correlated MIN subquery → argmin per group). The
    # testdata has no partsupp, so part↔supplier comes from distinct
    # lineitem (l_partkey, l_suppkey) and the minimized measure is
    # s_acctbal; the plan pattern — per-group min joined back to select
    # the matching row — is Q2's.
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), x AS (
      SELECT l_partkey, s_suppkey, s_name, s_acctbal
      FROM ps JOIN supplier ON l_suppkey = s_suppkey
    ), m AS (
      SELECT l_partkey, min(s_acctbal) AS min_bal FROM x GROUP BY l_partkey
    )
    SELECT x.l_partkey AS p_partkey, p_name,
           min(s_suppkey) AS s_suppkey, min_bal AS s_acctbal
    FROM x JOIN m ON x.l_partkey = m.l_partkey AND x.s_acctbal = m.min_bal
    JOIN part ON x.l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY 1, 2, 4
    """,
)
def q_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the minimum-acctbal supplier for each small
    part. The correlated subquery decorrelates to one agg + self-join
    sharing the l_partkey exchange; min(s_suppkey) makes acctbal ties
    deterministic."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") <= 10)
    x = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    m = x.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        x.join(m, "l_partkey")
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(part), x.l_partkey == part.p_partkey)
        .groupBy(
            F.col("l_partkey").alias("p_partkey"), "p_name", F.col("min_bal").alias("s_acctbal")
        )
        .agg(F.min("s_suppkey").alias("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_acctbal")
    )


@register(
    "q4_priority_orders_with_returns",
    # TPC-H Q4 shape (EXISTS over lineitem per order → priority
    # histogram). No l_commitdate/l_receiptdate in the testdata; the
    # EXISTS predicate is a returned line instead — the semi-join +
    # agg plan is Q4's.
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1994-01-01' AND o_orderdate < DATE '1995-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of 1994 orders having at
    least one returned line. EXISTS compiles to a left-semi hash join —
    lineitem is pre-filtered and projected to the join key before the
    shuffle."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    returned = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q22_idle_rich_customers",
    # TPC-H Q22 shape: scalar AVG subquery + NOT EXISTS anti-join.
    # Grouping is by nation (no phone column for country codes).
    """
    SELECT c_nationkey, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_nationkey
    """,
)
def q_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    orders, summarized per nation. The scalar avg broadcasts (1 row);
    NOT EXISTS is a left-anti join on o_custkey."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(28,4)"))
            .cast("double")
            .alias("totacctbal"),
        )
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
    "first_last_orders_per_month",
    """
    SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY year(o_orderdate), month(o_orderdate)
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame navigation functions (first/last/nth_value) with the
    FULL-partition frame — last_value over the default frame is the
    classic silent bug (it returns the CURRENT row); the explicit
    unbounded-both frame plus a total order makes all three
    deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy(F.year("o_orderdate"), F.month("o_orderdate"))
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    ).distinct()


@register(
    "scrub_digits_fingerprint",
    """
    SELECT doc_id,
           md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS scrub_fp,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             AS n_digits
    FROM documents
    """,
)
def q_scrub_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing (the PII-redaction shape: digit runs → '#')
    verified through an md5 fingerprint of the scrubbed text — md5 is
    engine-portable, so the oracle proves the SCRUBBED BYTES are
    identical, not just row counts. POSIX character classes only (no
    \\\\d) — identical semantics in Java and RE2-family engines."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace("text", "[0-9]+", "#")).alias("scrub_fp"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).alias("n_digits"),
    )


@register(
    "token_stopword_overlap",
    """
    SELECT doc_id,
           CAST(len(list_intersect(
                 list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')),
                 ['the', 'and', 'of', 'to', 'is'])) AS INT) AS n_stop_present,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
             AS INT) AS n_distinct_tokens
    FROM documents
    """,
)
def q_token_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (array_intersect/array_distinct) against a
    literal vocabulary — set-membership features computed entirely
    JVM-side, the shape used for stopword-density and
    blocklist-overlap scoring."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
    )
    stop = F.array(*[F.lit(w) for w in ["the", "and", "of", "to", "is"]])
    return docs.select(
        "doc_id",
        F.size(F.array_intersect(toks, stop)).cast("int").alias("n_stop_present"),
        F.size(toks).cast("int").alias("n_distinct_tokens"),
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


# ---------------------------------------------------------------------------
# Training-pipeline additions (round 2): decontamination, repetition
# filters, incremental dedup, source mixing
# ---------------------------------------------------------------------------


@register(
    "decontaminate_ngram_overlap",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
               [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]
             )) AS shingle
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
            FROM documents)
      WHERE len(s) >= 3
    ), bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0
    ), train AS (
      SELECT * FROM sh WHERE doc_id % 17 <> 0
    )
    SELECT t.doc_id,
           count(*) AS n_shingles,
           count(b.shingle) AS n_shared,
           count(b.shingle) / count(*) AS overlap_ratio
    FROM train t LEFT JOIN bench b USING (shingle)
    GROUP BY t.doc_id
    HAVING count(b.shingle) > 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 17 = 0 stand in
    for the eval suite; every other doc is scored for 3-gram overlap
    against it. Benchmark shingles broadcast — the training side is
    scanned once and shuffled once (dedup/decontam.py)."""
    from mapreducewordoccurences_spark.dedup.decontam import ngram_overlap

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)
    return ngram_overlap(train, bench, n=3)


@register(
    "repetition_stats",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
      FROM documents
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(s) >= 2
                  THEN (len(s) - 1 - len(list_distinct(
                         [s[i] || ' ' || s[i+1] for i in range(1, len(s))])))
                       / (len(s) - 1)
                  ELSE CAST(0 AS DOUBLE) END AS dup_2gram_frac,
             CASE WHEN len(s) >= 3
                  THEN (len(s) - 2 - len(list_distinct(
                         [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])))
                       / (len(s) - 2)
                  ELSE CAST(0 AS DOUBLE) END AS dup_3gram_frac
      FROM toks
    ), t AS (
      SELECT doc_id, unnest(s) AS token FROM toks
    ), tc AS (
      SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2
    ), top AS (
      SELECT doc_id, max(c) / CAST(sum(c) AS BIGINT) AS top_token_frac
      FROM tc GROUP BY doc_id
    )
    SELECT g.doc_id, top_token_frac, dup_2gram_frac, dup_3gram_frac,
           CAST(CASE WHEN top_token_frac > 0.2
                       OR dup_2gram_frac > 0.4
                       OR dup_3gram_frac > 0.3
                     THEN 1 ELSE 0 END AS INT) AS flagged
    FROM top JOIN grams g USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters
    (functions/text.py repetition_stats)."""
    from mapreducewordoccurences_spark.functions.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "dedup_incremental_batch",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ), newb AS (
      SELECT fingerprint, min(doc_id) AS doc_id
      FROM fp WHERE doc_id % 4 = 0 GROUP BY fingerprint
    ), corpus AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 4 <> 0
    )
    SELECT n.doc_id, n.fingerprint
    FROM newb n LEFT JOIN corpus c USING (fingerprint)
    WHERE c.fingerprint IS NULL
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: docs with doc_id % 4 = 0 play the
    new batch, the rest the existing corpus; survivors are
    first-in-batch and unseen (dedup/exact.py incremental_new_unique)."""
    from mapreducewordoccurences_spark.dedup.exact import incremental_new_unique

    docs = _t(spark, sf_dir, "documents")
    return incremental_new_unique(
        docs.where(F.col("doc_id") % 4 == 0),
        docs.where(F.col("doc_id") % 4 != 0),
    )


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
    "embedding_filtered_topk",
    """
    SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) DESC,
                        e.vec_id) AS rnk
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id AND e.label = 1
      WHERE q.vec_id < 10)
    WHERE rnk <= 5
    """,
)
def q_embedding_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: the corpus predicate
    (label = 1) applies BEFORE scoring and pushes down to the scan —
    top-k is over the filtered candidate set, the standard
    filtered-ANN semantics vector stores expose."""
    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_knn(
        emb.where(F.col("label") == 1), emb.where(F.col("vec_id") < 10), k=5
    ).select("query_id", "neighbor_id", "rnk")


@register(
    "bm25_topk_docs",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), stats AS (
      SELECT avg(len(t)) AS avgdl, count(*) AS n_docs FROM toks
    ), tf AS (
      SELECT doc_id, len(t) AS dl, w AS word, count(*) AS tf
      FROM (SELECT doc_id, t, unnest(t) AS w FROM toks)
      WHERE w IN ('spark', 'window', 'join', 'stream')
      GROUP BY 1, 2, 3
    ), df AS (
      SELECT word, count(*) AS df FROM tf GROUP BY word
    ), scores AS (
      SELECT doc_id,
             SUM( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)) ) AS score
      FROM tf JOIN df USING (word) CROSS JOIN stats s
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(ROUND(score, 4) AS DOUBLE) AS score,
           CAST(rnk AS INT) AS rnk
    FROM (SELECT doc_id, score,
                 ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, doc_id) AS rnk
          FROM scores)
    WHERE rnk <= 20
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a 4-term query (k1=1.2, b=0.75, Lucene
    idf). Rank ties break on the ROUNDED score then doc_id so both
    engines order identically. Only query-term hits are ever shuffled
    (functions/ranking.py bm25_scores)."""
    from mapreducewordoccurences_spark.functions.ranking import bm25_scores

    scored = bm25_scores(
        _t(spark, sf_dir, "documents"), ["spark", "window", "join", "stream"]
    ).select("doc_id", F.round("score", 4).alias("score"))
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= 20)
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
    "token_budget_sample_per_source",
    """
    SELECT doc_id, source, n_tokens, cum_tokens FROM (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
             SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) OVER (
               PARTITION BY source
               ORDER BY len(regexp_extract_all(lower(text), '[a-z0-9]+')) DESC,
                        doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM documents
    ) WHERE cum_tokens <= 800
    """,
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curriculum cut: per source, keep longest-first
    docs until 800 cumulative tokens (functions/sampling.py
    token_budget_sample — one window shuffle keyed by source)."""
    from mapreducewordoccurences_spark.functions.sampling import token_budget_sample

    return token_budget_sample(
        _t(spark, sf_dir, "documents"), budget_tokens=800
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@register(
    "embedding_quantized_topk",
    """
    WITH q8 AS (
      SELECT vec_id,
             list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS scale,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> GREATEST(-127, LEAST(127, CAST(floor(
                      x / (list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) / 127.0)
                      + 0.5) AS INT)))) AS q,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ), approx AS (
      SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id, qs.v AS qv, c.v AS cv,
             list_dot_product(CAST(qs.q AS DOUBLE[]), CAST(c.q AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(qs.q AS DOUBLE[]), CAST(qs.q AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.q AS DOUBLE[]), CAST(c.q AS DOUBLE[])))) AS a
      FROM q8 qs JOIN q8 c ON c.vec_id <> qs.vec_id
      WHERE qs.vec_id < 8
    ), cand AS (
      SELECT query_id, neighbor_id, qv, cv FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY a DESC, neighbor_id) AS arnk
        FROM approx) WHERE arnk <= 12
    )
    SELECT query_id, neighbor_id,
           CAST(ROUND(cos_sim, 6) AS DOUBLE) AS cos_sim, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT query_id, neighbor_id,
             list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv))
                                         * sqrt(list_dot_product(cv, cv))) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY list_dot_product(qv, cv)
                                         / (sqrt(list_dot_product(qv, qv))
                                            * sqrt(list_dot_product(cv, cv))) DESC,
                                         neighbor_id) AS rnk
      FROM cand)
    WHERE rnk <= 3
    """,
)
def q_embedding_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage quantized search: int8 scoring pass (4× smaller
    stored vectors, integer dot products) keeps 4k candidates, float
    re-rank keeps k=3. floor(x+0.5) rounding on BOTH engines — round()
    tie rules differ (functions/similarity.py quantized_knn)."""
    from mapreducewordoccurences_spark.functions.similarity import quantized_knn

    emb = _t(spark, sf_dir, "embeddings")
    return quantized_knn(
        emb, emb.where(F.col("vec_id") < 8), k=3, rerank_factor=4
    ).select(
        "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk"
    )


@register(
    "key_skew_event_users",
    """
    WITH per AS (
      SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
    ), tot AS (
      SELECT CAST(SUM(n_rows) AS DOUBLE) AS total,
             CAST(COUNT(*) AS DOUBLE) AS n_keys FROM per
    )
    SELECT user_id, n_rows,
           CAST(ROUND(n_rows / tot.total, 6) AS DOUBLE) AS row_share,
           CAST(ROUND(n_rows / (tot.total / tot.n_keys), 6) AS DOUBLE) AS ratio_to_mean
    FROM per CROSS JOIN tot
    ORDER BY n_rows DESC, user_id
    LIMIT 10
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: 10 hottest user_ids with row share
    and hot-reducer ratio (operators/skew.py key_skew_stats —
    distributed top-N, never a global window over the key set)."""
    from mapreducewordoccurences_spark.operators.skew import key_skew_stats

    return key_skew_stats(_t(spark, sf_dir, "events"), ["user_id"], top_n=10).select(
        "user_id",
        "n_rows",
        F.round("row_share", 6).alias("row_share"),
        F.round("ratio_to_mean", 6).alias("ratio_to_mean"),
    )


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
    "dedup_bloom_incremental",
    # The Bloom tier is a shuffle-reducer with NO effect on the answer
    # (no false negatives + exact verification of the maybe slice), so
    # the oracle is the plain exact incremental anti-join — a full
    # value-hash match, not an acceptance bound.
    """
    WITH fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
      FROM documents
    ), newb AS (
      SELECT fingerprint, min(doc_id) AS doc_id
      FROM fp WHERE doc_id % 5 = 1 GROUP BY fingerprint
    ), corpus AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 <> 1
    )
    SELECT n.doc_id, n.fingerprint
    FROM newb n LEFT JOIN corpus c USING (fingerprint)
    WHERE c.fingerprint IS NULL
    """,
)
def q_dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pre-filtered incremental dedup (dedup/bloom.py): docs with
    doc_id % 5 = 1 play the nightly batch, the rest the historical
    corpus. The corpus keys are folded into a bitmap DataFrame (pure
    bit_or aggregation); batch rows the filter rules out skip the
    corpus anti-join entirely; the maybe slice is exact-verified, so
    the output is bit-identical to the plain anti-join the oracle runs."""
    from mapreducewordoccurences_spark.dedup.bloom import bloom_incremental_new_unique

    docs = _t(spark, sf_dir, "documents")
    return bloom_incremental_new_unique(
        docs.where(F.col("doc_id") % 5 == 1),
        docs.where(F.col("doc_id") % 5 != 1),
    )


@register(
    "heavy_hitter_users",
    # exact output (phase-2 recount discards false candidates), so a
    # plain HAVING oracle hash-matches
    """
    SELECT user_id, count(*) AS cnt
    FROM events GROUP BY user_id
    HAVING count(*) >= (SELECT ceil(count(*) * 0.0005) FROM events)
    """,
)
def q_heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (users with ≥0.05% of all events) via the
    two-phase Space-Saving candidate / exact-recount pattern
    (operators/skew.py heavy_hitters) — the full key set never
    shuffles, only the bounded candidate superset does."""
    from mapreducewordoccurences_spark.operators.skew import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "events"), ["user_id"], min_share=0.0005)


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
    "asof_forward_next_purchase",
    # forward as-of with a 7-day tolerance: each signup's NEXT purchase
    # (inclusive), nulled when farther than the tolerance. The oracle
    # states it as a correlated min() — DuckDB's ASOF JOIN could also
    # express it, but the subquery form pins the semantics explicitly.
    """
    WITH s AS (SELECT * FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT s.event_id, s.user_id,
           CASE WHEN nxt IS NOT NULL AND nxt - epoch_us(s.ts) <= 604800000000
                THEN (nxt - epoch_us(s.ts)) // 1000000 END AS secs_to_purchase
    FROM (SELECT s.*,
                 (SELECT min(epoch_us(p.ts)) FROM p
                  WHERE p.user_id = s.user_id AND epoch_us(p.ts) >= epoch_us(s.ts))
                   AS nxt
          FROM s) s
    """,
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (operators/joins.py asof_join
    direction='forward'): each signup matched to the user's next
    purchase at-or-after it, nulled beyond 7 days. Event time is
    pre-normalized to epoch-micros so the tolerance is a plain int —
    the same single-shuffle union+window plan as the backward query."""
    ev = _t(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", ts_micros(ev, "ts").alias("ts_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", ts_micros(ev, "ts").alias("ts_us")
    )
    joined = asof_join(
        signups,
        purchases,
        on="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_cols=[],
        direction="forward",
        tolerance=604_800_000_000,  # 7 days in micros
    )
    gap = F.floor(
        (F.col("ts_us_right") - F.col("ts_us")) / F.lit(1_000_000)
    ).cast("long")
    return joined.select("event_id", "user_id", gap.alias("secs_to_purchase"))


# exact DuckDB replay of the integer-quantized Lloyd protocol
# (functions/clustering.py): trunc(v*2^20)+2^21 coords, integer
# squared distances, (dist, cluster_id) argmin, truncating-div
# centroid means — every number is an exact integer, so even this
# iterative trainer hash-matches. Ends at CTE ``a2`` =
# (vec_id, cluster_id, d): the final assignment. Shared by
# kmeans_cluster_profile and semantic_dedup_clusters.
_KMEANS_A2_CTE = """
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1048576) AS BIGINT) + 2097152)
               AS u
      FROM embeddings
    ), seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id, u AS c
      FROM v ORDER BY vec_id LIMIT 8
    ), d1 AS (
      SELECT vec_id, cluster_id, sum((ue - ce) * (ue - ce)) AS d
      FROM (SELECT vec_id, cluster_id, unnest(v.u) AS ue, unnest(s.c) AS ce
            FROM v CROSS JOIN seeds s)
      GROUP BY vec_id, cluster_id
    ), a1 AS (
      SELECT vec_id, cluster_id FROM (
        SELECT vec_id, cluster_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
        FROM d1) WHERE rn = 1
    ), upd AS (
      SELECT cluster_id, pos, sum(val) // count(*) AS m
      FROM (SELECT a1.cluster_id, unnest(v.u) AS val,
                   unnest(range(len(v.u))) AS pos
            FROM a1 JOIN v USING (vec_id))
      GROUP BY cluster_id, pos
    ), c2 AS (
      SELECT cluster_id, list(m ORDER BY pos) AS c FROM upd GROUP BY cluster_id
    ), d2 AS (
      SELECT vec_id, cluster_id, sum((ue - ce) * (ue - ce)) AS d
      FROM (SELECT vec_id, cluster_id, unnest(v.u) AS ue, unnest(c2.c) AS ce
            FROM v CROSS JOIN c2)
      GROUP BY vec_id, cluster_id
    ), a2 AS (
      SELECT vec_id, cluster_id, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster_id) AS rn
        FROM d2) WHERE rn = 1
    )
"""


@register(
    "kmeans_cluster_profile",
    _KMEANS_A2_CTE
    + """
    SELECT cluster_id, count(*) AS n_members, sum(d) AS sum_sq_dist
    FROM a2 GROUP BY cluster_id
    """,
)
def q_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means refinement (k=8, 2 assignment passes) over
    the embeddings table — functions/clustering.py. Centroids broadcast
    each pass; the update shuffle is bounded by k x dim x partitions, not
    by row count."""
    from mapreducewordoccurences_spark.functions.clustering import (
        kmeans_cluster_profile,
    )

    return kmeans_cluster_profile(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=8, iters=2
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
    "ewma_user_value",
    # identical left-to-right IEEE-double fold in both engines (DuckDB
    # list_reduce seeds with the first element, exactly like the Spark
    # aggregate over slice(arr, 2, ...) seeded with element 1), so the
    # doubles are bit-identical — no tolerance needed
    """
    SELECT user_id,
           CAST(len(obs) AS BIGINT) AS n_obs,
           list_reduce(obs, (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma_value
    FROM (SELECT user_id,
                 list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id) AS obs
          FROM events GROUP BY user_id)
    """,
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (alpha=0.5) of each user's event values in time
    order (operators/timeseries.py ewma_last): a sequential fold over
    a totally ordered per-key array — the only formulation that is
    both order-deterministic and underflow-free."""
    from mapreducewordoccurences_spark.operators.timeseries import ewma_last

    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        "user_id", ts_micros(ev, "ts").alias("ts_us"), "event_id", "value"
    )
    return ewma_last(obs, "user_id", "ts_us", "value", "event_id", alpha=0.5)


@register(
    "funnel_signup_view_purchase",
    # ordered funnel: each stage's timestamp must be >= the previous
    # stage's; all event-time math on epoch-micros ints
    """
    WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t1
               FROM events WHERE event_type = 'signup' GROUP BY 1),
         v AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
               FROM events e JOIN s USING (user_id)
               WHERE e.event_type = 'view' AND epoch_us(e.ts) >= s.t1
               GROUP BY 1),
         p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
               FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.t2
               GROUP BY 1)
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM v) AS n_view_after_signup,
           (SELECT count(*) FROM p) AS n_purchase_after_view,
           (SELECT count(*) FROM p) / (SELECT count(*) FROM s) AS conversion
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> purchase: each stage
    is a groupBy-min over events gated by the previous stage's time,
    joined on user_id — three shuffles sharing one key, so a real
    cluster co-partitions them (and bucketed event tables would make
    the joins exchange-free). The single int/int divide is the
    deterministic-ratio convention used across the catalog."""
    ev = _t(spark, sf_dir, "events")
    ev_us = ev.select(
        "user_id", "event_type", ts_micros(ev, "ts").alias("ts_us")
    )
    s = (
        ev_us.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    v = (
        ev_us.where(F.col("event_type") == "view")
        .join(s, "user_id")
        .where(F.col("ts_us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        ev_us.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts_us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    counts = (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view_after_signup")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_view")))
    )
    return counts.select(
        "n_signup",
        "n_view_after_signup",
        "n_purchase_after_view",
        (F.col("n_purchase_after_view") / F.col("n_signup")).alias("conversion"),
    )


@register(
    "retention_cohorts_weekly",
    # calendar-free cohorting: week buckets are epoch_us div one week
    # of micros — pure integer arithmetic both engines share
    """
    WITH su AS (SELECT user_id, min(epoch_us(ts) // 604800000000) AS cohort_wk
                FROM events WHERE event_type = 'signup' GROUP BY 1),
         act AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
                 FROM events)
    SELECT cohort_wk, wk - cohort_wk AS week_offset,
           count(*) AS n_active_users
    FROM act JOIN su USING (user_id)
    WHERE wk >= cohort_wk
    GROUP BY cohort_wk, week_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by signup week, counted
    as active in each subsequent week they produced any event. The
    distinct + join + agg all share the user_id key."""
    ev = _t(spark, sf_dir, "events")
    # integer div, not float division + cast — a double quotient can
    # round up across a bucket boundary
    ev_wk = ev.select(
        "user_id", "event_type", ts_micros(ev, "ts").alias("__ts_us")
    ).select(
        "user_id", "event_type", F.expr("__ts_us div 604800000000").alias("wk")
    )
    su = (
        ev_wk.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"))
    )
    act = ev_wk.select("user_id", "wk").distinct()
    return (
        act.join(su, "user_id")
        .where(F.col("wk") >= F.col("cohort_wk"))
        .groupBy(F.col("cohort_wk"), (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "merge_upsert_orders",
    # synthetic CDC batch derived deterministically from orders:
    # key%7=0 rows get two versioned updates (v2 wins), key%11=0 rows
    # are tombstoned, and shifted keys insert as new rows
    """
    WITH upd AS (
      SELECT o_orderkey, o_custkey, 'U1' AS o_orderstatus,
             o_totalprice + 1000 AS o_totalprice, 1 AS v, FALSE AS del
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, 'U2', o_totalprice + 2000, 2, FALSE
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, 'DEL', o_totalprice, 1, TRUE
      FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_custkey, 'NEW', 42.0, 1, FALSE
      FROM orders WHERE o_orderkey % 13 = 0
    ), latest AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, del
      FROM (SELECT *, row_number() OVER (
              PARTITION BY o_orderkey ORDER BY v DESC) AS rn FROM upd)
      WHERE rn = 1
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM latest WHERE NOT del
    """,
)
def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames (operators/merge.py):
    versioned updates collapse to latest-per-key, tombstones delete,
    new keys insert, untouched rows carry over via one pk-keyed
    anti-join."""
    from mapreducewordoccurences_spark.operators.merge import merge_upsert

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    upd = (
        orders.where(k % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U1").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1000).alias("o_totalprice"),
            F.lit(1).alias("v"),
            F.lit(False).alias("del"),
        )
        .unionByName(
            orders.where(k % 7 == 0).select(
                "o_orderkey",
                "o_custkey",
                F.lit("U2").alias("o_orderstatus"),
                (F.col("o_totalprice") + 2000).alias("o_totalprice"),
                F.lit(2).alias("v"),
                F.lit(False).alias("del"),
            )
        )
        .unionByName(
            orders.where((k % 11 == 0) & (k % 7 != 0)).select(
                "o_orderkey",
                "o_custkey",
                F.lit("DEL").alias("o_orderstatus"),
                F.col("o_totalprice"),
                F.lit(1).alias("v"),
                F.lit(True).alias("del"),
            )
        )
        .unionByName(
            orders.where(k % 13 == 0).select(
                (k + 1_000_000).alias("o_orderkey"),
                "o_custkey",
                F.lit("NEW").alias("o_orderstatus"),
                F.lit(42.0).alias("o_totalprice"),
                F.lit(1).alias("v"),
                F.lit(False).alias("del"),
            )
        )
    )
    return merge_upsert(
        orders, upd, keys=["o_orderkey"], version_col="v", delete_col="del"
    )


@register(
    "gram_matrix_embeddings",
    # the one distributed pass of PCA: fixed-point integer sums of
    # per-row double products (trunc at 1e-12, BIGINT sum, one final
    # division) — bit-identical in both engines; trunc() is explicit
    # because DuckDB's double->int cast rounds where Spark truncates
    """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         a AS (SELECT vec_id, unnest(v) AS vi, unnest(range(len(v))) AS i FROM e),
         b AS (SELECT vec_id, unnest(v) AS vj, unnest(range(len(v))) AS j FROM e),
         up AS (SELECT i, j,
                       sum(CAST(trunc(a.vi * b.vj * 1e12) AS BIGINT)) / 1e12 AS g
                FROM a JOIN b USING (vec_id)
                WHERE i <= j
                GROUP BY i, j)
    SELECT i, j, g FROM up
    UNION ALL
    SELECT j AS i, i AS j, g FROM up WHERE i < j
    """,
)
def q_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed half of PCA (functions/pca.py): d x d gram matrix
    in one pass; the exchange carries at most d^2 x partitions partially
    aggregated rows, never the row set."""
    from mapreducewordoccurences_spark.functions.pca import gram_matrix

    return gram_matrix(_t(spark, sf_dir, "embeddings"), "embedding")


@register(
    "selection_quantiles_order_price",
    # same numbers as a sort-based percentile_disc — the point is the
    # METHOD: iterative histogram narrowing with only scalars on the
    # driver, exact at any scale
    """
    SELECT quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.9) AS p90,
           quantile_disc(o_totalprice, 0.99) AS p99
    FROM orders
    """,
)
def q_selection_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact quantiles by distributed selection
    (operators/selection.py): per round one full scan builds a
    1024-bucket histogram of the candidate range (B rows to the
    driver, never data) and descends into the target bucket —
    the 100 TB replacement for single-reducer exact percentiles."""
    from mapreducewordoccurences_spark.operators.selection import exact_quantile_disc

    orders = _t(spark, sf_dir, "orders")
    vals = {
        name: exact_quantile_disc(orders, "o_totalprice", qq)
        for name, qq in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
    }
    return spark.createDataFrame(
        [(vals["p50"], vals["p90"], vals["p99"])], ["p50", "p90", "p99"]
    )


@register(
    "dq_expectations_orders",
    # the full gate: row-local checks fold into one scan; referential
    # integrity is an anti-join count against broadcast customer keys
    """
    WITH base AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_o_custkey,
             CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                           THEN 1 ELSE 0 END) AS BIGINT) AS range_o_totalprice,
             CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
               AS dupes_o_orderkey,
             CAST(sum(CASE WHEN NOT regexp_matches(o_orderstatus, '^[A-Z]$')
                           THEN 1 ELSE 0 END) AS BIGINT) AS regex_o_orderstatus
      FROM orders
    ), fk AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans_o_custkey
      FROM orders o
      WHERE o.o_custkey IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM base, fk
    """,
)
def q_dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over orders (operators/expectations.py): all
    row-local expectations in one aggregation pass + a referential-
    integrity anti-join against customer. All-zero counts = promote
    the snapshot."""
    from mapreducewordoccurences_spark.operators.expectations import (
        expect_in_range,
        expect_not_null,
        expect_regex,
        expect_report,
        expect_unique,
    )

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return expect_report(
        orders,
        [
            expect_not_null("o_custkey"),
            expect_in_range("o_totalprice", lo=0, hi=1_000_000),
            expect_unique("o_orderkey"),
            expect_regex("o_orderstatus", "^[A-Z]$"),
        ],
        foreign_keys=[("o_custkey", cust, "c_custkey")],
    )


@register(
    "hopping_window_event_value",
    # batch hopping windows (1h width, 15min hop): each event lands in
    # width/hop = 4 windows via generate_series on integer micros
    """
    SELECT hop_start_us, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
    FROM (
      SELECT unnest(generate_series(
               ((epoch_us(ts) - 3600000000) // 900000000 + 1) * 900000000,
               epoch_us(ts),
               900000000)) AS hop_start_us,
             value
      FROM events)
    WHERE hop_start_us >= 0
    GROUP BY hop_start_us
    """,
)
def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode hopping windows (the exact shape of streaming
    window(ts, '1 hour', '15 minutes'), on integer micros): each event
    explodes into the width/hop windows containing it via a built-in
    sequence — map-side, then one partial-aggregated shuffle keyed by
    window start."""
    ev = _t(spark, sf_dir, "events")
    width, hop = 3_600_000_000, 900_000_000
    ts_us = ts_micros(ev, "ts")
    first_hop = ((ts_us - width) / hop + 1).cast("long") * hop
    hops = ev.select(
        F.explode(
            F.sequence(first_hop, ts_us, F.lit(hop))
        ).alias("hop_start_us"),
        "value",
    ).where(F.col("hop_start_us") >= 0)
    return hops.groupBy("hop_start_us").agg(
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum("value", 4, "sum_value"),
    )


@register(
    "revenue_share_within_region",
    # ratio-to-report window: nation revenue over its region total;
    # decimal-exact sums, single int-free divide per row
    """
    WITH nat AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(28,4))) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY region) AS DOUBLE)
             AS region_share
    FROM nat
    """,
)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue share of its region via
    a window total over the (tiny) aggregated table — the window runs
    on |nations| rows, never on lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,4)"
    )
    nat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(rev).alias("rev"))
    )
    w = Window.partitionBy("region")
    return nat.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")).alias(
            "region_share"
        ),
    )


@register(
    "hll_partial_union_daily_users",
    # the mergeable-sketch production pattern: per-day sketches stored,
    # unioned across days — each engine asserts its own sketch union
    # against the exact cross-day distinct (hash-matched)
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             count(DISTINCT user_id) AS day_users
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type,
             count(DISTINCT user_id) AS n_exact_users,
             abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                 / count(DISTINCT user_id) - 1) <= 0.1 AS union_ok
      FROM events GROUP BY 1
    )
    SELECT t.event_type, t.n_exact_users,
           (SELECT count(*) FROM daily d WHERE d.event_type = t.event_type)
             AS n_days,
           t.union_ok
    FROM tot t
    """,
)
def q_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch columns (Datasketches HLL, Spark 3.5+): build
    one sketch per (event_type, day) — the shape you'd persist in a
    metrics table — then hll_union_agg them into the cross-day
    distinct. Oracle-checkable acceptance: the exact distinct (hash-
    matched) plus a boolean asserting the sketch union landed within
    10%; DuckDB asserts the same property of its own HLL."""
    ev = _t(spark, sf_dir, "events")
    ev_d = ev.select(
        "event_type", ts_micros(ev, "ts").alias("__us"), "user_id"
    ).select(
        "event_type", F.expr("__us div 86400000000").alias("day"), "user_id"
    )
    daily = ev_d.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    unioned = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = ev_d.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact_users")
    )
    return exact.join(unioned, "event_type").select(
        "event_type",
        "n_exact_users",
        "n_days",
        (
            F.abs(F.col("est").cast("double") / F.col("n_exact_users") - 1)
            <= 0.1
        ).alias("union_ok"),
    )


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
    "ntile_customer_value_quartiles",
    # ntile is SQL-standard (equal buckets, earlier buckets take the
    # remainder) — identical in both engines given a total order
    """
    SELECT q, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_acctbal
    FROM (SELECT c_acctbal,
                 ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS q
          FROM customer)
    GROUP BY q
    """,
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile binning by account balance: ntile(4) over a total
    order (balance desc, key tiebreak), then per-tile rollup. The
    global window is |customers| rows on one reducer — for 100 TB
    tables use selection_quantiles_order_price-style cutoffs instead;
    this is the small-dimension shape."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    tiles = cust.select(
        "c_acctbal", F.ntile(4).over(w).alias("q")
    )
    return tiles.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        decimal_sum("c_acctbal", 2, "sum_acctbal"),
    )


@register(
    "grouping_id_rollup_orders",
    # GROUPING() bits composed manually (g = 2*G(status) + G(priority))
    # — portable across engines, unlike native grouping_id arg orders
    """
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS lvl,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with explicit aggregation-level labels via GROUPING()
    bits — disambiguates 'real NULL key' from 'rolled-up total' rows,
    which coalesce alone cannot."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).alias("lvl"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.col("lvl").cast("long"),
            "n_orders",
        )
    )


@register(
    "pattern_purchase_no_error_between",
    # CEP-lite absence pattern: signup -> purchase with NO error event
    # strictly between, per user, all on epoch-micros ints
    """
    WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t_signup
               FROM events WHERE event_type = 'signup' GROUP BY 1),
         p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
               FROM events e JOIN s USING (user_id)
               WHERE e.event_type = 'purchase'
                 AND epoch_us(e.ts) >= s.t_signup
               GROUP BY 1)
    SELECT p.user_id, s.t_signup, p.t_purchase,
           NOT EXISTS (SELECT 1 FROM events x
                       WHERE x.user_id = p.user_id
                         AND x.event_type = 'error'
                         AND epoch_us(x.ts) > s.t_signup
                         AND epoch_us(x.ts) < p.t_purchase) AS clean_path
    FROM p JOIN s USING (user_id)
    """,
)
def q_pattern_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence pattern (complex-event-processing shape): each user's
    first signup->purchase conversion, flagged clean when NO error
    event falls strictly between the two times. The absence check is
    an aggregated LEFT join on user_id (error minima per window), not
    a correlated per-row probe — all three stages share one key."""
    ev = _t(spark, sf_dir, "events")
    ev_us = ev.select("user_id", "event_type", ts_micros(ev, "ts").alias("ts_us"))
    s = (
        ev_us.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_signup"))
    )
    p = (
        ev_us.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts_us") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    win = p.join(s, "user_id")
    errs = (
        ev_us.where(F.col("event_type") == "error")
        .join(win, "user_id")
        .where(
            (F.col("ts_us") > F.col("t_signup"))
            & (F.col("ts_us") < F.col("t_purchase"))
        )
        .select("user_id")
        .distinct()
        .withColumn("__has_err", F.lit(True))
    )
    return win.join(errs, "user_id", "left").select(
        "user_id",
        "t_signup",
        "t_purchase",
        F.coalesce(~F.col("__has_err"), F.lit(True)).alias("clean_path"),
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
    "xty_embeddings_label",
    # the X^T y pass of a normal-equations linear fit — same
    # fixed-point protocol as gram_matrix_embeddings
    """
    SELECT i, sum(CAST(trunc(xi * CAST(label AS DOUBLE) * 1e12) AS BIGINT)) / 1e12 AS v
    FROM (SELECT CAST(label AS DOUBLE) AS label,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS xi,
                 unnest(range(len(embedding))) AS i
          FROM embeddings)
    GROUP BY i
    """,
)
def q_xty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X^T y at fixed point (functions/pca.py xty_vector): with
    gram_matrix_embeddings these are the ONLY row-scale passes a
    normal-equations ridge fit needs — the d x d solve is driver-side
    dimension-bounded math (test_pca.py checks the full fit vs
    numpy)."""
    from mapreducewordoccurences_spark.functions.pca import xty_vector

    return xty_vector(_t(spark, sf_dir, "embeddings"), "embedding", "label")


@register(
    "corr_quantity_price_by_flag",
    # Pearson r from decimal-exact raw moments (built-in corr() sums
    # doubles in shuffle order — not reproducible, let alone portable);
    # the final combination is a fixed sequence of double ops
    """
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(trunc(x * 1e6) AS BIGINT)) / 1e6 AS sx,
             sum(CAST(trunc(y * 1e6) AS BIGINT)) / 1e6 AS sy,
             sum(CAST(trunc(x * x * 1e6) AS BIGINT)) / 1e6 AS sxx,
             sum(CAST(trunc(y * y * 1e6) AS BIGINT)) / 1e6 AS syy,
             sum(CAST(trunc(x * y * 1e6) AS BIGINT)) / 1e6 AS sxy
      FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
                   CAST(l_extendedprice AS DOUBLE) / 1000 AS y
            FROM lineitem)
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS pearson_r,
           (sxy - sx * sy / n) / n AS covar_pop_k
    FROM m
    """,
)
def q_corr_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/covariance per return flag from decimal-exact raw
    moments: the five sums are order-free (so AQE replans and
    partition changes can't flip a bit), and the closing arithmetic is
    a fixed double-op sequence both engines share. One shuffle, one
    pass."""
    li = _t(spark, sf_dir, "lineitem")
    # y in price-thousands: keeps every unscaled decimal sum under
    # 2^53 so decimal->double converts with one exact-input rounding
    # in both engines (price^2 sums overflowed that bound raw — the
    # same double-rounding ulp drift the gram matrix hit at scale 20);
    # pearson_r is scale-invariant, covar is reported in that unit
    base = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        (F.col("l_extendedprice").cast("double") / 1000).alias("y"),
    )
    # 6-digit fixed-point long sums (the gram-matrix protocol): exact,
    # order-free, and primitive-codegen fast where Decimal128
    # aggregation was the hot-loop cost; Spark's double->bigint cast
    # truncates, DuckDB mirrors with explicit trunc()
    fp = lambda c: F.expr(f"CAST({c} * 1e6 AS BIGINT)")  # noqa: E731
    m = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fp("x")) / F.lit(1e6)).alias("sx"),
        (F.sum(fp("y")) / F.lit(1e6)).alias("sy"),
        (F.sum(fp("x * x")) / F.lit(1e6)).alias("sxx"),
        (F.sum(fp("y * y")) / F.lit(1e6)).alias("syy"),
        (F.sum(fp("x * y")) / F.lit(1e6)).alias("sxy"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    return m.select(
        "l_returnflag", "n", r.alias("pearson_r"), cov.alias("covar_pop_k")
    )


# ---------------------------------------------------------------------------
# Round-4 additions: CDC/SCD2, time-weighted stats, sliding distinct,
# corpus boilerplate, entropy, robust outliers, temperature sampling
# ---------------------------------------------------------------------------

@register(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 13 <> 3
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 13 <> 7
    ), diff AS (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                       AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                    THEN 'unchanged'
                  ELSE 'update' END AS change_type,
             o.o_totalprice AS old_p, n.o_totalprice AS new_p
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type,
           count(*) AS n_keys,
           CAST(SUM(CAST(old_p AS DECIMAL(28,4))) AS DOUBLE) AS old_total,
           CAST(SUM(CAST(new_p AS DECIMAL(28,4))) AS DOUBLE) AS new_total
    FROM diff GROUP BY change_type
    """,
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC derivation: classify every order key across two simulated
    table snapshots (13th keys inserted, 7th deleted, every 5th price
    bumped) as insert/update/delete/unchanged via ONE full outer join
    (operators/cdc.py snapshot_diff), then roll the change stream up
    to per-class counts and decimal-exact totals. At 100 TB this diff
    is exchange-free when both snapshots are bucketed by the key."""
    from mapreducewordoccurences_spark.operators.cdc import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    old = base.where(F.col("o_orderkey") % 13 != 3)
    new = base.where(F.col("o_orderkey") % 13 != 7).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + F.lit(100.0)
        ).otherwise(F.col("o_totalprice")),
    )
    diff = snapshot_diff(
        old, new, keys=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        decimal_sum("old_o_totalprice", scale=4, alias="old_total"),
        decimal_sum("new_o_totalprice", scale=4, alias="new_total"),
    )


@register(
    "scd2_customer_priority",
    """
    WITH s AS (
      SELECT o_custkey, o_orderpriority,
             epoch_us(o_orderdate) AS obs_us, o_orderkey,
             CASE WHEN o_orderpriority IS DISTINCT FROM
                       lag(o_orderpriority) OVER (
                         PARTITION BY o_custkey
                         ORDER BY epoch_us(o_orderdate), o_orderkey)
                  THEN 1 ELSE 0 END AS chg
      FROM orders
    ), r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY obs_us, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM s
    ), g AS (
      SELECT o_custkey, CAST(run AS INT) AS version,
             min(o_orderpriority) AS o_orderpriority,
             min(obs_us) AS valid_from,
             count(*) AS n_observations
      FROM r GROUP BY 1, 2
    )
    SELECT o_custkey, version, o_orderpriority, valid_from,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
             IS NULL AS is_current,
           n_observations
    FROM g
    """,
)
def q_scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (operators/cdc.py scd2_build): the
    order-priority history per customer collapsed into validity
    ranges (valid_from/valid_to epoch-µs, is_current) — the standard
    way a warehouse keeps every historical value of a slowly-changing
    attribute. Gaps-and-islands over one per-key shuffle."""
    from mapreducewordoccurences_spark.operators.cdc import scd2_build

    orders = _t(spark, sf_dir, "orders")
    log = orders.select(
        "o_custkey",
        "o_orderpriority",
        ts_micros(orders, "o_orderdate").alias("obs_us"),
        "o_orderkey",
    )
    return scd2_build(
        log, key="o_custkey", attr="o_orderpriority",
        order_col="obs_us", tiebreak="o_orderkey",
    ).withColumnRenamed("obs_us", "valid_from").select(
        "o_custkey", "version", "o_orderpriority", "valid_from",
        "valid_to", "is_current", "n_observations",
    )


@register(
    "time_weighted_avg_user_value",
    """
    WITH obs AS (
      SELECT user_id, epoch_us(ts) AS us, CAST(value AS DOUBLE) AS v,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               - epoch_us(ts) AS gap
      FROM events
    )
    SELECT user_id, count(*) AS n_obs,
           max(us) - min(us) AS span_us,
           CASE WHEN max(us) - min(us) > 0 THEN
             (sum(CAST(trunc(v * (gap / 1e6) * 1e6) AS BIGINT)) / 1e6)
               / ((max(us) - min(us)) / 1e6)
           END AS twa_value
    FROM obs GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value series
    (operators/timeseries.py time_weighted_avg): duration-weighted
    mean for irregular step-function metrics — the arithmetic mean
    over-weights bursty periods. Fixed-point sums keep it
    bit-portable; one shuffle shared by the window and the agg."""
    from mapreducewordoccurences_spark.operators.timeseries import time_weighted_avg

    return time_weighted_avg(
        _t(spark, sf_dir, "events"),
        key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id",
    )


@register(
    "sliding_distinct_users_3d",
    """
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day AS d FROM du)
    SELECT d AS day,
           count(DISTINCT user_id) AS n_users_3d,
           count(DISTINCT du.day) AS n_days_in_window
    FROM days JOIN du ON du.day BETWEEN days.d - 2 AND days.d
    GROUP BY d
    """,
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users over a trailing 3-day window per day —
    the sliding-window COUNT(DISTINCT) SQL windows can't express
    (no DISTINCT in window frames). Shape: pre-aggregate events to
    distinct (day, user) — the only event-scale shuffle — then
    range-join against the tiny day axis (broadcast; rows ∝ days,
    bounded by retention, not data volume) and count distinct per
    window. The approximate tier for wider windows is
    hll_partial_union_daily_users (mergeable sketch partials)."""
    events = _t(spark, sf_dir, "events")
    du = (
        events.select(ts_micros(events, "ts").alias("__us"), "user_id")
        .select(F.expr("__us div 86400000000").alias("day"), "user_id")
        .distinct()
    )
    days = du.select(F.col("day").alias("d")).distinct()
    joined = du.join(
        F.broadcast(days),
        (F.col("day") >= F.col("d") - 2) & (F.col("day") <= F.col("d")),
    )
    return (
        joined.groupBy("d")
        .agg(
            F.countDistinct("user_id").alias("n_users_3d"),
            F.countDistinct("day").alias("n_days_in_window"),
        )
        .select(F.col("d").alias("day"), "n_users_3d", "n_days_in_window")
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
    "token_entropy_docs",
    """
    WITH tf AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           SUM(c) AS n_tokens,
           count(*) AS n_distinct,
           CAST(ROUND(ln(CAST(SUM(c) AS DOUBLE))
                      - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 4)
                AS DOUBLE) AS entropy,
           count(*) / SUM(c) AS ttr
    FROM tf GROUP BY doc_id
    """,
)
def q_token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution plus
    type-token ratio — low-entropy docs are degenerate/repetitive
    (keyword stuffing, generation loops) and high-TTR ultra-short
    docs are noise; both are standard pre-training quality gates.
    H = ln(n) - Σ c·ln(c)/n over exact integer counts (the only
    floats are the closing ln/divide, rounded to 4). One
    (doc, token) aggregation, one per-doc rollup — shuffles share
    the doc key prefix."""
    docs = _t(spark, sf_dir, "documents")
    from mapreducewordoccurences_spark.functions.text import tokens

    tf = (
        docs.select(
            "doc_id",
            F.explode(tokens("text", lowercase=True)).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    return tf.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            F.log(n.cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n,
            4,
        ).alias("entropy"),
        (F.count(F.lit(1)) / n).alias("ttr"),
    )


@register(
    "mad_outlier_orders",
    """
    WITH med AS (
      SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS med
      FROM orders GROUP BY 1
    ), dev AS (
      SELECT o.o_orderpriority, m.med,
             abs(o.o_totalprice - m.med) AS adev
      FROM orders o JOIN med m USING (o_orderpriority)
    ), mad AS (
      SELECT o_orderpriority, quantile_disc(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.o_orderpriority,
           count(*) AS n_orders,
           min(d.med) AS median_price,
           min(m.mad) AS mad_price,
           count(CASE WHEN d.adev > 3 * m.mad THEN 1 END) AS n_outliers
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY 1
    """,
)
def q_mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per priority class: median + median
    absolute deviation (both exact percentile_disc — actual data
    elements, bit-portable), then count of orders beyond 3 MAD.
    Mean/stddev outlier gates break on the very outliers they hunt;
    MAD doesn't. Two grouped percentile passes + two BROADCAST joins
    (the per-class stats are group-cardinality-sized), so the fact
    table never shuffles beyond the grouped aggregations."""
    orders = _t(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("med").alias("median_price"),
            F.min("mad").alias("mad_price"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
        )
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
    "dedup_containment",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
               [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]
             )) AS shingle
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
            FROM documents)
      WHERE len(s) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, i / least(x.n, y.n) AS containment,
           x.n AS n_shingles_a, y.n AS n_shingles_b
    FROM inter JOIN sizes x ON x.doc_id = doc_a
               JOIN sizes y ON y.doc_id = doc_b
    WHERE i / least(x.n, y.n) >= 0.9
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set containment C(A,B) = |A∩B| / min(|A|,|B|)
    (dedup/prefix.py prefix_filter_containment_pairs): catches a
    short doc embedded verbatim in a long one — high containment,
    LOW Jaccard (the union is dominated by the long side), so
    symmetric near-dup structurally misses it (Broder 1997's
    resemblance/containment split). Computed via the ASYMMETRIC
    prefix-filter SSJoin: the smaller doc probes its rarity-ordered
    prefix against a full token index, so candidate volume is
    Σ df·prefix_df instead of the uncapped posting-list join's Σ df²
    — exact by the containment prefix lemma, no cap to mis-tune."""
    return prefix_filter_containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.9
    )


@register(
    "rolling_zscore_events",
    """
    WITH base AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(value AS DOUBLE) AS v
      FROM events
    ), win AS (
      SELECT user_id, event_id, v,
             SUM(CAST(trunc(v * 1e6) AS BIGINT)) OVER w AS s1,
             SUM(CAST(trunc(v * v * 1e6) AS BIGINT)) OVER w AS s2,
             COUNT(*) OVER w AS cnt
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, cnt AS n_window,
           CAST(ROUND((v - (s1 / 1e6) / cnt)
                      / sqrt((s2 / 1e6) / cnt
                             - ((s1 / 1e6) / cnt) * ((s1 / 1e6) / cnt)),
                      4) AS DOUBLE) AS zscore,
           abs((v - (s1 / 1e6) / cnt)
               / sqrt((s2 / 1e6) / cnt
                      - ((s1 / 1e6) / cnt) * ((s1 / 1e6) / cnt))) > 3
             AS is_anomaly
    FROM win
    WHERE cnt >= 8
      AND (s2 / 1e6) / cnt - ((s1 / 1e6) / cnt) * ((s1 / 1e6) / cnt) > 0
    """,
)
def q_rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event's value scored
    against the mean/stddev of its user's previous ≤24 events. The
    moments come from fixed-point integer window sums (exact,
    order-free); the closing mean/var/z arithmetic is a fixed double
    sequence both engines share, rounded to 4. The frame EXCLUDES the
    current row — standard for anomaly scoring (a spike must not
    inflate its own baseline). One per-user shuffle; window state is
    a 24-row ring — O(1) per row at any scale."""
    events = _t(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_id",
        ts_micros(events, "ts").alias("us"),
        F.col("value").cast("double").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-24, -1)
    )
    win = base.select(
        "user_id",
        "event_id",
        "v",
        F.sum(F.expr("CAST(v * 1e6 AS BIGINT)")).over(w).alias("s1"),
        F.sum(F.expr("CAST(v * v * 1e6 AS BIGINT)")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    mean = (F.col("s1") / F.lit(1e6)) / F.col("cnt")
    var = (F.col("s2") / F.lit(1e6)) / F.col("cnt") - mean * mean
    z = (F.col("v") - mean) / F.sqrt(var)
    return (
        win.where((F.col("cnt") >= 8) & (var > 0))
        .select(
            "user_id",
            "event_id",
            F.col("cnt").alias("n_window"),
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > 3).alias("is_anomaly"),
        )
    )


@register(
    "new_vs_returning_users_daily",
    """
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
    ), first_seen AS (
      SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id
    )
    SELECT du.day,
           count(*) AS n_active,
           count(CASE WHEN f.first_day = du.day THEN 1 END) AS n_new,
           count(CASE WHEN f.first_day < du.day THEN 1 END) AS n_returning
    FROM du JOIN first_seen f USING (user_id)
    GROUP BY du.day
    """,
)
def q_new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning split per day — the product-analytics staple
    that needs each user's FIRST day joined back to their activity.
    Both the first-seen aggregate and the join are keyed user_id, so
    the two shuffles co-locate; the daily rollup is group-bounded.
    (Retention curves by signup week are the cohort variant:
    retention_cohorts_weekly.)"""
    events = _t(spark, sf_dir, "events")
    du = (
        events.select(
            ts_micros(events, "ts").alias("__us"), "user_id"
        )
        .select(F.expr("__us div 86400000000").alias("day"), "user_id")
        .distinct()
    )
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count(F.when(F.col("first_day") == F.col("day"), 1)).alias("n_new"),
            F.count(F.when(F.col("first_day") < F.col("day"), 1)).alias(
                "n_returning"
            ),
        )
    )


@register(
    "interpurchase_time_stats",
    """
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us, event_id
      FROM events WHERE event_type = 'purchase'
    ), gaps AS (
      SELECT user_id,
             (us - lag(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id)) // 1000000 AS gap_s
      FROM p
    )
    SELECT user_id,
           count(*) AS n_gaps,
           quantile_disc(gap_s, 0.5) AS median_gap_s,
           min(gap_s) AS min_gap_s,
           max(gap_s) AS max_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def q_interpurchase_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time distribution per user (purchase cadence):
    lag() gaps in integer seconds, then exact percentile_disc median
    — the robust center for heavy-tailed inter-arrival times. One
    per-user shuffle shared by the window and the aggregate."""
    events = _t(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase").select(
        "user_id", ts_micros(events, "ts").alias("us"), "event_id"
    )
    gaps = p.select(
        "user_id",
        F.expr("(us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) div 1000000").alias(
            "gap_s"
        ),
    )
    return (
        gaps.where(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)"
            ).alias("median_gap_s"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
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
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
               AS to_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           n_transitions / SUM(n_transitions) OVER (PARTITION BY from_type)
             AS prob
    FROM c
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next_type | type) — session-flow modeling, anomaly
    baselines, synthetic-trace generation all start here. One
    per-user shuffle for the lead(), one bounded-cardinality
    aggregation; the row-normalization window runs on the
    #types²-sized aggregate, not the events. The normalizing SUM is
    over integer counts (exact), prob is one int/int divide."""
    events = _t(spark, sf_dir, "events")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(
            Window.partitionBy("user_id").orderBy(
                ts_micros(events, "ts"), F.col("event_id")
            )
        )
        .alias("to_type"),
    )
    c = (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.col("n_transitions") / F.sum("n_transitions").over(w)).alias("prob"),
    )


@register(
    "near_dedup_keepset",
    """
    WITH RECURSIVE fp AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM documents
    ), keep AS (
      SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f
    ), tagged AS (
      SELECT fp.doc_id, fp.source, fp.doc_id <> k.keep_id AS drop_exact
      FROM fp JOIN keep k ON fp.f = k.f
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
               [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)]
             )) AS shingle
      FROM (SELECT d.doc_id, regexp_extract_all(lower(d.text), '[a-z0-9]+') AS s
            FROM documents d JOIN tagged t
              ON d.doc_id = t.doc_id AND NOT t.drop_exact)
      WHERE len(s) >= 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst
      FROM inter JOIN sizes x ON x.doc_id = doc_a
                 JOIN sizes y ON y.doc_id = doc_b
      WHERE i / (x.n + y.n - i) >= 0.8
    ), undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ), reach AS (
      SELECT src AS node, src AS comp FROM undirected
      UNION
      SELECT u.dst AS node, r.comp
      FROM reach r JOIN undirected u ON u.src = r.node
      WHERE r.comp < u.dst
    ), comp AS (
      SELECT node, min(comp) AS comp FROM reach GROUP BY node
    ), status AS (
      SELECT t.doc_id, t.source, t.drop_exact,
             c.node IS NOT NULL AND c.comp <> t.doc_id AS drop_near
      FROM tagged t LEFT JOIN comp c ON c.node = t.doc_id
    )
    SELECT source,
           count(*) AS n_docs,
           count(CASE WHEN drop_exact THEN 1 END) AS n_dropped_exact,
           count(CASE WHEN NOT drop_exact AND drop_near THEN 1 END)
             AS n_dropped_near,
           count(CASE WHEN NOT drop_exact AND NOT drop_near THEN 1 END)
             AS n_kept
    FROM status GROUP BY source
    """,
)
def q_near_dedup_keepset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup cascade, the decision a training pipeline
    actually ships: exact-fingerprint dedup first (cheap, catches
    byte-dups), then EXACT shingle-Jaccard near-dup ON THE EXACT
    SURVIVORS ONLY (the expensive tier never sees content the cheap
    tier already killed), connected components to resolve transitive
    near-dup chains, min-id survivorship, and a per-source keep/drop
    audit. Composes dedup/cascade.py (exact + prefix + clusters).
    The exact tier is the prefix-filtering SSJoin (dedup/prefix.py)
    — bit-identical pair set to the uncapped posting-list join
    (recall 1.0 by the prefix theorem) without its quadratic-in-df
    candidate volume: the sf0.1→sf1 scaling probe measured the
    posting-list formulation at 15.7× growth per 10× data versus
    ~4× for prefix filtering. At corpus scale the tier swaps for
    MinHash-LSH banding with identical downstream plumbing — see
    near_dedup_keepset_lsh, the same operator with
    near_tier='minhash_lsh'."""
    from mapreducewordoccurences_spark.dedup.cascade import dedup_cascade

    return dedup_cascade(
        _t(spark, sf_dir, "documents"),
        near_tier="jaccard_prefix",
        n=3,
        threshold=0.8,
    )


_NEAR_DEDUP_KEEPSET_ORACLE = ORACLES["near_dedup_keepset"]


@register("near_dedup_keepset_lsh", _NEAR_DEDUP_KEEPSET_ORACLE)
def q_near_dedup_keepset_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME cascade with the corpus-scale near-dup tier:
    MinHash-LSH banding generates candidates (ids-only band shuffle,
    no quadratic pass), exact shingle-Jaccard verifies CANDIDATE
    PAIRS ONLY at the same 0.8 threshold. Because candidates are
    exact-verified, the edge set — and hence the keep-set — matches
    the jaccard tier wherever LSH recall is 1.0, so this shares
    near_dedup_keepset's recursive-CTE oracle verbatim: the driver's
    hash-match doubles as an end-to-end LSH-recall gate (miss
    probability at the 16×4 banding: (1-J⁴)¹⁶ < 3e-4 at J=0.8,
    ~0 at the planted dups' J≈1)."""
    from mapreducewordoccurences_spark.dedup.cascade import dedup_cascade

    return dedup_cascade(
        _t(spark, sf_dir, "documents"),
        near_tier="minhash_lsh",
        n=3,
        threshold=0.8,
        num_perm=64,
        bands=16,
        candidate_est_threshold=0.5,
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
    "bigram_logprob_scores",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), dbg AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, count(*) AS c
      FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
            FROM toks WHERE len(t) >= 2)
      GROUP BY 1, 2, 3
    ), cbg AS (
      SELECT w1, w2, SUM(c) AS cb FROM dbg GROUP BY 1, 2
    ), cp AS (
      SELECT w1, SUM(cb) AS cw FROM cbg GROUP BY 1
    ), v AS (
      SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
      FROM (SELECT unnest(t) AS w FROM toks)
    )
    SELECT doc_id,
           CAST(ROUND(-SUM(c * ln((cb + 1) / (cw + v.v))) / SUM(c), 4)
                AS DOUBLE) AS mean_nll,
           SUM(c) AS n_bigrams
    FROM dbg JOIN cbg USING (w1, w2) JOIN cp USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean NLL per doc under the corpus Laplace-smoothed bigram LM
    (functions/ranking.py bigram_logprob) — the word-ORDER fluency
    gate (scrambled text passes the unigram gate, fails this one).
    Corpus model broadcasts at distinct-pair cardinality."""
    from mapreducewordoccurences_spark.functions.ranking import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.round("mean_nll", 4).alias("mean_nll"), "n_bigrams"
    )


@register(
    "winsorized_price_stats",
    """
    WITH bounds AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.01) AS lo,
             quantile_disc(o_totalprice, 0.99) AS hi
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderpriority,
           count(*) AS n_orders,
           min(b.lo) AS p01,
           min(b.hi) AS p99,
           count(CASE WHEN o.o_totalprice < b.lo
                        OR o.o_totalprice > b.hi THEN 1 END) AS n_clipped,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
             / count(*) AS mean_raw,
           CAST(SUM(CAST(least(greatest(o.o_totalprice, b.lo), b.hi)
                         AS DECIMAL(28,4))) AS DOUBLE)
             / count(*) AS mean_winsorized
    FROM orders o JOIN bounds b USING (o_orderpriority)
    GROUP BY 1
    """,
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip at the exact p01/p99 per class) — the
    robust-preprocessing step before any mean-based feature: compare
    mean_raw vs mean_winsorized to see the tail's pull. Exact
    percentile_disc bounds (actual data elements, bit-portable)
    BROADCAST back onto the fact table; the clipped mean uses the
    engine's decimal-exact sum protocol. Two grouped passes, one
    broadcast join — the fact table never re-shuffles."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.01) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        orders.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("lo").alias("p01"),
            F.min("hi").alias("p99"),
            F.count(
                F.when(
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi")),
                    1,
                )
            ).alias("n_clipped"),
            (decimal_sum("o_totalprice", scale=4) / F.count(F.lit(1))).alias(
                "mean_raw"
            ),
            (F.sum(clipped.cast("decimal(28,4)")).cast("double") / F.count(F.lit(1))).alias(
                "mean_winsorized"
            ),
        )
    )


@register(
    "bucketed_auc_embeddings",
    """
    WITH scored AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 100) AS BIGINT) AS bucket,
             CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS pos
      FROM embeddings
    ), hist AS (
      SELECT bucket,
             count(CASE WHEN pos = 1 THEN 1 END) AS np,
             count(CASE WHEN pos = 0 THEN 1 END) AS nn
      FROM scored GROUP BY bucket
    ), cum AS (
      SELECT np, nn,
             COALESCE(SUM(nn) OVER (ORDER BY bucket
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cum_nn_below
      FROM hist
    )
    SELECT SUM(np * (2 * cum_nn_below + nn))
             / (2.0 * SUM(np) * SUM(nn)) AS auc,
           SUM(np) AS n_pos,
           SUM(nn) AS n_neg,
           count(*) AS n_buckets
    FROM cum
    """,
)
def q_bucketed_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-eval AUC (Mann-Whitney U) at scale: classical AUC ranks
    every score globally — a full sort. On a fixed score grid the
    statistic is EXACT for the bucketed scores: AUC = Σ_b
    n_pos(b)·(2·cum_neg(<b) + n_neg(b)) / (2·P·N), all integer
    arithmetic until one closing divide (ties inside a bucket get the
    standard ½ credit). The only data-scale pass is the per-bucket
    label count; the cumulative runs on the bucket axis. Here: score
    = first embedding component, positive = odd label."""
    emb = _t(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.floor(F.element_at("embedding", 1).cast("double") * 100)
        .cast("bigint")
        .alias("bucket"),
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("pos"),
    )
    hist = scored.groupBy("bucket").agg(
        F.count(F.when(F.col("pos") == 1, 1)).alias("np"),
        F.count(F.when(F.col("pos") == 0, 1)).alias("nn"),
    )
    # bounded axis: score buckets (floor(score*100) → ≤ ~200 rows)
    wbelow = (
        Window.partitionBy()
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(wbelow), F.lit(0)).alias("cum_nn_below"),
    )
    return cum.agg(
        (
            F.sum(F.col("np") * (2 * F.col("cum_nn_below") + F.col("nn")))
            / (F.lit(2.0) * F.sum("np") * F.sum("nn"))
        ).alias("auc"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


@register(
    "weekly_churn_users",
    """
    WITH wu AS (
      SELECT DISTINCT epoch_us(ts) // 604800000000 AS week, user_id FROM events
    ), weeks AS (SELECT DISTINCT week FROM wu)
    SELECT wu.week,
           count(*) AS n_active,
           count(CASE WHEN nxt.user_id IS NULL
                        AND EXISTS (SELECT 1 FROM weeks w2
                                    WHERE w2.week = wu.week + 1)
                      THEN 1 END) AS n_churned,
           EXISTS (SELECT 1 FROM weeks w2 WHERE w2.week = wu.week + 1)
             AS has_next_week
    FROM wu LEFT JOIN wu nxt
      ON nxt.week = wu.week + 1 AND nxt.user_id = wu.user_id
    GROUP BY wu.week, has_next_week
    """,
)
def q_weekly_churn_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: users active in week w with NO activity in week
    w+1 (only meaningful when week w+1 is observed — flagged). The
    churn probe is a self LEFT join of the distinct (week, user)
    table shifted by one week — both sides user-keyed, co-partitioned;
    nothing event-scale joins. Complements retention_cohorts_weekly
    (which tracks return-to-product from a signup cohort)."""
    events = _t(spark, sf_dir, "events")
    wu = (
        events.select(ts_micros(events, "ts").alias("__us"), "user_id")
        .select(F.expr("__us div 604800000000").alias("week"), "user_id")
        .distinct()
    )
    weeks = wu.select("week").distinct()
    nxt = wu.select((F.col("week") - 1).alias("week"), F.col("user_id").alias("u2"))
    has_next = weeks.select((F.col("week") - 1).alias("week")).distinct().withColumn(
        "has_next_week", F.lit(True)
    )
    joined = (
        wu.join(nxt, (wu["week"] == nxt["week"]) & (wu["user_id"] == nxt["u2"]), "left")
        .select(wu["week"].alias("week"), wu["user_id"].alias("user_id"), "u2")
        .join(F.broadcast(has_next), "week", "left")
        .select(
            "week",
            "user_id",
            "u2",
            F.coalesce("has_next_week", F.lit(False)).alias("has_next_week"),
        )
    )
    return joined.groupBy("week", "has_next_week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count(
            F.when(F.col("u2").isNull() & F.col("has_next_week"), 1)
        ).alias("n_churned"),
    ).select("week", "n_active", "n_churned", "has_next_week")


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
    "forward_fill_last_purchase",
    """
    SELECT user_id, event_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS last_purchase_value,
           count(CASE WHEN event_type = 'purchase' THEN 1 END)
             OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS purchases_so_far
    FROM events
    """,
)
def q_forward_fill_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-known-state propagation: at every event, the user's most
    recent purchase value — ``last_value(... IGNORE NULLS)`` over a
    running frame, the SQL idiom for forward-fill/LOCF that
    event-sourced state reconstruction and feature backfills use
    constantly (NULL rows are the non-purchase events; the frame
    carries the last non-NULL forward). One per-user shuffle; both
    windows share the sort. Events before the first purchase yield
    NULL — correctly unknown, not zero."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_micros(events, "ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return events.select(
        "user_id",
        "event_id",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .over(w)
        .alias("purchases_so_far"),
    )


@register(
    "filtered_agg_orders",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_totalprice > 300000) AS n_large,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
             AS finished_revenue_dec,
           count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 300000)
             AS n_large_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_filtered_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 aggregate FILTER clause — per-group conditional
    aggregation without CASE pyramids or self-joins, including the
    FILTER + DISTINCT combination a CASE can't express cleanly. One
    scan, one shuffle; Catalyst folds every filtered aggregate into
    the same HashAggregate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__fa_orders")
    df = spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 300000) AS n_large,
               SUM(CAST(o_totalprice AS DECIMAL(28,4)))
                 FILTER (WHERE o_orderstatus = 'F') AS finished_revenue_dec,
               count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 300000)
                 AS n_large_customers
        FROM __fa_orders
        GROUP BY o_orderpriority
        """
    )
    return df.withColumn(
        "finished_revenue_dec", F.col("finished_revenue_dec").cast("double")
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
    "cms_word_counts",
    # Count-min has no DuckDB counterpart, but its acceptance CONTRACT
    # is one-sided and checkable: estimate ≥ exact (never undercounts)
    # and estimate ≤ exact + eps·N with probability ≥ confidence. The
    # exact counts hash-match; the oracle pins cms_ok to TRUE — the
    # Spark side must prove its sketch honors the bound for the
    # value-hash to match.
    """
    WITH counts AS (
      SELECT w AS word, count(*) AS exact_cnt
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      GROUP BY w
    )
    SELECT word, exact_cnt, TRUE AS cms_ok
    FROM counts ORDER BY exact_cnt DESC, word LIMIT 20
    """,
)
def q_cms_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the 20 hottest words —
    the mergeable, constant-memory frequency tier next to the exact
    heavy-hitter op (operators/skew.py). The sketch is a depth·width
    CELL TABLE (functions/cms.py), built with one bounded-exchange
    groupBy and probed with a broadcast join — no full (key, count)
    state anywhere, and sketches of separate streams merge by cell
    addition. Acceptance per probe: exact ≤ estimate ≤ exact +
    (e/width)·N (CMS can only overcount) — emitted as cms_ok, which
    must be uniformly TRUE to hash-match the oracle."""
    import math

    from mapreducewordoccurences_spark.functions.cms import cms_build, cms_estimate
    from mapreducewordoccurences_spark.functions.text import tokens

    width, depth = 2048, 4
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(tokens("text", lowercase=True)).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = counts.orderBy(F.col("exact_cnt").desc(), "word").limit(20)
    sketch = cms_build(words, "word", width=width, depth=depth)
    est = cms_estimate(sketch, top.select("word"), "word", width=width, depth=depth)
    n_total = words.agg(F.count(F.lit(1)).alias("n"))
    eps = math.e / width
    return (
        top.join(est, "word")
        .crossJoin(F.broadcast(n_total))
        .select(
            "word",
            "exact_cnt",
            (
                (F.col("cms_estimate") >= F.col("exact_cnt"))
                & (F.col("cms_estimate") <= F.col("exact_cnt") + F.lit(eps) * F.col("n"))
            ).alias("cms_ok"),
        )
    )


@register(
    "welch_ttest_price_by_status",
    """
    WITH m AS (
      SELECT o_orderstatus AS grp,
             count(*) AS n,
             sum(CAST(trunc(o_totalprice / 1000 * 1e6) AS BIGINT)) / 1e6 AS sx,
             sum(CAST(trunc((o_totalprice / 1000) * (o_totalprice / 1000) * 1e6)
                      AS BIGINT)) / 1e6 AS sxx
      FROM orders WHERE o_orderstatus IN ('F', 'O')
      GROUP BY 1
    ), w AS (
      SELECT a.n AS na, b.n AS nb,
             a.sx / a.n AS ma, b.sx / b.n AS mb,
             (a.sxx - a.sx * a.sx / a.n) / (a.n - 1) AS va,
             (b.sxx - b.sx * b.sx / b.n) / (b.n - 1) AS vb
      FROM m a JOIN m b ON a.grp = 'F' AND b.grp = 'O'
    )
    SELECT na, nb,
           CAST(ROUND(ma - mb, 6) AS DOUBLE) AS mean_diff_k,
           CAST(ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS DOUBLE)
             AS t_stat,
           CAST(ROUND(pow(va / na + vb / nb, 2)
                      / (pow(va / na, 2) / (na - 1)
                         + pow(vb / nb, 2) / (nb - 1)), 2) AS DOUBLE)
             AS welch_df
    FROM w
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between finished and open
    orders' prices (price in thousands to keep the fixed-point sums
    under 2⁵³): the mean-difference significance test that pairs with
    the distribution-shape tests (chi2/PSI/KS in operators/drift.py).
    The five moments per group are order-free fixed-point sums (corr
    protocol); t-statistic and Welch-Satterthwaite df are a fixed
    closing double sequence. One grouped pass over the data; the test
    itself runs on a 2-row aggregate."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_orderstatus").alias("grp"),
        (F.col("o_totalprice") / 1000).alias("x"),
    )
    fp = lambda c: F.expr(f"CAST(({c}) * 1e6 AS BIGINT)")  # noqa: E731
    m = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fp("x")) / F.lit(1e6)).alias("sx"),
        (F.sum(fp("x * x")) / F.lit(1e6)).alias("sxx"),
    )
    a = m.where(F.col("grp") == "F").select(
        F.col("n").alias("na"), F.col("sx").alias("sxa"), F.col("sxx").alias("sxxa")
    )
    b = m.where(F.col("grp") == "O").select(
        F.col("n").alias("nb"), F.col("sx").alias("sxb"), F.col("sxx").alias("sxxb")
    )
    w = a.crossJoin(b).select(
        "na",
        "nb",
        (F.col("sxa") / F.col("na")).alias("ma"),
        (F.col("sxb") / F.col("nb")).alias("mb"),
        ((F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("na")) / (F.col("na") - 1)).alias("va"),
        ((F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("nb")) / (F.col("nb") - 1)).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    dfree = F.pow(se2, 2) / (
        F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
        + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
    )
    return w.select(
        "na",
        "nb",
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff_k"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(dfree, 2).alias("welch_df"),
    )


@register(
    "benford_first_digit_prices",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), obs AS (
      SELECT digit, count(*) AS n FROM digits GROUP BY digit
    ), tot AS (SELECT SUM(n) AS t FROM obs)
    SELECT digit, n,
           n / tot.t AS observed_p,
           CAST(ROUND(log10(1 + 1.0 / digit), 6) AS DOUBLE) AS benford_p,
           CAST(ROUND(abs(n / tot.t - log10(1 + 1.0 / digit)), 6) AS DOUBLE)
             AS abs_dev
    FROM obs CROSS JOIN tot
    """,
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    classic fraud/fabrication screen (organic multiplicative data
    follows P(d) = log10(1+1/d); fabricated numbers don't). One
    digit-bucket count at data scale; the comparison runs on ≤9
    rows. Leading digit via decimal string head — exact integer
    route, no float log in the bucketing."""
    orders = _t(spark, sf_dir, "orders")
    digits = orders.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    benford = F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n") / F.col("t")).alias("observed_p"),
        benford.alias("benford_p"),
        F.round(
            F.abs(F.col("n") / F.col("t") - F.log10(1 + 1.0 / F.col("digit"))), 6
        ).alias("abs_dev"),
    )


@register(
    "user_value_trend",
    """
    WITH base AS (
      SELECT user_id,
             (epoch_us(ts) - 1704067200000000) / 86400000000.0 AS x,
             CAST(value AS DOUBLE) AS y
      FROM events
    ), m AS (
      SELECT user_id, count(*) AS n,
             sum(CAST(trunc(x * 1e6) AS BIGINT)) / 1e6 AS sx,
             sum(CAST(trunc(y * 1e6) AS BIGINT)) / 1e6 AS sy,
             sum(CAST(trunc(x * x * 1e6) AS BIGINT)) / 1e6 AS sxx,
             sum(CAST(trunc(x * y * 1e6) AS BIGINT)) / 1e6 AS sxy
      FROM base GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS DOUBLE)
             AS slope_per_day,
           CAST(ROUND(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                                * (sx / n), 6) AS DOUBLE) AS intercept
    FROM m WHERE n >= 2 AND n * sxx - sx * sx > 0
    """,
)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend (slope per day, intercept) of the value
    series — grouped closed-form regression, the "is this metric
    drifting per entity" primitive behind alerting and cohort health.
    x is days since 2024-01-01 (small magnitudes keep the fixed-point
    sums exact); the four moments are order-free long sums (corr
    protocol) in ONE grouped pass, and the slope algebra is a fixed
    double sequence. Degenerate series (n<2 or zero x-variance) are
    excluded. Complements the global ridge fit (functions/pca.py):
    that is one model over all rows, this is a million tiny models,
    one per key — no driver state either way."""
    events = _t(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        ((ts_micros(events, "ts") - F.lit(1704067200000000)) / F.lit(86400000000.0)).alias("x"),
        F.col("value").cast("double").alias("y"),
    )
    fp = lambda c: F.expr(f"CAST(({c}) * 1e6 AS BIGINT)")  # noqa: E731
    m = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fp("x")) / F.lit(1e6)).alias("sx"),
        (F.sum(fp("y")) / F.lit(1e6)).alias("sy"),
        (F.sum(fp("x * x")) / F.lit(1e6)).alias("sxx"),
        (F.sum(fp("x * y")) / F.lit(1e6)).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.where((n >= 2) & (n * sxx - sx * sx > 0)).select(
        "user_id",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(sy / n - slope * (sx / n), 6).alias("intercept"),
    )


@register(
    "streaming_psi_monitor_batch",
    # The ONE streaming-path query the oracle can check: the monitor's
    # per-batch PSI is pure arithmetic over bucket counts, so the SQL
    # mirror recomputes what the foreachBatch loop must have written.
    """
    WITH a AS (
      SELECT CAST(floor(value / 5) AS BIGINT) AS bucket, count(*) AS na
      FROM events GROUP BY 1
    ), b AS (
      SELECT CAST(floor(value / 5) AS BIGINT) AS bucket, count(*) AS nb
      FROM events WHERE user_id % 2 = 0 GROUP BY 1
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
    SELECT CAST(0 AS BIGINT) AS batch_id,
           SUM(term_fp) / 1e8 AS psi,
           count(*) AS n_buckets,
           SUM(na) AS n_batch,
           SUM(nb) AS n_ref
    FROM terms
    """,
)
def q_streaming_psi_monitor_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift monitor DRIVEN END-TO-END inside a catalog
    query: freeze a reference histogram (even-user events), run the
    events parquet through readStream + foreachBatch PSI scoring with
    trigger(availableNow) — one deterministic micro-batch — and
    return the metrics row the monitor appended. The oracle recomputes
    the same PSI relationally, so a value-hash match proves the
    STREAMING path (source → foreachBatch → sink) computed exactly
    what batch SQL says it should. Fresh temp checkpoint/metrics dirs
    per invocation keep reruns deterministic (batch_id is always 0)."""
    import shutil
    import tempfile

    from mapreducewordoccurences_spark.streaming.drift_monitor import (
        freeze_reference,
        start_psi_monitor,
    )

    events = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="psi_monitor_q_")
    try:
        ref_dir = f"{work}/ref"
        metrics = f"{work}/metrics"
        ckpt = f"{work}/ckpt"
        freeze_reference(
            events.where(F.col("user_id") % 2 == 0), "value", 5.0, ref_dir
        )
        # file streams need a DIRECTORY source; glob-filter to the one
        # table file inside the sf dir
        stream = (
            spark.readStream.schema(events.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        q = start_psi_monitor(stream, "value", 5.0, ref_dir, metrics, ckpt)
        q.awaitTermination(300)
        # batch_id is a partition column of the metrics log (the
        # idempotent-replay layout), so its read-back type is inferred
        # from the directory name — cast to the contract's bigint
        out = spark.read.parquet(metrics).select(
            F.col("batch_id").cast("bigint").alias("batch_id"),
            "psi", "n_buckets", "n_batch", "n_ref",
        )
        # materialize before the temp dirs vanish
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "quantile_merge_daily_value",
    # Mergeable quantile partials: per-day equi-width histograms union
    # by bucket addition (like the HLL/CMS partials), and any quantile
    # is answerable from the merged histogram with error ≤ one bucket
    # width. The acceptance bound is exact arithmetic both engines share.
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value / 2) AS BIGINT) AS bucket,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), merged AS (
      SELECT bucket, SUM(n) AS n FROM daily GROUP BY bucket
    ), cum AS (
      SELECT bucket, n,
             SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cn,
             SUM(n) OVER () AS t
      FROM merged
    ), est AS (
      SELECT min(CASE WHEN cn >= 0.5 * t THEN bucket END) AS p50_bucket,
             min(CASE WHEN cn >= 0.95 * t THEN bucket END) AS p95_bucket,
             min(t) AS n_total
      FROM cum
    ), exact AS (
      SELECT quantile_disc(value, 0.5) AS p50_exact,
             quantile_disc(value, 0.95) AS p95_exact
      FROM events
    )
    SELECT est.n_total,
           p50_bucket * 2.0 AS p50_bucket_lo,
           p95_bucket * 2.0 AS p95_bucket_lo,
           p50_exact >= p50_bucket * 2.0
             AND p50_exact < (p50_bucket + 1) * 2.0 AS p50_ok,
           p95_exact >= p95_bucket * 2.0
             AND p95_exact < (p95_bucket + 1) * 2.0 AS p95_ok
    FROM est CROSS JOIN exact
    """,
)
def q_quantile_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile partials — the rollup pattern exact
    percentiles can't do (you cannot merge two medians): each day
    keeps an equi-width value histogram; histograms union by bucket
    addition (same algebra as the HLL/CMS partials); any percentile
    reads off the merged cumulative with error ≤ one bucket width.
    The query proves the contract: the exact percentile (computed
    directly) must land inside the bucket the merged histogram
    selected — p50_ok/p95_ok hash-match TRUE. Day-partition counts
    are the only data-scale pass; merge + cumulative run on the
    bucket axis."""
    events = _t(spark, sf_dir, "events")
    daily = (
        events.select(
            ts_micros(events, "ts").alias("__us"),
            F.floor(F.col("value") / 2).cast("bigint").alias("bucket"),
        )
        .select(F.expr("__us div 86400000000").alias("day"), "bucket")
        .groupBy("day", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merged = daily.groupBy("bucket").agg(F.sum("n").alias("n"))
    # bounded axis: merged histogram buckets (value/2 over a bounded
    # value domain), not the event axis
    wcum = (
        Window.partitionBy()
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = merged.select(
        "bucket",
        "n",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("n").over(Window.partitionBy()).alias("t"),
    )
    est = cum.agg(
        F.min(F.when(F.col("cn") >= 0.5 * F.col("t"), F.col("bucket"))).alias(
            "p50_bucket"
        ),
        F.min(F.when(F.col("cn") >= 0.95 * F.col("t"), F.col("bucket"))).alias(
            "p95_bucket"
        ),
        F.min("t").alias("n_total"),
    )
    exact = events.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "p50_exact"
        ),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias(
            "p95_exact"
        ),
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_total",
        (F.col("p50_bucket") * 2.0).alias("p50_bucket_lo"),
        (F.col("p95_bucket") * 2.0).alias("p95_bucket_lo"),
        (
            (F.col("p50_exact") >= F.col("p50_bucket") * 2.0)
            & (F.col("p50_exact") < (F.col("p50_bucket") + 1) * 2.0)
        ).alias("p50_ok"),
        (
            (F.col("p95_exact") >= F.col("p95_bucket") * 2.0)
            & (F.col("p95_exact") < (F.col("p95_bucket") + 1) * 2.0)
        ).alias("p95_ok"),
    )


@register(
    "readability_scores",
    """
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(ROUND(206.835 - 1.015 * (n_words / n_sentences)
                      - 84.6 * (n_syllables / n_words), 4) AS DOUBLE)
             AS flesch_score
    FROM t WHERE n_words > 0
    """,
)
def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from regex-countable proxies
    (sentences = terminal-punctuation runs, floor 1; syllables =
    vowel-group runs — the standard cheap approximation). A
    complexity gate alongside quality_score/text_stats: too-easy AND
    too-hard tails both correlate with low training value. Map-only
    — three regexp counts in one scan, no shuffle at all."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias(
            "n_words"
        ),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")).alias(
            "n_syllables"
        ),
    )
    return t.where(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables") / F.col("n_words")),
            4,
        ).alias("flesch_score"),
    )


@register(
    "modal_event_type_per_user",
    """
    SELECT user_id, modal_type, modal_count, n_events FROM (
      SELECT user_id, event_type AS modal_type, n AS modal_count,
             SUM(n) OVER (PARTITION BY user_id) AS n_events,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM (SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY 1, 2))
    WHERE rn = 1
    """,
)
def q_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per key: the most frequent event type per
    user, ties broken alphabetically — built-in mode() is
    tie-nondeterministic in a distributed engine, so the portable
    form is min_by over a (-count, value) struct on the grouped
    count. Two shuffles sharing the user_id prefix."""
    events = _t(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.groupBy("user_id").agg(
        F.min_by(
            F.col("event_type"), F.struct((-F.col("n")).alias("nn"), "event_type")
        ).alias("modal_type"),
        F.max("n").alias("modal_count"),
        F.sum("n").alias("n_events"),
    )


@register(
    "monthly_revenue_growth",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(month AS DATE) AS month, n_orders, revenue,
           CAST(ROUND(revenue / lag(revenue) OVER (ORDER BY month) - 1, 6)
                AS DOUBLE) AS mom_growth
    FROM m
    """,
)
def q_monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: decimal-exact monthly revenue, then a
    lag() ratio on the MONTH-COUNT-sized aggregate (the unpartitioned
    window runs over dozens of rows, never data). First month's
    growth is NULL — unknown, not zero."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(
        decimal_sum("o_totalprice", 4, "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # bounded axis: calendar months (one row per month of history)
    w = Window.partitionBy().orderBy("month")
    return m.select(
        F.col("month").cast("date").alias("month"),
        "n_orders",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 6).alias(
            "mom_growth"
        ),
    )


@register(
    "longest_activity_streak",
    """
    WITH du AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ), isl AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM du
    ), streaks AS (
      SELECT user_id, count(*) AS streak_days, min(day) AS streak_start
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id, longest_streak, longest_streak_start, n_streaks FROM (
      SELECT user_id, streak_days AS longest_streak,
             streak_start AS longest_streak_start,
             COUNT(*) OVER (PARTITION BY user_id) AS n_streaks,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, streak_start) AS rn
      FROM streaks)
    WHERE rn = 1
    """,
)
def q_longest_activity_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    day - row_number() islands trick: consecutive days share a
    constant difference, so a plain groupBy collapses each run. All
    three stages (distinct days, island window, streak rollup) are
    user-keyed — one shuffle, no global ordering."""
    events = _t(spark, sf_dir, "events")
    du = (
        events.select(
            "user_id", ts_micros(events, "ts").alias("__us")
        )
        .select("user_id", F.expr("__us div 86400000000").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = du.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days"), F.min("day").alias("streak_start")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_days").alias("longest_streak"),
        F.min_by(
            F.col("streak_start"),
            F.struct((-F.col("streak_days")).alias("ns"), "streak_start"),
        ).alias("longest_streak_start"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@register(
    "session_conversion_rate",
    """
    WITH ordered AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, event_type,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
        FROM ordered
    ), per_session AS (
        SELECT user_id, session_id,
               count(*) AS n_events,
               count(CASE WHEN event_type = 'view' THEN 1 END) > 0 AS has_view,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
                 AS has_purchase
        FROM sessions GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           count(CASE WHEN has_view THEN 1 END) AS n_with_view,
           count(CASE WHEN has_view AND has_purchase THEN 1 END) AS n_converted,
           count(CASE WHEN has_view AND has_purchase THEN 1 END)
             / count(CASE WHEN has_view THEN 1 END) AS view_to_purchase_rate,
           SUM(n_events) AS n_events_total
    FROM per_session
    """,
)
def q_session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped conversion: sessionize (30-min gaps), then the
    share of view-containing sessions that also purchased — the
    funnel restated at SESSION grain, where product analytics
    actually reports it (user-grain funnels over-credit returns days
    later). One user-keyed shuffle end-to-end: both windows, the
    per-session rollup, and the final count all reuse the same
    partitioning; the closing rate is one int/int divide."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = events.select(
        "user_id", "event_id", "event_type", ts_micros(events, "ts").alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sessions = ordered.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.when(F.col("event_type") == "view", 1)) > 0).alias("has_view"),
        (F.count(F.when(F.col("event_type") == "purchase", 1)) > 0).alias(
            "has_purchase"
        ),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count(F.when(F.col("has_view"), 1)).alias("n_with_view"),
        F.count(F.when(F.col("has_view") & F.col("has_purchase"), 1)).alias(
            "n_converted"
        ),
        (
            F.count(F.when(F.col("has_view") & F.col("has_purchase"), 1))
            / F.count(F.when(F.col("has_view"), 1))
        ).alias("view_to_purchase_rate"),
        F.sum("n_events").alias("n_events_total"),
    )


@register(
    "grouping_sets_distinct_users",
    """
    SELECT event_type,
           epoch_us(ts) // 86400000000 AS day,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY GROUPING SETS ((event_type), (day), (event_type, day), ())
    """,
)
def q_grouping_sets_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain DISTINCT counts in one statement: distinct users by
    type, by day, by (type, day), and overall via GROUPING SETS — the
    expand operator replicates rows per grouping set and the distinct
    aggregation runs once, instead of four hand-written queries
    scanning four times. At 100 TB the expand multiplies the shuffle
    by #sets; that is still one scan versus four, and per-set
    partial distinct state is key-bounded."""
    events = _t(spark, sf_dir, "events")
    events.select(
        "event_type",
        ts_micros(events, "ts").alias("__us"),
        "user_id",
    ).selectExpr(
        "event_type", "__us div 86400000000 AS day", "user_id"
    ).createOrReplaceTempView("__gsd_events")
    return spark.sql(
        """
        SELECT event_type, day,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM __gsd_events
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day), ())
        """
    )


@register(
    "zipf_slope_vocabulary",
    """
    WITH vocab AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      GROUP BY w
    ), ranked AS (
      SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM vocab
    ), m AS (
      SELECT count(*) AS n,
             sum(CAST(trunc(x * 1e6) AS BIGINT)) / 1e6 AS sx,
             sum(CAST(trunc(y * 1e6) AS BIGINT)) / 1e6 AS sy,
             sum(CAST(trunc(x * x * 1e6) AS BIGINT)) / 1e6 AS sxx,
             sum(CAST(trunc(x * y * 1e6) AS BIGINT)) / 1e6 AS sxy
      FROM ranked
    )
    SELECT n AS vocab_size,
           CAST(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS DOUBLE)
             AS zipf_slope
    FROM m
    """,
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) over the
    corpus vocabulary — natural language sits near −1; templated or
    synthetic corpora deviate hard, making this a cheap whole-corpus
    naturalness gate. Moments use the fixed-point protocol;
    x = ln(rank) is positive, so trunc/CAST agree across engines.

    Scale design — NO global vocabulary sort: an earlier formulation
    ranked the whole vocabulary with an unpartitioned row_number (a
    single-partition sort over 10⁸-10⁹ words web-scale). But y=ln(c)
    is CONSTANT within a frequency-tie class, so which tied word gets
    which rank never affects the OLS moments — only each class's rank
    block [offset+1, offset+size] does. So: group words into
    frequency classes (distinct counts k are ≤ √(2·Σc) — ~450k even
    at 100T tokens, a bounded axis safe to window over), cumulate
    offsets on that small axis, then regenerate the rank blocks
    distributively with sequence+explode, chunked to 64k so a giant
    class (the hapaxes are ~half the vocabulary) spreads across
    tasks instead of exploding inside one. Identical (x, y) multiset
    → identical sums as the ranked formulation, shared oracle."""
    docs = _t(spark, sf_dir, "documents")
    from mapreducewordoccurences_spark.functions.text import tokens

    vocab = (
        docs.select(F.explode(tokens("text", lowercase=True)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    classes = vocab.groupBy("c").agg(F.count(F.lit(1)).alias("s"))
    # bounded axis: distinct frequency values (see docstring)
    wcls = (
        Window.partitionBy()
        .orderBy(F.col("c").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = classes.select(
        "c", "s", F.coalesce(F.sum("s").over(wcls), F.lit(0)).alias("o")
    )
    _CH = 1 << 16
    chunks = offs.select(
        "c",
        "s",
        "o",
        F.explode(
            F.sequence(F.lit(0).cast("long"), ((F.col("s") - 1) / _CH).cast("long"))
        ).alias("k"),
    ).repartition("c", "k")
    ranked = chunks.select(
        "c",
        F.explode(
            F.sequence(
                F.col("o") + F.col("k") * _CH + 1,
                F.least(
                    F.col("o") + (F.col("k") + 1) * _CH,
                    F.col("o") + F.col("s"),
                ),
            )
        ).alias("r"),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    fp = lambda c: F.expr(f"CAST(({c}) * 1e6 AS BIGINT)")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(fp("x")) / F.lit(1e6)).alias("sx"),
        (F.sum(fp("y")) / F.lit(1e6)).alias("sy"),
        (F.sum(fp("x * x")) / F.lit(1e6)).alias("sxx"),
        (F.sum(fp("x * y")) / F.lit(1e6)).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    return m.select(
        n.alias("vocab_size"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4).alias("zipf_slope"),
    )


@register(
    "classifier_eval_metrics",
    """
    WITH pred AS (
      SELECT CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y_true,
             CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END
               AS y_pred
      FROM embeddings
    ), cm AS (
      SELECT count(CASE WHEN y_true = 1 AND y_pred = 1 THEN 1 END) AS tp,
             count(CASE WHEN y_true = 0 AND y_pred = 1 THEN 1 END) AS fp,
             count(CASE WHEN y_true = 1 AND y_pred = 0 THEN 1 END) AS fn,
             count(CASE WHEN y_true = 0 AND y_pred = 0 THEN 1 END) AS tn
      FROM pred
    )
    SELECT tp, fp, fn, tn,
           (tp + tn) / (tp + fp + fn + tn) AS accuracy,
           tp / (tp + fp) AS precision,
           tp / (tp + fn) AS recall,
           CAST(ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS DOUBLE) AS f1
    FROM cm
    """,
)
def q_classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation at scale: confusion matrix +
    accuracy/precision/recall/F1 for a deterministic rule classifier
    (sign of the first embedding component) against the odd-label
    target — with bucketed_auc_embeddings this is the model-eval
    pair (threshold metrics + ranking metric). ONE counting pass;
    every metric is integer counts and single divides — no float
    accumulation anywhere."""
    emb = _t(spark, sf_dir, "embeddings")
    pred = emb.select(
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("y_true"),
        F.when(F.element_at("embedding", 1).cast("double") > 0, 1)
        .otherwise(0)
        .alias("y_pred"),
    )
    cm = pred.agg(
        F.count(F.when((F.col("y_true") == 1) & (F.col("y_pred") == 1), 1)).alias("tp"),
        F.count(F.when((F.col("y_true") == 0) & (F.col("y_pred") == 1), 1)).alias("fp"),
        F.count(F.when((F.col("y_true") == 1) & (F.col("y_pred") == 0), 1)).alias("fn"),
        F.count(F.when((F.col("y_true") == 0) & (F.col("y_pred") == 0), 1)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        tp, fp, fn, tn,
        ((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"),
        (tp / (tp + fp)).alias("precision"),
        (tp / (tp + fn)).alias("recall"),
        F.round(2.0 * tp / (2.0 * tp + fp + fn), 6).alias("f1"),
    )


@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state snapshot: each user's most recent event — the
    single most common window query in any event store, and the read
    side of CDC latest-per-key (operators/merge.py latest_per_key is
    the same rank-1 shape keyed by version). Map-side
    WindowGroupLimit keeps one candidate row per user per partition
    BEFORE the shuffle, so the exchange carries users×partitions
    rows, not events."""
    from mapreducewordoccurences_spark.operators.merge import latest_per_key

    events = _t(spark, sf_dir, "events")
    # (ts, event_id) is unique per user; fold into one sortable struct
    # so latest_per_key's single version column applies
    keyed = events.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.struct(
            ts_micros(events, "ts").alias("us"), F.col("event_id").alias("eid")
        ).alias("__version"),
    )
    return latest_per_key(keyed, ["user_id"], "__version").select(
        "user_id", "event_id", "event_type", "value"
    )


@register(
    "order_fulfillment_lag_stats",
    """
    WITH lags AS (
      SELECT o.o_orderpriority,
             (epoch_us(min(l.l_shipdate)) - epoch_us(o.o_orderdate))
               // 86400000000 AS first_ship_lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           quantile_disc(first_ship_lag_days, 0.5) AS median_lag_days,
           quantile_disc(first_ship_lag_days, 0.9) AS p90_lag_days,
           min(first_ship_lag_days) AS min_lag_days,
           max(first_ship_lag_days) AS max_lag_days
    FROM lags GROUP BY o_orderpriority
    """,
)
def q_order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment latency: days from order to FIRST shipment, exact
    percentiles per priority class — the accumulating-snapshot fact
    pattern (process-stage durations) every operations warehouse
    maintains. The order↔lineitem join and the per-order min share
    the orderkey shuffle; integer day lags keep the percentiles
    bit-portable."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lags = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(ts_micros(li, "l_shipdate")).alias("__first_ship_us"))
        .select(
            "o_orderpriority",
            (
                F.col("__first_ship_us") - ts_micros(orders, "o_orderdate")
            ).alias("__diff_us"),
        )
        .select(
            "o_orderpriority",
            F.expr("__diff_us div 86400000000").alias("first_ship_lag_days"),
        )
    )
    return lags.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY first_ship_lag_days)"
        ).alias("median_lag_days"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY first_ship_lag_days)"
        ).alias("p90_lag_days"),
        F.min("first_ship_lag_days").alias("min_lag_days"),
        F.max("first_ship_lag_days").alias("max_lag_days"),
    )


# (_EXACT_PAIRS_CTE is defined near the top of the file, above its
# first use by the verified sketch pair-set queries.)


@register(
    "dedup_minhash_lsh",
    _EXACT_PAIRS_CTE.format(thr=0.7)
    + """
    SELECT count(*) AS n_exact_pairs, TRUE AS recall_ok FROM exact
    """,
)
def q_minhash_recall_acceptance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-checkable contract of the MinHash-LSH tier: its
    banded candidates must RECALL ≥ 0.9 of the exact Jaccard-0.7
    pairs (observed 1.0 at every tested sf; margin below). The LSH
    pair set itself is hash-seeded and not portable SQL — but the
    exact-pair count IS (hash-matched), and recall_ok must come back
    TRUE for the value-hash to match, so the driver now verifies the
    sketch tier's accuracy claim, not just that it runs. Runs both
    tiers; the shingle/signature shuffles are the tiers' own."""
    from mapreducewordoccurences_spark.dedup.minhash import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    exact = prefix_filter_jaccard_pairs(
        docs, n=3, threshold=0.7
    ).select("doc_a", "doc_b")
    lsh = minhash_lsh_pairs(
        docs, num_perm=64, bands=16, threshold=0.7
    ).select("doc_a", "doc_b")
    hits = exact.join(lsh, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return n_exact.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact").alias("n_exact_pairs"),
        (
            (F.col("n_exact") == 0)
            | (F.col("n_hits") / F.col("n_exact") >= 0.9)
        ).alias("recall_ok"),
    )


@register(
    "dedup_simhash",
    _EXACT_PAIRS_CTE.format(thr=0.8)
    + """
    SELECT count(*) AS n_exact_pairs, TRUE AS recall_ok FROM exact
    """,
)
def q_simhash_recall_acceptance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same acceptance contract for the SimHash tier: pigeonhole
    candidates at Hamming ≤ 8 must recall ≥ 0.85 of the exact
    Jaccard-0.8 pairs (observed 0.96-1.0; SimHash is a lossier
    sketch than MinHash, hence the lower floor)."""
    docs = _t(spark, sf_dir, "documents")
    exact = prefix_filter_jaccard_pairs(
        docs, n=3, threshold=0.8
    ).select("doc_a", "doc_b")
    sim = simhash_near_dup_pairs(docs, max_distance=8).select("doc_a", "doc_b")
    hits = exact.join(sim, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return n_exact.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact").alias("n_exact_pairs"),
        (
            (F.col("n_exact") == 0)
            | (F.col("n_hits") / F.col("n_exact") >= 0.85)
        ).alias("recall_ok"),
    )


@register(
    "dedup_threshold_sensitivity",
    _EXACT_PAIRS_CTE.format(thr=0.0).replace(
        "WHERE i / (x.n + y.n - i) >= 0.0",
        "WHERE i / (x.n + y.n - i) >= 0.5",
    )
    + """
    , scored AS (
      SELECT i / (x.n + y.n - i) AS j
      FROM inter JOIN sizes x ON x.doc_id = doc_a
                 JOIN sizes y ON y.doc_id = doc_b
      WHERE i / (x.n + y.n - i) >= 0.5
    )
    SELECT count(*) AS n_pairs_50,
           count(CASE WHEN j >= 0.7 THEN 1 END) AS n_pairs_70,
           count(CASE WHEN j >= 0.8 THEN 1 END) AS n_pairs_80,
           count(CASE WHEN j >= 0.9 THEN 1 END) AS n_pairs_90,
           count(CASE WHEN j >= 0.999999 THEN 1 END) AS n_pairs_exact
    FROM scored
    """,
)
def q_dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold tuning in ONE pass: pair counts at Jaccard ≥
    0.5/0.7/0.8/0.9/1.0 from a single candidate generation — how a
    data engineer picks the near-dup cutoff (where does the pair
    count elbow?) without re-running the pipeline per threshold.
    Same single-shuffle posting-list plan as the dedup tier, scored
    once, counted at every cutoff via conditional aggregation."""
    docs = _t(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.5)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs_50"),
        F.count(F.when(F.col("jaccard") >= 0.7, 1)).alias("n_pairs_70"),
        F.count(F.when(F.col("jaccard") >= 0.8, 1)).alias("n_pairs_80"),
        F.count(F.when(F.col("jaccard") >= 0.9, 1)).alias("n_pairs_90"),
        F.count(F.when(F.col("jaccard") >= 0.999999, 1)).alias("n_pairs_exact"),
    )


@register(
    "session_window_batch_counts",
    """
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation run in BATCH mode,
    cross-checked against the gaps-and-islands formulation (the
    oracle): both define a session break as a silence strictly longer
    than 30 minutes (session_window's half-open [ts, ts+gap) merge ≡
    islands' gap > 1800s; the testdata has no exact-1800s gap, probed
    at every sf). This is the same operator the streaming path uses
    (streaming/windows.py session_event_counts) — batch/stream
    session semantics verified identical through the driver gate."""
    events = _t(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        F.timestamp_micros(ts_micros(events, "ts")).alias("__ts"),
    )
    per_session = ev.groupBy(
        "user_id", F.session_window("__ts", "30 minutes").alias("__w")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
    )


@register(
    "approx_topk_words_acceptance",
    # approx_top_k's sketch internals aren't portable; its CONTRACT is:
    # genuinely heavy items must surface. Exact top-5 hash-matches;
    # the containment boolean must be uniformly TRUE.
    """
    WITH counts AS (
      SELECT w AS word, count(*) AS exact_cnt
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      GROUP BY w
    )
    SELECT word, exact_cnt, TRUE AS in_approx_topk
    FROM counts ORDER BY exact_cnt DESC, word LIMIT 5
    """,
)
def q_approx_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1's approx_top_k sketch vs the exact heavy hitters:
    the true top-5 words (hash-matched exact counts) must appear in
    the sketch's top-10 — heavily frequent items are exactly what a
    frequent-items sketch guarantees it cannot drop. The sketch
    aggregates distributed with constant memory; the exact side is
    the same grouped count the wordcount core uses."""
    from mapreducewordoccurences_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text", lowercase=True)).alias("word"))
    top5 = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "word")
        .limit(5)
    )
    approx = words.agg(F.expr("approx_top_k(word, 10)").alias("__tk")).select(
        F.explode("__tk").alias("__e")
    ).select(F.col("__e.item").alias("word"), F.lit(True).alias("__in"))
    return (
        top5.join(approx, "word", "left")
        .select(
            "word",
            "exact_cnt",
            F.coalesce("__in", F.lit(False)).alias("in_approx_topk"),
        )
    )


def _bpe_oracle(rounds: int = 10) -> str:
    """Unrolled BPE-learning recurrence for DuckDB — the iterative
    argmax loop stated as chained CTEs, one per merge round (the
    pagerank-oracle pattern). The trick that makes the greedy
    left-to-right non-overlapping merge portable SQL: encode each
    word's symbol array as a DOUBLE-separator string (';a;;b;;c;',
    every symbol individually wrapped), where the pair (a,b) is the
    substring ';a;;b;' and DuckDB's replace() — which scans left to
    right and resumes AFTER each replacement — performs exactly the
    greedy non-overlapping fold (the doubled separator means a
    replacement never consumes the boundary of the next match; a
    single-separator encoding would). Separator ';' can't collide:
    symbols come from [a-z0-9]+ tokens. Every vocab CTE is
    MATERIALIZED: each round references its predecessor twice
    (pair counts + merge application), so DuckDB's default CTE
    inlining would expand the chain 2^rounds times."""
    head = """
    WITH v0 AS MATERIALIZED (
      SELECT word, count(*) AS freq,
             ';' || regexp_replace(word, '(.)', '\\1;;', 'g') AS s
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
            FROM documents)
      GROUP BY word
    )"""
    steps = []
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(f"""
    , pc{k} AS MATERIALIZED (
      SELECT p.lft, p.rgt, CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM (
        SELECT freq,
               unnest([{{'lft': syms[i], 'rgt': syms[i+1]}}
                       for i in range(1, len(syms))]) AS p
        FROM (SELECT freq, str_split(trim(s, ';'), ';;') AS syms FROM v{p})
        WHERE len(syms) >= 2
      )
      GROUP BY p.lft, p.rgt
    ), t{k} AS MATERIALIZED (
      SELECT lft, rgt, pair_count FROM pc{k}
      WHERE pair_count >= 2
      ORDER BY pair_count DESC, lft, rgt LIMIT 1
    ), v{k} AS MATERIALIZED (
      SELECT word, freq,
             CASE WHEN (SELECT count(*) FROM t{k}) = 0 THEN s
                  ELSE replace(s,
                               ';' || (SELECT lft FROM t{k}) || ';;'
                                   || (SELECT rgt FROM t{k}) || ';',
                               ';' || (SELECT lft FROM t{k})
                                   || (SELECT rgt FROM t{k}) || ';')
             END AS s
      FROM v{p}
    )""")
    tail = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({k} AS INT) AS merge_rank, lft AS "left",
           rgt AS "right", lft || rgt AS merged, pair_count FROM t{k}"""
        for k in range(1, rounds + 1)
    )
    return head + "".join(steps) + "\n" + tail


@register("bpe_learn_merges", _bpe_oracle(10))
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-vocabulary learning on the corpus
    (functions/bpe.py): 10 merge rounds over the word-frequency
    table. One corpus-scale pass total — every round after it runs on
    the VOCABULARY (distinct words × symbols, frequency-weighted),
    which is how production BPE trainers scale; merge application is
    a built-in aggregate() fold (no Python row path), argmax is a
    one-row driver scalar per round, lineage is checkpoint-truncated
    (the connected-components discipline). Fully oracle-gated: every
    quantity is integer (pair counts) or exact string manipulation
    with a total-order argmax tiebreak, so the 10-round loop is
    bit-portable and the DuckDB oracle unrolls the identical
    recurrence through chained CTEs (see _bpe_oracle); additionally
    differential-tested against a pure-Python BPE reference in
    tests/test_bpe.py."""
    from mapreducewordoccurences_spark.functions.bpe import bpe_merge_table

    return bpe_merge_table(
        spark, _t(spark, sf_dir, "documents"), num_merges=10
    )


@register(
    "quality_stratified_corpus_sample",
    """
    WITH tf AS (
      SELECT doc_id, w AS word, count(*) AS tf
      FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      GROUP BY 1, 2
    ), vocab AS (
      SELECT word, SUM(tf) AS cw FROM tf GROUP BY word
    ), tot AS (SELECT CAST(SUM(cw) AS DOUBLE) AS total FROM vocab),
    nll AS (
      SELECT doc_id,
             CAST(ROUND(-SUM(tf.tf * ln(vocab.cw / tot.total)) / SUM(tf.tf), 4)
                  AS DOUBLE) AS mean_nll,
             SUM(tf.tf) AS n_tokens
      FROM tf JOIN vocab USING (word) CROSS JOIN tot
      GROUP BY doc_id
    ), bounds AS (
      SELECT quantile_disc(mean_nll, 0.25) AS p25,
             quantile_disc(mean_nll, 0.50) AS p50,
             quantile_disc(mean_nll, 0.75) AS p75
      FROM nll
    ), binned AS (
      SELECT doc_id, n_tokens,
             CASE WHEN mean_nll <= p25 THEN 1
                  WHEN mean_nll <= p50 THEN 2
                  WHEN mean_nll <= p75 THEN 3
                  ELSE 4 END AS quality_bin,
             CAST(concat('0x', substr(md5('curr' || CAST(doc_id AS VARCHAR)),
                                      1, 4)) AS INT) < 16384 AS sampled
      FROM nll CROSS JOIN bounds
    )
    SELECT quality_bin,
           count(*) AS n_docs,
           count(CASE WHEN sampled THEN 1 END) AS n_sampled,
           SUM(CASE WHEN sampled THEN n_tokens ELSE 0 END) AS n_tokens_sampled
    FROM binned GROUP BY quality_bin
    """,
)
def q_quality_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction end-to-end: score every doc with the
    corpus unigram LM (fluency), cut EXACT quartile boundaries
    (percentile_disc — broadcast, no global sort of docs), and draw a
    reproducible 25% hash-sample per quality bin — the
    quality-stratified subset an ablation or curriculum schedule
    trains on. Composes functions/ranking.py unigram_logprob +
    functions/sampling.py hash_bucket; every stage is a pattern the
    catalog verifies in isolation, here verified COMPOSED."""
    from mapreducewordoccurences_spark.functions.ranking import unigram_logprob
    from mapreducewordoccurences_spark.functions.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    nll = unigram_logprob(docs).select(
        "doc_id", F.round("mean_nll", 4).alias("mean_nll"), "n_tokens"
    )
    bounds = nll.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY mean_nll)").alias("p25"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY mean_nll)").alias("p50"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY mean_nll)").alias("p75"),
    )
    binned = nll.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("mean_nll") <= F.col("p25"), 1)
        .when(F.col("mean_nll") <= F.col("p50"), 2)
        .when(F.col("mean_nll") <= F.col("p75"), 3)
        .otherwise(4)
        .alias("quality_bin"),
        (hash_bucket(F.col("doc_id"), salt="curr") < 16384).alias("sampled"),
    )
    return binned.groupBy("quality_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("sampled"), 1)).alias("n_sampled"),
        F.sum(F.when(F.col("sampled"), F.col("n_tokens")).otherwise(0)).alias(
            "n_tokens_sampled"
        ),
    )


@register(
    "fk_integrity_audit",
    """
    SELECT 'nation.n_regionkey->region' AS fk, count(*) AS n_child_rows,
           count(CASE WHEN r.r_regionkey IS NULL THEN 1 END) AS n_orphans
    FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation', count(*),
           count(CASE WHEN x.n_nationkey IS NULL THEN 1 END)
    FROM customer c LEFT JOIN nation x ON c.c_nationkey = x.n_nationkey
    UNION ALL
    SELECT 'supplier.s_nationkey->nation', count(*),
           count(CASE WHEN x.n_nationkey IS NULL THEN 1 END)
    FROM supplier s LEFT JOIN nation x ON s.s_nationkey = x.n_nationkey
    UNION ALL
    SELECT 'orders.o_custkey->customer', count(*),
           count(CASE WHEN c.c_custkey IS NULL THEN 1 END)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders', count(*),
           count(CASE WHEN o.o_orderkey IS NULL THEN 1 END)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part', count(*),
           count(CASE WHEN p.p_partkey IS NULL THEN 1 END)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier', count(*),
           count(CASE WHEN s.s_suppkey IS NULL THEN 1 END)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema referential-integrity audit: orphan counts for
    every FK edge of the star in one statement — the nightly
    contract check a warehouse runs before publishing a snapshot.
    Every probe is a LEFT join counting null parents. Only the
    TRULY bounded dims (region: 5 rows, nation: 25 at any SF)
    carry a broadcast hint; every parent whose cardinality scales
    with the data (customer, orders, part, supplier) joins unhinted
    and AQE picks broadcast-vs-shuffle from runtime sizes —
    broadcasting a scaling parent would OOM at 100 TB.
    Generalizes operators/expectations.py's single-FK gate to the
    full schema."""
    def probe(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, fk: str,
              broadcast_parent: bool = True):
        parent_side = parent.select(F.col(pkey))
        if broadcast_parent:
            parent_side = F.broadcast(parent_side)
        return (
            child.select(F.col(ckey))
            .join(
                parent_side,
                F.col(ckey) == F.col(pkey),
                "left",
            )
            .agg(
                F.lit(fk).alias("fk"),
                F.count(F.lit(1)).alias("n_child_rows"),
                F.count(F.when(F.col(pkey).isNull(), 1)).alias("n_orphans"),
            )
        )

    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    probes = [
        probe(nation, "n_regionkey", region, "r_regionkey",
              "nation.n_regionkey->region"),
        probe(customer, "c_nationkey", nation, "n_nationkey",
              "customer.c_nationkey->nation"),
        probe(supplier, "s_nationkey", nation, "n_nationkey",
              "supplier.s_nationkey->nation"),
        probe(orders, "o_custkey", customer, "c_custkey",
              "orders.o_custkey->customer", broadcast_parent=False),
        probe(li, "l_orderkey", orders, "o_orderkey",
              "lineitem.l_orderkey->orders", broadcast_parent=False),
        probe(li, "l_partkey", part, "p_partkey",
              "lineitem.l_partkey->part", broadcast_parent=False),
        probe(li, "l_suppkey", supplier, "s_suppkey",
              "lineitem.l_suppkey->supplier", broadcast_parent=False),
    ]
    out = probes[0]
    for p in probes[1:]:
        out = out.unionByName(p)
    return out


@register(
    "time_decayed_user_value",
    """
    WITH mx AS (SELECT max(epoch_us(ts)) AS t_max FROM events),
    w AS (
      SELECT user_id,
             exp(-((t_max - epoch_us(ts)) / 86400000000.0) / 7.0) AS wt,
             CAST(value AS DOUBLE) AS v
      FROM events CROSS JOIN mx
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(ROUND(SUM(CAST(trunc(wt * 1e8) AS BIGINT)) / 1e8, 6) AS DOUBLE)
             AS decayed_count,
           CAST(ROUND((SUM(CAST(trunc(wt * v * 1e6) AS BIGINT)) / 1e6)
                      / (SUM(CAST(trunc(wt * 1e8) AS BIGINT)) / 1e8), 6)
                AS DOUBLE) AS decayed_avg_value
    FROM w GROUP BY user_id
    """,
)
def q_time_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed counters (7-day half-life-style
    weighting, w = exp(-age_days/7) against the corpus horizon) — the
    recency-weighted engagement feature every ranking system keeps:
    decayed event count and decayed mean value per user. Unlike the
    sequential EWMA (order-sensitive recurrence), per-row decay
    weights are independent, so this is ONE grouped pass of
    fixed-point sums — order-free, mergeable across partitions and
    days (decayed counters update by multiplying the old sum by the
    elapsed decay and adding the new batch — the streaming form).
    The corpus max-timestamp is a broadcast scalar."""
    events = _t(spark, sf_dir, "events")
    mx = events.agg(F.max(ts_micros(events, "ts")).alias("t_max"))
    w = events.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.exp(
            -((F.col("t_max") - ts_micros(events, "ts")) / F.lit(86400000000.0))
            / F.lit(7.0)
        ).alias("wt"),
        F.col("value").cast("double").alias("v"),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.expr("CAST(wt * 1e8 AS BIGINT)")) / F.lit(1e8), 6
        ).alias("decayed_count"),
        F.round(
            (F.sum(F.expr("CAST(wt * v * 1e6 AS BIGINT)")) / F.lit(1e6))
            / (F.sum(F.expr("CAST(wt * 1e8 AS BIGINT)")) / F.lit(1e8)),
            6,
        ).alias("decayed_avg_value"),
    )


@register(
    "keyword_and_search",
    """
    WITH inv AS (
      SELECT DISTINCT doc_id, w
      FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
            FROM documents)
      WHERE w IN ('spark', 'merge', 'window')
    ), hits AS (
      SELECT doc_id, count(*) AS n_terms FROM inv GROUP BY doc_id
    )
    SELECT h.doc_id, d.source, d.lang,
           len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS n_tokens
    FROM hits h JOIN documents d ON d.doc_id = h.doc_id
    WHERE h.n_terms = 3
    """,
)
def q_keyword_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND keyword search the inverted-index way: docs
    containing ALL of {spark, merge, window} found by filtering the
    posting lists and counting distinct matched terms per doc — the
    group-count == k trick that replaces k chained LIKE scans (k
    scans → one scan; the IN filter prunes the exploded token stream
    map-side before any shuffle). BM25 (bm25_topk_docs) is the
    ranked counterpart; this is the filter counterpart."""
    docs = _t(spark, sf_dir, "documents")
    from mapreducewordoccurences_spark.functions.text import tokens

    terms = ["spark", "merge", "window"]
    inv = (
        docs.select("doc_id", F.explode(tokens("text", lowercase=True)).alias("w"))
        .where(F.col("w").isin(terms))
        .distinct()
    )
    hits = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_terms"))
    return (
        hits.where(F.col("n_terms") == len(terms))
        .join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "lang",
            F.size(tokens("text", lowercase=True)).alias("n_tokens"),
        )
    )


@register(
    "seasonal_traffic_zscore",
    """
    WITH hourly AS (
      SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
             (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), season AS (
      SELECT hour_of_day,
             count(*) AS n_days,
             SUM(n) AS tot,
             SUM(n * n) AS tot2
      FROM hourly GROUP BY hour_of_day
    )
    SELECT h.hour_bucket, h.hour_of_day, h.n,
           CAST(ROUND(CAST(s.tot AS DOUBLE) / s.n_days, 4) AS DOUBLE)
             AS seasonal_mean,
           CAST(ROUND((h.n - CAST(s.tot AS DOUBLE) / s.n_days)
                      / sqrt(CAST(s.tot2 AS DOUBLE) / s.n_days
                             - (CAST(s.tot AS DOUBLE) / s.n_days)
                               * (CAST(s.tot AS DOUBLE) / s.n_days)),
                      4) AS DOUBLE) AS seasonal_z
    FROM hourly h JOIN season s USING (hour_of_day)
    WHERE s.n_days >= 3
      AND CAST(s.tot2 AS DOUBLE) / s.n_days
          - (CAST(s.tot AS DOUBLE) / s.n_days)
            * (CAST(s.tot AS DOUBLE) / s.n_days) > 0
    """,
)
def q_seasonal_traffic_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware traffic anomaly detection: each hour's event
    count scored against the SAME-HOUR-OF-DAY baseline across the
    history — the flat rolling window (rolling_zscore_events) flags
    every daily peak, this one only flags departures from the daily
    rhythm. Data-scale work is one hourly count; the seasonal moments
    and the scoring join run on the hour-axis (rows ∝ retention) —
    exact integer sums, closed-form double finish, round 4."""
    events = _t(spark, sf_dir, "events")
    hourly = (
        events.select(ts_micros(events, "ts").alias("__us"))
        .select(
            F.expr("__us div 3600000000").alias("hour_bucket"),
            F.expr("(__us div 3600000000) % 24").alias("hour_of_day"),
        )
        .groupBy("hour_bucket", "hour_of_day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    season = hourly.groupBy("hour_of_day").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("tot"),
        F.sum(F.col("n") * F.col("n")).alias("tot2"),
    )
    mean = F.col("tot").cast("double") / F.col("n_days")
    var = F.col("tot2").cast("double") / F.col("n_days") - mean * mean
    return (
        hourly.join(F.broadcast(season), "hour_of_day")
        .where((F.col("n_days") >= 3) & (var > 0))
        .select(
            "hour_bucket",
            "hour_of_day",
            "n",
            F.round(mean, 4).alias("seasonal_mean"),
            F.round((F.col("n") - mean) / F.sqrt(var), 4).alias("seasonal_z"),
        )
    )


@register(
    "rollup_share_of_parent",
    """
    WITH ro AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS balance,
             count(*) AS n_customers
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP (r.r_name, n.n_name)
    )
    SELECT region, nation, n_customers, balance,
           CAST(ROUND(balance / SUM(CASE WHEN nation IS NULL
                                          AND region IS NOT NULL
                                         THEN balance END)
                                  OVER (PARTITION BY region), 6) AS DOUBLE)
             AS share_of_region,
           CAST(ROUND(balance / SUM(CASE WHEN region IS NULL THEN balance END)
                                  OVER (), 6) AS DOUBLE) AS share_of_total
    FROM ro
    """,
)
def q_rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: the region→nation ROLLUP with
    each row's share of its region subtotal and of the grand total —
    subtotals and shares from ONE grouped pass (the windows pick the
    parent rows out of the rollup output itself; no second scan, no
    self-join). The windows run over the rollup's group-bounded
    output. NULL grouping column = subtotal row, per SQL rollup
    semantics."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    ro = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            decimal_sum("c_acctbal", 4, "balance"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
    region_total = F.sum(
        F.when(F.col("nation").isNull() & F.col("region").isNotNull(),
               F.col("balance"))
    ).over(Window.partitionBy("region"))
    # bounded axis: the rollup's own output (region·nation cells)
    grand_total = F.sum(
        F.when(F.col("region").isNull(), F.col("balance"))
    ).over(Window.partitionBy())
    return ro.select(
        "region",
        "nation",
        "n_customers",
        "balance",
        F.round(F.col("balance") / region_total, 6).alias("share_of_region"),
        F.round(F.col("balance") / grand_total, 6).alias("share_of_total"),
    )


@register(
    "event_trigram_paths",
    """
    WITH seq AS (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT t1, t2, t3, count(*) AS n_paths
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, t1, t2, t3
    LIMIT 20
    """,
)
def q_event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 path mining: the 20 most common three-step event
    sequences — the Sankey/user-flow view one step deeper than the
    Markov matrix (event_transition_matrix is order-1; real flows
    like view→click→purchase only show at order 2+). One per-user
    shuffle for both leads (shared window), a #types³-bounded
    aggregate, TakeOrderedAndProject for the top slice."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        ts_micros(events, "ts"), F.col("event_id")
    )
    seq = events.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.where(F.col("t3").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), "t1", "t2", "t3")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round 5: PII scrubbing, memorization scan, filter funnel, attribution,
# PIVOT/UNPIVOT surface, streaming aggregation parity
# ---------------------------------------------------------------------------

# Synthetic PII corpus: the testdata text is PII-free word soup, so both
# engines derive the same enriched text from doc_id arithmetically —
# ground-truth redaction counts are then non-trivial AND exactly
# checkable (same closed-form convention as make_fake_media).
_PII_SYNTH_SQL = (
    "text || ' contact user' || doc_id || '@example.com call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.' || "
    "(doc_id % 256) || '.0.' || ((doc_id * 7) % 256)"
)

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?"
_PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@register(
    "pii_redaction_audit",
    f"""
    WITH synth AS (
      SELECT source, {_PII_SYNTH_SQL} AS t FROM documents
    ), redacted AS (
      SELECT source, t,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{_PII_EMAIL}', '[PII]', 'g'),
                 '{_PII_PHONE}', '[PII]', 'g'),
               '{_PII_IPV4}', '[PII]', 'g') AS rt
      FROM synth
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_EMAIL}'))) AS BIGINT) AS n_emails,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_PHONE}'))) AS BIGINT) AS n_phones,
           CAST(SUM(len(regexp_extract_all(t, '{_PII_IPV4}'))) AS BIGINT) AS n_ipv4,
           CAST(SUM(length(t) - length(rt)) AS BIGINT) AS chars_redacted
    FROM redacted GROUP BY source
    """,
)
def q_pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing audit — the compliance gate every training-data
    release runs: per-source counts of emails / phone-like groups /
    IPv4s found, and how many characters redaction removed. Patterns
    restricted to the Java-regex ∩ RE2 common dialect so Spark and
    the oracle see identical matches; the scrub itself is chained
    built-in regexp_replace (functions/text.redact_pii) — one codegen
    stage over the corpus, no Python. Counts are measured on the
    original text; chars_redacted proves the rewrite actually fired.
    Scale: pure scan→project→groupBy(#sources); nothing else moves."""
    from mapreducewordoccurences_spark.functions.text import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    synth = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ).alias("t"),
    )
    counts = pii_counts("t")
    return synth.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(counts["email"]).alias("n_emails"),
        F.sum(counts["phone"]).alias("n_phones"),
        F.sum(counts["ipv4"]).alias("n_ipv4"),
        F.sum(F.length("t") - F.length(redact_pii("t"))).alias("chars_redacted"),
    )


@register(
    "ngram_memorization_scan",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(
               [s[i] || ' ' || s[i+1] || ' ' || s[i+2] || ' ' || s[i+3] || ' ' || s[i+4]
                for i in range(1, len(s)-3)]
             )) AS shingle
      FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS s
            FROM documents)
      WHERE len(s) >= 5
    )
    SELECT shingle, count(*) AS n_docs
    FROM sh GROUP BY shingle
    HAVING count(*) >= 3
    ORDER BY n_docs DESC, shingle
    LIMIT 20
    """,
)
def q_ngram_memorization_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk scan: the most-repeated 5-gram phrases across
    DISTINCT documents — the check LLM data teams run to find
    boilerplate/licenses/templates that models would memorize
    verbatim. Distinct-per-doc shingles (dedup/ngram machinery at
    n=5) → one groupBy(shingle) → TakeOrderedAndProject for the top
    slice. At 100 TB the groupBy is the corpus's only shuffle and
    combines map-side; the HAVING floor prunes the long tail before
    the ordered take."""
    from mapreducewordoccurences_spark.dedup.ngram import shingles_df

    docs = _t(spark, sf_dir, "documents")
    return (
        shingles_df(docs, n=5)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 3)
        .orderBy(F.col("n_docs").desc(), "shingle")
        .limit(20)
    )


@register(
    "quality_filter_funnel",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok,
             len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_dis,
             row_number() OVER (
               PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               ORDER BY doc_id) AS fp_rank
      FROM documents
    ), flags AS (
      SELECT (n_tok >= 30) AS f_len,
             (n_dis * 1.0 / n_tok >= 0.35) AS f_div,
             (lang <> 'zh') AS f_lang,
             (fp_rank = 1) AS f_uniq
      FROM scored
    )
    SELECT count(*) AS n_total,
           count(CASE WHEN f_len THEN 1 END) AS after_min_tokens,
           count(CASE WHEN f_len AND f_div THEN 1 END) AS after_diversity,
           count(CASE WHEN f_len AND f_div AND f_lang THEN 1 END) AS after_lang,
           count(CASE WHEN f_len AND f_div AND f_lang AND f_uniq THEN 1 END) AS after_dedup
    FROM flags
    """,
)
def q_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attrition audit in ONE pass: how many documents
    survive each stage of a quality cascade (min length → lexical
    diversity → language → exact-dedup survivorship), with sequential
    semantics (stage k counts only rows that passed stages < k).
    The anti-pattern this replaces is N sequential filtered scans —
    here every per-doc flag materializes in one projection (+ one
    fingerprint window for dedup rank) and all funnel stages fall out
    of a single conditional aggregation. The counts are the dashboard
    every corpus build publishes."""
    from mapreducewordoccurences_spark.functions.text import doc_fingerprint, tokens

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(doc_fingerprint("text")).orderBy("doc_id")
    scored = docs.select(
        "lang",
        F.size(tokens("text", lowercase=True)).alias("n_tok"),
        F.size(F.array_distinct(tokens("text", lowercase=True))).alias("n_dis"),
        F.row_number().over(w).alias("fp_rank"),
    )
    f_len = F.col("n_tok") >= 30
    f_div = F.col("n_dis") * 1.0 / F.col("n_tok") >= 0.35
    f_lang = F.col("lang") != "zh"
    f_uniq = F.col("fp_rank") == 1
    return scored.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(f_len, 1)).alias("after_min_tokens"),
        F.count(F.when(f_len & f_div, 1)).alias("after_diversity"),
        F.count(F.when(f_len & f_div & f_lang, 1)).alias("after_lang"),
        F.count(F.when(f_len & f_div & f_lang & f_uniq, 1)).alias("after_dedup"),
    )


@register(
    "attribution_last_touch_revenue",
    """
    WITH touched AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS channel
      FROM events
    )
    SELECT coalesce(channel, 'direct') AS channel,
           count(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS attributed_value
    FROM touched WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase's value is credited to
    the user's most recent PRECEDING non-purchase event type (the
    'channel'), 'direct' when none — the marketing-analytics staple.
    One per-user window (IGNORE NULLS last_value over an
    unbounded-to-1-preceding frame) + a #channels-bounded aggregate;
    value sums go through the DECIMAL(28,4) portability protocol.
    Single shuffle on user_id, then a tiny groupBy."""
    events = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_micros(events, "ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        events.select("event_type", "value", channel.alias("channel"))
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            decimal_sum("value", alias="attributed_value"),
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
    "streaming_wordcount_parity",
    """
    SELECT word, count(*) AS cnt FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents
    ) GROUP BY word
    """,
)
def q_streaming_wordcount_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's aggregation run through STRUCTURED STREAMING:
    documents stream in as one availableNow micro-batch, tokenize →
    explode → stateful groupBy count, complete-mode memory sink; the
    oracle recomputes relationally. A hash-match proves the streaming
    stateful-aggregation path (source → state store → sink) computes
    exactly what batch SQL says — the second oracle-checked streaming
    row next to streaming_psi_monitor_batch (which covers
    foreachBatch; this one covers the native state-store agg)."""
    import shutil
    import tempfile
    import uuid

    from mapreducewordoccurences_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="stream_wc_q_")
    sink = f"wc_parity_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema(docs.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        counts = (
            stream.select(F.explode(tokens("text", lowercase=True)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        q = (
            counts.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = spark.table(sink)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "overlapping_sessions_pairs",
    """
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM events
    ), numbered AS (
        SELECT user_id, ts_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ), sess AS (
        SELECT user_id, session_id,
               min(ts_us) AS start_us, max(ts_us) AS end_us
        FROM numbered GROUP BY 1, 2
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           count(*) AS n_overlapping_sessions
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id
     AND a.start_us <= b.end_us AND b.start_us <= a.end_us
    GROUP BY 1, 2
    """,
)
def q_overlapping_sessions_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-usage analysis: for every user pair, how many of
    their 30-min-gap sessions overlapped in time. The oracle writes
    the textbook interval join (two range predicates, no equi-key) —
    which Spark would plan as a nested-loop/cartesian, the classic
    scale-killer the catalog's plan invariant forbids. The engine
    instead uses operators.joins.interval_overlap_join: sessions
    explode into 1-hour time buckets, the join is a plain EQUI-join
    on the bucket id (shuffled, AQE-sizable), duplicates from pairs
    sharing several buckets collapse on the session-id pair, and the
    exact overlap predicate runs as a cheap post-filter. Cost is
    data + interval/bucket fan-out, never |sessions|²."""
    from mapreducewordoccurences_spark.operators.joins import interval_overlap_join

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        ts_micros(events, "ts"), F.col("event_id")
    )
    tus = ts_micros(events, "ts")
    ordered = events.select(
        "user_id",
        tus.alias("ts_us"),
        F.when(tus - F.lag(tus).over(w) > 1_800_000_000, 1)
        .otherwise(0)
        .alias("is_new"),
        F.col("event_id"),
    )
    numbered = ordered.select(
        "user_id",
        "ts_us",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_id"),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"), F.max("ts_us").alias("end_us")
    )
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("session_id").alias("sid_a"),
        F.col("start_us").alias("start_a"),
        F.col("end_us").alias("end_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("session_id").alias("sid_b"),
        F.col("start_us").alias("start_b"),
        F.col("end_us").alias("end_b"),
    )
    pairs = interval_overlap_join(
        a,
        b,
        "start_a",
        "end_a",
        "start_b",
        "end_b",
        bucket_width=3_600_000_000,
        left_id=["user_a", "sid_a"],
        right_id=["user_b", "sid_b"],
    ).where(F.col("user_a") < F.col("user_b"))
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_overlapping_sessions")
    )


@register(
    "dedup_incremental_minhash",
    _EXACT_PAIRS_CTE.format(thr=0.7)
    + """
    SELECT count(*) AS n_exact_cross_pairs, TRUE AS recall_ok
    FROM exact
    WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
    """,
)
def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the nightly-ingest shape: docs with
    doc_id % 10 == 0 arrive as the NEW batch, the rest are the
    already-indexed corpus (minhash_band_index: stored signatures +
    band table, written once). Only the batch is shingled/hashed; the
    corpus contributes its index to one (band, band_hash) equi-join.
    Acceptance contract mirrors dedup_minhash_lsh: the incremental
    candidates must recall ≥ 0.9 of the exact cross-batch
    Jaccard-0.7 pairs (the hash-matched count), and recall_ok must
    come back TRUE for the value-hash to match. The exact denominator
    is the prefix-filtering SSJoin (dedup/prefix.py) — bit-identical
    to the uncapped posting-list pair set by the prefix theorem, so
    it is definitionally the oracle CTE's pair set, WITHOUT the
    Σ df² candidate term: the sf1 scaling probe measured the old
    uncapped verifier at 7.95× growth per 10× data (the worst in
    SCALING_r6.jsonl); the SSJoin indexes only rarity-ordered
    prefixes and has no cap to mis-tune."""
    from mapreducewordoccurences_spark.dedup.minhash import (
        minhash_band_index,
        minhash_lsh_incremental_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 10 == 0
    new_batch, corpus = docs.where(is_new), docs.where(~is_new)
    index_sigs, index_bands = minhash_band_index(corpus)
    lsh = minhash_lsh_incremental_pairs(
        new_batch, index_sigs, index_bands, threshold=0.7
    ).select(
        F.least("new_id", "index_id").alias("doc_a"),
        F.greatest("new_id", "index_id").alias("doc_b"),
    )
    exact = (
        prefix_filter_jaccard_pairs(docs, n=3, threshold=0.7)
        .where((F.col("doc_a") % 10 == 0) != (F.col("doc_b") % 10 == 0))
        .select("doc_a", "doc_b")
    )
    hits = exact.join(lsh, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return n_exact.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact").alias("n_exact_cross_pairs"),
        (
            (F.col("n_exact") == 0)
            | (F.col("n_hits") / F.col("n_exact") >= 0.9)
        ).alias("recall_ok"),
    )


@register(
    "window_rank_family_prices",
    """
    SELECT p_brand, p_partkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           nth_value(p_retailprice, 2) OVER (
             PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_cheapest_price
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window surface in one query:
    percent_rank (relative rank in [0,1]), cume_dist (inclusive
    ECDF), and nth_value over the full-partition frame (the
    2nd-cheapest price per brand broadcast to every row). Both rank
    functions are integer-count divides — bit-portable; the ORDER BY
    carries the p_partkey tiebreak so every rank is total. One
    per-brand shuffle shared by all three functions (same WINDOW
    spec), nth_value's unbounded frame included."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return part.select(
        "p_brand",
        "p_partkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("p_retailprice", 2).over(wfull).alias("second_cheapest_price"),
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


@register(
    "streaming_dedup_parity",
    """
    SELECT user_id, count(*) AS n FROM (
      SELECT DISTINCT user_id, event_type FROM events
    ) GROUP BY user_id
    """,
)
def q_streaming_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DEDUPLICATION through the correctness gate: events
    stream in (availableNow), watermarked dropDuplicates on
    (user_id, event_type) maintains the dedup state store, and the
    emitted distinct pairs are counted per user — hash-matched
    against relational SELECT DISTINCT. Third oracle-checked
    streaming row: psi monitor covers foreachBatch, wordcount parity
    covers stateful aggregation, this covers the dedup state
    operator (the streaming face of the exact-dedup tier)."""
    import shutil
    import tempfile
    import uuid

    events = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_dedup_q_")
    sink = f"dedup_parity_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        distinct_pairs = (
            stream.select(
                "user_id",
                "event_type",
                F.timestamp_micros(ts_micros(stream, "ts")).alias("__et"),
            )
            .withWatermark("__et", "1 hour")
            .dropDuplicates(["user_id", "event_type"])
        )
        q = (
            distinct_pairs.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = (
            spark.table(sink)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "streaming_interval_join_views_purchases",
    """
    SELECT p.user_id, count(*) AS n_view_purchase_pairs
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
     AND epoch_us(v.ts) <= epoch_us(p.ts)
    GROUP BY 1
    """,
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join through the correctness gate: purchase
    and view events arrive as two watermarked streams; each purchase
    joins the same user's views from the preceding hour (the
    event-time range condition that lets the state store evict —
    without it stream-stream join state grows forever). availableNow
    delivers both tables as one micro-batch, so the joined set is
    exactly the batch semantics the oracle states. Fourth streaming
    operator driver-verified (foreachBatch, state-store agg, dedup
    state, now join state)."""
    import shutil
    import tempfile
    import uuid

    events = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_ij_q_")
    sink = f"sij_{uuid.uuid4().hex[:8]}"

    def side(event_type: str, alias: str) -> DataFrame:
        s = (
            spark.readStream.schema(events.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return (
            s.where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.timestamp_micros(ts_micros(s, "ts")).alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "2 hours")
        )

    try:
        purchases, views = side("purchase", "p"), side("view", "v")
        joined = purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") <= F.col("p_ts")),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = (
            spark.table(sink)
            .groupBy(F.col("p_user").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_view_purchase_pairs"))
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "streaming_stateful_user_totals",
    """
    SELECT user_id, count(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value_2dp
    FROM events GROUP BY user_id
    """,
)
def q_streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator (applyInPandasWithState —
    streaming/stateful.py running_user_totals) through the gate: one
    availableNow micro-batch updates every user's state row, and the
    emitted (n_events, total_value) must equal the batch aggregation.
    total_value is rounded to 2dp in BOTH engines: the state update
    sums floats in pandas batch order, the oracle in scan order —
    equal to ~1e-12 but not bit-equal, and the contract here is the
    state machine's bookkeeping, not float associativity. Fifth
    streaming operator driver-verified."""
    import shutil
    import tempfile
    import uuid

    from mapreducewordoccurences_spark.streaming.stateful import (
        running_user_totals,
    )

    events = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_state_q_")
    sink = f"sut_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = spark.table(sink).select(
            "user_id",
            "n_events",
            F.round("total_value", 2).alias("total_value_2dp"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _pagerank_oracle(iterations: int = 10) -> str:
    """Unrolled fixed-point PageRank recurrence (DuckDB forbids
    aggregates in recursive CTE terms, so the 10 iterations unroll
    into chained CTEs — the oracle states EXACTLY the integer
    recurrence operators/graph.py runs)."""
    head = """
    WITH seq AS (
      SELECT event_type AS u,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS v
      FROM events
    ), edges AS (
      SELECT u, v, count(*) AS w FROM seq WHERE v IS NOT NULL GROUP BY u, v
    ), outw AS (
      SELECT u, CAST(SUM(w) AS BIGINT) AS w_out FROM edges GROUP BY u
    ), ew AS (
      SELECT e.u, e.v, CAST(e.w AS BIGINT) AS w, o.w_out
      FROM edges e JOIN outw o ON o.u = e.u
    ), nodes AS (
      SELECT u AS node FROM edges UNION SELECT v FROM edges
    ), consts AS (
      SELECT CAST(1000000000000 // cnt AS BIGINT) AS r0,
             CAST((1000000000000 * 15) // (100 * cnt) AS BIGINT) AS tp
      FROM (SELECT count(*) AS cnt FROM nodes)
    ), pr0 AS (
      SELECT node, (SELECT r0 FROM consts) AS rank_fp FROM nodes
    )"""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f"""
    , pr{k} AS (
      SELECT n.node,
             CAST((SELECT tp FROM consts)
                  + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank_fp
      FROM nodes n LEFT JOIN (
        SELECT ew.v AS node,
               CAST(SUM((p.rank_fp * ew.w) // ew.w_out) AS BIGINT) AS in_sum
        FROM ew JOIN pr{k - 1} p ON p.node = ew.u GROUP BY ew.v
      ) s ON s.node = n.node
    )""")
    return head + "".join(steps) + f"""
    SELECT node, rank_fp FROM pr{iterations}
    """


@register("pagerank_event_transitions", _pagerank_oracle(10))
def q_pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (which event
    types are 'central' in user flows), 10 iterations, EXACT integer
    fixed-point — the iterative-linear-algebra surface made
    engine-portable: scaled int64 ranks with truncating integer
    division make every iteration bit-identical across engines and
    shuffle orders, so the driver can hash-match an iterative
    algorithm that float arithmetic would leave ulp-divergent
    (operators/graph.py; the oracle unrolls the identical recurrence
    through 10 chained CTEs). Per iteration: one edges⋈ranks join +
    one destination-keyed groupBy — the Pregel shape that scales to
    web graphs; the event-type graph here is deliberately tiny so the
    oracle stays cheap."""
    from mapreducewordoccurences_spark.operators.graph import pagerank_fixed_point

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        ts_micros(events, "ts"), F.col("event_id")
    )
    edges = (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank_fixed_point(
        edges, weight_col="w", iterations=10
    ).select("node", "rank_fp")


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


# shares the uncapped posting-list oracle: prefix filtering is an
# exact algorithm, so both formulations must hash-match the same SQL
_NGRAM_JACCARD_ORACLE = ORACLES["dedup_ngram_jaccard"]


@register("dedup_jaccard_prefix_filter", _NGRAM_JACCARD_ORACLE)
def q_dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity join (SSJoin/PPJoin family):
    the EXACT Jaccard-0.8 pair set computed by indexing only each
    document's rarest ~20% of shingles (p = |d| − ceil(t·|d|) + 1
    under one global rarity order) — any qualifying pair provably
    collides in the indexed prefixes, so recall is 1.0 by theorem,
    not by tuning, and the driver hash-matches it against the same
    oracle as dedup_ngram_jaccard. This is the third exact-tier
    formulation (full inverted index / df-capped / prefix-filtered):
    at corpus scale the prefix index shrinks candidate volume without
    the cap's approximation. dedup/prefix.py; rounded like the
    sibling for value-hash canonicalization."""
    from mapreducewordoccurences_spark.dedup.prefix import (
        prefix_filter_jaccard_pairs,
    )

    return prefix_filter_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.8
    )


@register(
    "bitmap_distinct_users_weekly",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events
    )
    SELECT CAST(day // 7 AS BIGINT) AS week,
           count(DISTINCT user_id) AS n_users
    FROM daily GROUP BY 1
    """,
)
def q_bitmap_distinct_users_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct via Spark's bitmap aggregate family
    (bitmap_bit_position / bitmap_construct_agg / bitmap_or_agg /
    bitmap_count) — the warehouse-native middle ground between exact
    count_distinct (two full shuffles, no reusable partials) and HLL
    sketches (mergeable but approximate): per-(day, bucket) bitmap
    partials are built once, OR-merge to any coarser grain (weeks
    here; months/quarters reuse the SAME partials), and the final
    count is exact. At scale the partials persist beside the data and
    every rollup window becomes a bitmap-OR over 4KB chunks instead
    of a rescan. The oracle states the semantic ground truth
    (count DISTINCT per week); matching it proves the partial → merge
    → count pipeline loses nothing."""
    events = _t(spark, sf_dir, "events")
    daily = events.select(
        (ts_micros(events, "ts") / F.lit(86400000000)).cast("long").alias("day"),
        "user_id",
    )
    partials = (
        daily.selectExpr(
            "CAST(day div 7 AS BIGINT) AS week",
            "bitmap_bucket_number(user_id) AS bkt",
            "bitmap_bit_position(user_id) AS pos",
        )
        .groupBy("week", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        partials.groupBy("week", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .select("week", F.expr("bitmap_count(bm)").alias("c"))
        .groupBy("week")
        .agg(F.sum("c").alias("n_users"))
    )


@register(
    "pointintime_join_ship_priority",
    """
    WITH s AS (
      SELECT o_custkey, o_orderpriority,
             epoch_us(o_orderdate) AS obs_us, o_orderkey,
             CASE WHEN o_orderpriority IS DISTINCT FROM
                       lag(o_orderpriority) OVER (
                         PARTITION BY o_custkey
                         ORDER BY epoch_us(o_orderdate), o_orderkey)
                  THEN 1 ELSE 0 END AS chg
      FROM orders
    ), r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY obs_us, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM s
    ), g AS (
      SELECT o_custkey, run, min(o_orderpriority) AS prio,
             min(obs_us) AS valid_from
      FROM r GROUP BY 1, 2
    ), hist AS (
      -- lead ordered by the RUN INDEX, not valid_from: two runs can
      -- share a valid_from (same-day priority flip), and the version
      -- order is what scd2_build uses — a valid_from tie ordered the
      -- other way flips which version covers the interval
      SELECT o_custkey, prio, valid_from,
             lead(valid_from) OVER (PARTITION BY o_custkey
                                    ORDER BY run) AS valid_to
      FROM g
    ), ship AS (
      SELECT o.o_custkey, epoch_us(l.l_shipdate) AS ship_us,
             l.l_extendedprice
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT h.prio AS priority_as_of_ship,
           count(*) AS n_items,
           CAST(SUM(CAST(s.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
             AS shipped_value
    FROM ship s JOIN hist h
      ON h.o_custkey = s.o_custkey
     AND s.ship_us >= h.valid_from
     AND (h.valid_to IS NULL OR s.ship_us < h.valid_to)
    GROUP BY 1
    """,
)
def q_pointintime_join_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME (temporal) join against an SCD2 history — the
    feature-store "as-was" pattern: every shipped line item picks up
    the customer's order-priority class that was VALID AT ship time
    (not today's value — that's label leakage in a training set).
    Composes scd2_build with a keyed validity-range join: the equi-key
    (custkey) carries the join, the range predicate selects the one
    valid version per row, and uniqueness of validity intervals
    guarantees exactly one match — so row count is preserved, which
    the oracle's count certifies. One history build (single per-key
    shuffle) + one keyed join; no interval explosion because validity
    ranges partition time per key."""
    from mapreducewordoccurences_spark.operators.cdc import scd2_build

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    log = orders.select(
        "o_custkey",
        "o_orderpriority",
        ts_micros(orders, "o_orderdate").alias("obs_us"),
        "o_orderkey",
    )
    hist = scd2_build(
        log, key="o_custkey", attr="o_orderpriority",
        order_col="obs_us", tiebreak="o_orderkey",
    ).select(
        "o_custkey",
        F.col("o_orderpriority").alias("prio"),
        "valid_from",
        "valid_to",
    )
    ship = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem.l_orderkey == orders.o_orderkey,
    ).select(
        "o_custkey",
        ts_micros(lineitem, "l_shipdate").alias("ship_us"),
        "l_extendedprice",
    )
    joined = ship.join(
        hist,
        (ship.o_custkey == hist.o_custkey)
        & (F.col("ship_us") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ship_us") < F.col("valid_to"))),
    )
    return joined.groupBy(F.col("prio").alias("priority_as_of_ship")).agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum("l_extendedprice", alias="shipped_value"),
    )


@register(
    "triangles_session_overlap_users",
    """
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM events
    ), numbered AS (
        SELECT user_id, ts_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ), sess AS (
        SELECT user_id, session_id,
               min(ts_us) AS start_us, max(ts_us) AS end_us
        FROM numbered GROUP BY 1, 2
    ), e AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id
         AND a.start_us <= b.end_us AND b.start_us <= a.end_us
    ), nodes AS (
        SELECT u AS node FROM e UNION SELECT v FROM e
    )
    SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT count(*)
            FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
    """,
)
def q_triangles_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the concurrent-usage graph (users connected
    when their 30-min sessions overlap in time) — the clustering
    signal behind community/cohort detection. The engine runs the
    degree-orientation algorithm (operators/graph.py triangle_count,
    Suri-Vassilvitskii): wedge volume is bounded by O(m^1.5) instead
    of the hub-degree² blow-up of the oracle's naive u<v<w three-way
    join, which is fine for DuckDB at oracle scale and exactly what
    you can't run on a 100 TB event graph. Edges come from the same
    bucketed interval-overlap join as overlapping_sessions_pairs."""
    from mapreducewordoccurences_spark.operators.graph import triangle_count
    from mapreducewordoccurences_spark.operators.joins import (
        interval_overlap_join,
    )

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        ts_micros(events, "ts"), F.col("event_id")
    )
    tus = ts_micros(events, "ts")
    ordered = events.select(
        "user_id",
        tus.alias("ts_us"),
        F.when(tus - F.lag(tus).over(w) > 1_800_000_000, 1)
        .otherwise(0)
        .alias("is_new"),
        F.col("event_id"),
    )
    numbered = ordered.select(
        "user_id",
        "ts_us",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_id"),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"), F.max("ts_us").alias("end_us")
    )
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("session_id").alias("sid_a"),
        F.col("start_us").alias("start_a"),
        F.col("end_us").alias("end_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("session_id").alias("sid_b"),
        F.col("start_us").alias("start_b"),
        F.col("end_us").alias("end_b"),
    )
    edges = (
        interval_overlap_join(
            a, b, "start_a", "end_a", "start_b", "end_b",
            bucket_width=3_600_000_000,
            left_id=["user_a", "sid_a"], right_id=["user_b", "sid_b"],
        )
        .where(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b")
        .distinct()
    )
    return triangle_count(edges, "user_a", "user_b")


@register(
    "rfm_user_segments",
    """
    WITH agg AS (
      SELECT user_id,
             max(epoch_us(ts)) AS last_us,
             count(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), qs AS (
      SELECT
        percentile_disc(0.25) WITHIN GROUP (ORDER BY last_us) AS r_q1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY last_us) AS r_q2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY last_us) AS r_q3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f_q1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency) AS f_q2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f_q3,
        percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m_q1,
        percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m_q2,
        percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m_q3
      FROM agg
    ), scored AS (
      SELECT
        CASE WHEN last_us >= r_q3 THEN 1 WHEN last_us >= r_q2 THEN 2
             WHEN last_us >= r_q1 THEN 3 ELSE 4 END AS r,
        CASE WHEN frequency >= f_q3 THEN 1 WHEN frequency >= f_q2 THEN 2
             WHEN frequency >= f_q1 THEN 3 ELSE 4 END AS f,
        CASE WHEN monetary >= m_q3 THEN 1 WHEN monetary >= m_q2 THEN 2
             WHEN monetary >= m_q1 THEN 3 ELSE 4 END AS m
      FROM agg, qs
    )
    SELECT r, f, m, count(*) AS n_users
    FROM scored GROUP BY r, f, m
    """,
)
def q_rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics workhorse: each
    purchasing user quartile-scored on Recency (latest purchase),
    Frequency (purchase count), and Monetary (decimal-exact spend),
    then counted per (r, f, m) cell; score 1 = top quartile on that
    dimension.

    Scale design: an earlier formulation used three global ntile(4)
    windows — single-partition sorts over the whole user table, a
    scale-killer at billions of users. This one computes the three
    quartile boundaries ONCE with exact percentile_disc (verified to
    agree with DuckDB's at every tested n) in a regular aggregation,
    broadcasts the 1-row boundary table, and bands each user with
    embarrassingly-parallel comparisons — no global sort anywhere.
    Value-banding vs rank-banding: users tied on a boundary VALUE
    land in the same band (the defensible semantics; ntile split
    ties arbitrarily by user_id)."""
    events = _t(spark, sf_dir, "events")
    agg = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(ts_micros(events, "ts")).alias("last_us"),
            F.count(F.lit(1)).alias("frequency"),
            decimal_sum("value", alias="monetary"),
        )
    )
    qs = agg.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"{d}_q{i}")
            for c, d in (("last_us", "r"), ("frequency", "f"), ("monetary", "m"))
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def band(c: str, d: str):
        return (
            F.when(F.col(c) >= F.col(f"{d}_q3"), 1)
            .when(F.col(c) >= F.col(f"{d}_q2"), 2)
            .when(F.col(c) >= F.col(f"{d}_q1"), 3)
            .otherwise(4)
            .alias(d)
        )

    scored = agg.crossJoin(F.broadcast(qs)).select(
        band("last_us", "r"), band("frequency", "f"), band("monetary", "m")
    )
    return scored.groupBy("r", "f", "m").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "time_to_convert_stats",
    """
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS first_purchase_us
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
      GROUP BY e.user_id
    ), lag AS (
      SELECT p.user_id, p.first_purchase_us - s.signup_us AS lag_us
      FROM p JOIN s ON s.user_id = p.user_id
    )
    SELECT count(*) AS n_converted,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_us) AS BIGINT)
             AS p50_lag_us,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_us) AS BIGINT)
             AS p90_lag_us,
           CAST(min(lag_us) AS BIGINT) AS min_lag_us,
           CAST(max(lag_us) AS BIGINT) AS max_lag_us
    FROM lag
    """,
)
def q_time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency distribution: time from each user's first
    signup to their first purchase AT OR AFTER it, summarized with
    discrete percentiles (percentile_disc returns actual data values
    — no cross-engine float interpolation). Two keyed aggregations +
    one broadcastable join; the percentile runs over the
    converted-users table (user-scale, not event-scale)."""
    events = _t(spark, sf_dir, "events")
    tus = ts_micros(events, "ts")
    s = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(tus).alias("signup_us"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", tus.alias("pus"))
        .join(s, "user_id")
        .where(F.col("pus") >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(
            F.min("pus").alias("first_purchase_us"),
            F.first("signup_us").alias("signup_us"),
        )
    )
    lag = p.select((F.col("first_purchase_us") - F.col("signup_us")).alias("lag_us"))
    return lag.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_us)")
        .cast("bigint")
        .alias("p50_lag_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_us)")
        .cast("bigint")
        .alias("p90_lag_us"),
        F.min("lag_us").cast("bigint").alias("min_lag_us"),
        F.max("lag_us").cast("bigint").alias("max_lag_us"),
    )


@register(
    "degree_distribution_session_graph",
    """
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM events
    ), numbered AS (
        SELECT user_id, ts_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ), sess AS (
        SELECT user_id, session_id,
               min(ts_us) AS start_us, max(ts_us) AS end_us
        FROM numbered GROUP BY 1, 2
    ), e AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM sess a JOIN sess b
          ON a.user_id < b.user_id
         AND a.start_us <= b.end_us AND b.start_us <= a.end_us
    ), deg AS (
      SELECT node, count(*) AS degree FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    )
    SELECT degree, count(*) AS n_nodes
    FROM deg GROUP BY degree
    """,
)
def q_degree_distribution_session_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the concurrent-usage graph — the first
    thing to look at before running any graph algorithm on it (a
    heavy-tailed histogram predicts hub blow-ups that degree-ordered
    algorithms must absorb). Same bucketed interval-overlap edge
    build, then one degree groupBy + one histogram groupBy."""
    from mapreducewordoccurences_spark.operators.joins import (
        interval_overlap_join,
    )

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        ts_micros(events, "ts"), F.col("event_id")
    )
    tus = ts_micros(events, "ts")
    numbered = events.select(
        "user_id",
        tus.alias("ts_us"),
        F.when(tus - F.lag(tus).over(w) > 1_800_000_000, 1)
        .otherwise(0)
        .alias("is_new"),
        "event_id",
    ).select(
        "user_id",
        "ts_us",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_id"),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"), F.max("ts_us").alias("end_us")
    )
    a = sess.select(
        F.col("user_id").alias("user_a"), F.col("session_id").alias("sid_a"),
        F.col("start_us").alias("start_a"), F.col("end_us").alias("end_a"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"), F.col("session_id").alias("sid_b"),
        F.col("start_us").alias("start_b"), F.col("end_us").alias("end_b"),
    )
    edges = (
        interval_overlap_join(
            a, b, "start_a", "end_a", "start_b", "end_b",
            bucket_width=3_600_000_000,
            left_id=["user_a", "sid_a"], right_id=["user_b", "sid_b"],
        )
        .where(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b")
        .distinct()
    )
    deg = (
        edges.select(F.col("user_a").alias("node"))
        .unionAll(edges.select(F.col("user_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


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


# ---------------------------------------------------------------------------
# Round 6: substring-level dedup, leakage-audited splits, packing, k-core
# ---------------------------------------------------------------------------

@register(
    "substring_dedup_spans",
    """
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents
    ), wins AS (
      SELECT doc_id, unnest(
               [{'pos': i, 'win': array_to_string(w[i+1:i+10], ' ')}
                for i in range(0, len(w) - 9)], recursive := true)
      FROM t WHERE len(w) >= 10
    ), dup AS (
      SELECT win FROM wins GROUP BY win HAVING count(DISTINCT doc_id) >= 2
    ), flagged AS (
      SELECT doc_id, pos FROM wins WHERE win IN (SELECT win FROM dup)
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       = 1 THEN 0 ELSE 1 END AS is_new
      FROM flagged
    ), numbered AS (
      SELECT doc_id, pos,
             SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS span_id
      FROM marked
    ), spans AS (
      SELECT doc_id, span_id, min(pos) AS p0, max(pos) AS p1
      FROM numbered GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(p1 - p0 + 1) AS BIGINT) AS n_dup_windows,
           CAST(sum(p1 - p0 + 10) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_id
    """,
)
def q_substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SUBSTRING spans (>= 10 tokens, cross-document)
    per Lee et al. ACL'22 — the dedup tier document-level sketches
    can't see: boilerplate/quotes repeated inside otherwise-unique
    documents. dedup/substrings.py replaces the paper's monolithic
    suffix array with L-token rolling-window hashes + a per-doc
    islands merge, which reconstructs the same maximal spans with one
    hash-keyed groupBy (uniform key, map-side combine) + one
    doc-partitioned window — both linear, both skew-free. The oracle
    states the identical window/islands pipeline over the window
    STRINGS; the engine ships 8-byte xxhash64 folds instead (the
    shuffle-payload scale story; collisions are ~N²/2⁶⁵)."""
    from mapreducewordoccurences_spark.dedup.substrings import (
        duplicate_window_spans,
    )

    return duplicate_window_spans(_t(spark, sf_dir, "documents"), window=10)


_GROUP_SPLIT_SQL = """
    , splits AS (
      SELECT doc_id, source,
             CASE WHEN b < 52428 THEN 'train'
                  WHEN b < 58982 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, source,
                   CAST(concat('0x', substr(md5('grp' || source), 1, 4))
                        AS INT) AS b
            FROM documents)
    )
"""


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


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    """Unrolled SQL for the k-core peel (appended after a CTE that
    defines ``exact`` pairs): round i recounts degrees over edges
    whose endpoints both survived round i-1. Same recurrence as
    operators/graph.py kcore_membership; monotone, so rounds past
    convergence are no-ops."""
    parts = [
        """
    , sym AS (
      SELECT doc_a AS u, doc_b AS v FROM exact
      UNION
      SELECT doc_b AS u, doc_a AS v FROM exact
    )"""
    ]
    for i in range(rounds):
        live = (
            "sym"
            if i == 0
            else f"""sym
           WHERE u IN (SELECT node FROM a{i - 1})
             AND v IN (SELECT node FROM a{i - 1})"""
        )
        parts.append(
            f"""
    , d{i} AS (
      SELECT u AS node, count(*) AS core_degree FROM {live} GROUP BY u
    ), a{i} AS (
      SELECT node FROM d{i} WHERE core_degree >= {k}
    )"""
        )
    parts.append(
        f"""
    SELECT node AS doc_id, core_degree
    FROM d{rounds - 1} WHERE core_degree >= {k}"""
    )
    return "".join(parts)


@register(
    "kcore_near_dup_docs",
    _EXACT_PAIRS_CTE.format(thr=0.5) + _kcore_unrolled_sql(k=2, rounds=5),
)
def q_kcore_near_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the document near-dup graph (shingle Jaccard >= 0.5)
    — dedup-cluster QA: connected components over near-dup pairs
    over-merge through CHAIN links (A~B~C with A!~C, the classic
    transitive-closure false merge); the 2-core keeps exactly the
    docs with >= 2 surviving similar neighbors — the dense template
    clusters worth aggressive dedup — and peels chain links and
    pendants. Matula-Beck bulk peel, 5 unrolled rounds (converges in
    <= 2 on every tested sf; monotone, so extra rounds are no-ops —
    at 100 TB the operator loops on an alive-count convergence check
    instead).

    Scale: pair generation is the uncapped posting-list join
    (dedup/ngram.py); each peel round is two node-keyed semi-joins +
    one degree groupBy with lineage truncation
    (operators/graph.py kcore_membership) — no driver graph state."""
    from mapreducewordoccurences_spark.operators.graph import kcore_membership

    docs = _t(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, n=3, threshold=0.5)
    return kcore_membership(
        pairs, k=2, iterations=5, a_col="doc_a", b_col="doc_b"
    ).select(F.col("node").alias("doc_id"), "core_degree")


@register(
    "media_audio_stats",
    """
    WITH p AS (
      SELECT doc_id,
             8000 * (1 + doc_id % 3) AS sample_rate,
             1 + doc_id % 2 AS n_channels,
             64 + (doc_id * 13) % 400 AS n_samples,
             500 + (doc_id % 100) * 7 AS amp
      FROM documents
    )
    SELECT CAST(sample_rate AS INT) AS sample_rate,
           CAST(n_channels AS INT) AS n_channels,
           CAST(count(*) AS BIGINT) AS n_clips,
           CAST(sum(n_samples) AS BIGINT) AS total_samples,
           CAST(sum(n_samples) * 1000 AS DOUBLE) / sample_rate
             AS total_duration_ms,
           CAST(sum(amp) AS BIGINT) AS sum_rms,
           CAST(max(amp) AS BIGINT) AS max_peak
    FROM p GROUP BY sample_rate, n_channels
    """,
)
def q_media_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-corpus profiling through a REAL codec end to end: WAV
    payloads are synthesized (stdlib ``wave`` encoder — genuine RIFF
    containers, square waves at id-derived amplitude), decoded back
    through the same codec, and profiled relationally (clips /
    samples / duration / RMS energy / peak per format bucket). Unlike
    the Pillow-optional image path, this real decode runs in ANY
    Python — no optional dependency — making it the always-on proof
    of the multimodal plumbing contract (multimodal/media.py).

    The oracle predicts every decoded field arithmetically from
    _audio_params: a square wave's RMS and peak are exactly its
    amplitude, so even the energy statistics are integer-exact
    cross-engine. duration is one int-to-double divide per group.

    Scale: encode/decode are Arrow-batched mapInPandas streaming
    batches (no whole-partition buffering); the aggregate is an
    ordinary groupBy on a 6-cell format key."""
    from mapreducewordoccurences_spark.multimodal.media import (
        decode_audio_meta,
        make_fake_audio,
    )

    docs = _t(spark, sf_dir, "documents")
    meta = decode_audio_meta(make_fake_audio(docs))
    return meta.groupBy("sample_rate", "n_channels").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_samples").alias("total_samples"),
        (
            (F.sum("n_samples") * 1000).cast("double") / F.col("sample_rate")
        ).alias("total_duration_ms"),
        F.sum("rms").alias("sum_rms"),
        F.max("peak").alias("max_peak"),
    )


@register(
    "embedding_pq_topk",
    # same acceptance contract as the LSH/IVF tiers, for the PQ tier
    """
    SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN acceptance — the MEMORY-bound tier
    completing the ANN family (exact / LSH / IVF / scalar-quantized /
    PQ): per-subspace codebooks compress vectors to m·log2(ks) bits
    (8 bytes here vs 256 for float32×64), the ADC scan touches only
    codes, and the exact tier re-ranks a 100-candidate shortlist
    (functions/similarity.py pq_knn_rerank). Acceptance: per-probe
    recall@5 vs brute force >= 0.4 (observed 1.0 at every tested sf
    with m=16 — random unit vectors are PQ's hardest case, which is
    exactly why the deployed shortlist+rerank shape is the registered
    operator rather than raw ADC top-k)."""
    from mapreducewordoccurences_spark.functions.similarity import (
        pq_knn_rerank,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = pq_knn_rerank(emb, queries, k=5, shortlist=100, m=16, ks=16)
    exact = brute_force_knn(emb, queries, k=5)
    return _knn_recall_acceptance(approx, exact, queries, k=5, min_recall=0.4)


@register(
    "embedding_ivfpq_topk",
    # same acceptance contract as the other ANN tiers, for IVF∘PQ
    """
    SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_embedding_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF∘PQ ANN acceptance (Jégou et al. IVFADC — the deployed
    billion-vector layout; functions/similarity.py ivfpq_knn): the
    coarse k-means quantizer bounds WHICH codes a query ADC-scans
    (nprobe/nlist of the corpus), PQ bounds WHAT the scan touches
    (m·log2(ks)-bit codes, not float vectors), and the exact tier
    re-ranks a 100-candidate shortlist from full vectors. The
    persisted layout (build_ivfpq_index / ivfpq_probe) writes codes
    partitionBy(cell), so probes read nprobe/nlist of the code files
    via dynamic partition pruning (plan-tested) and the probe output
    is bit-identical to this inline composition. Acceptance:
    per-probe recall@5 vs brute force >= 0.4 (observed 0.9 at
    sf0.001 with nprobe=4 — cell pruning trades the flat-PQ scan's
    recall 1.0 for a 4/16 corpus-scan fraction; deterministic:
    fixed-point k-means + fixed-point codebooks)."""
    from mapreducewordoccurences_spark.functions.similarity import ivfpq_knn

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = ivfpq_knn(
        emb, queries, k=5, nlist=16, nprobe=4, shortlist=100, m=16, ks=16
    )
    exact = brute_force_knn(emb, queries, k=5)
    return _knn_recall_acceptance(approx, exact, queries, k=5, min_recall=0.4)


@register(
    "semantic_dedup_clusters",
    # replay the exact-integer k-means (shared CTE, ends at a2 =
    # final assignment), then score cosine ONLY within a cell and
    # apply the greedy smaller-id drop rule. The threshold compares
    # the UNROUNDED cosine on both engines (same convention as
    # dedup_embedding_cosine; testdata embeddings are isotropic, so
    # 0.4 stands in for the >=0.9 production threshold); the output
    # is integer counts only.
    _KMEANS_A2_CTE
    + """
    , pr AS (
      SELECT x.cluster_id, y.vec_id AS ib
      FROM a2 x JOIN a2 y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
      JOIN embeddings ea ON ea.vec_id = x.vec_id
      JOIN embeddings eb ON eb.vec_id = y.vec_id
      WHERE list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])))) >= 0.4
    ), drp AS (SELECT DISTINCT cluster_id, ib FROM pr)
    SELECT m.cluster_id,
           count(*) AS n_members,
           CAST(count(d.ib) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(d.ib) AS BIGINT) AS n_kept
    FROM a2 m LEFT JOIN drp d ON d.cluster_id = m.cluster_id AND d.ib = m.vec_id
    GROUP BY m.cluster_id
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup with k-means cells
    bounding the cosine candidates — the embedding-space analogue of
    LSH banding, and THE published scale path for embedding dedup
    (cosine is scored within a cell only, never across the full n²
    space; k grows with n so cells stay bounded). Drop rule: a vector
    with a smaller-id cell-mate at cosine >= 0.4 is dropped — greedy
    one-representative survivorship, no iterative closure. Composes
    the exact-integer k-means trainer (functions/clustering.py, every
    assignment bit-identical across engines) with the same cosine
    verifier contract as dedup_embedding_cosine.

    k is DERIVED from corpus size (derive_semdedup_k: max(8,
    n // 150)) — the production ∝-n sizing rule; at the driver's
    oracle scale (500 vectors) this resolves to 8, which is exactly
    the k the unrolled integer k-means CTE replays. The companion row
    ``semantic_dedup_recall_audit`` measures what the cell
    restriction misses."""
    from mapreducewordoccurences_spark.dedup.embedding import (
        semantic_dedup_profile,
    )

    return semantic_dedup_profile(
        _t(spark, sf_dir, "embeddings"), iters=2, threshold=0.4
    )


@register(
    "semantic_dedup_recall_audit",
    # portable acceptance oracle: corpus size, the derived cell count
    # (GREATEST(8, n // 150) — same rule as derive_semdedup_k), and
    # the EXACT cosine-pair denominator are all hash-matched; the
    # within-cell recall itself is gated as a boolean (the k-means
    # assignment at dynamic k is not portable SQL, the exact pair set
    # is).
    """
    WITH pr AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
               * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.4
    )
    SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
           CAST(GREATEST(8, (SELECT count(*) FROM embeddings) // 150) AS BIGINT) AS k_cells,
           (SELECT count(*) FROM pr) AS n_exact_pairs,
           TRUE AS recall_ok
    """,
)
def q_semantic_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cross-cell miss measurement (VERDICT r6 #6): the cell
    restriction that makes SemDeDup linear also makes near-dup pairs
    straddling a cell boundary structurally invisible — the paper
    accepts this; this row MEASURES it. Within-cell recall of the
    exact cosine-0.4 pair set, with k derived from corpus size
    (max(8, n // 150) — the production rule, hash-matched in the
    oracle). Measured recall on the isotropic testdata: 0.30 /
    0.41 / 0.28 at sf 0.001 / 0.01 / 0.1 (k = 8 / 8 / 13) — low
    because isotropic embeddings have no cluster structure for the
    cells to exploit (the production corpus regime is clustered, per
    the paper); the acceptance floor 0.15 sits under the observed
    band and recall_ok must come back TRUE for the value-hash to
    match. The O(n²) exact denominator marks this as an AUDIT row to
    run on a sampled slice, never the full corpus."""
    from mapreducewordoccurences_spark.dedup.embedding import (
        semantic_dedup_recall,
    )

    return semantic_dedup_recall(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.4,
        iters=2,
        target_cell_size=150,
        min_recall=0.15,
    ).select("n_vectors", "k_cells", "n_exact_pairs", "recall_ok")


@register(
    "hybrid_rrf_retrieval",
    # BM25 CTE identical to bm25_topk_docs; vector ranks by raw
    # cosine (rank gaps >> ulp on random embeddings, same convention
    # as embedding_cosine_topk); RRF = 1/(60+rank) sums of exact
    # small-int ranks — both engines compute the identical two
    # correctly-rounded double divisions, ties broken by doc_id.
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), stats AS (
      SELECT avg(len(t)) AS avgdl, count(*) AS n_docs FROM toks
    ), tf AS (
      SELECT doc_id, len(t) AS dl, w AS word, count(*) AS tf
      FROM (SELECT doc_id, t, unnest(t) AS w FROM toks)
      WHERE w IN ('spark', 'window', 'join', 'stream')
      GROUP BY 1, 2, 3
    ), df AS (
      SELECT word, count(*) AS df FROM tf GROUP BY word
    ), scores AS (
      SELECT doc_id,
             SUM( ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)) ) AS score
      FROM tf JOIN df USING (word) CROSS JOIN stats s
      GROUP BY doc_id
    ), lexr AS (
      SELECT doc_id, CAST(rn AS INT) AS lex_rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY ROUND(score, 4) DESC, doc_id) AS rn
        FROM scores)
      WHERE rn <= 50
    ), vecr AS (
      SELECT doc_id, CAST(rn AS INT) AS vec_rank FROM (
        SELECT e.vec_id AS doc_id,
               row_number() OVER (ORDER BY
                 list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))) DESC,
                 e.vec_id) AS rn
        FROM embeddings e JOIN embeddings q ON q.vec_id = 0
        WHERE e.vec_id <> 0)
      WHERE rn <= 50
    ), fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
             COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rank), 0)
             + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0) AS rrf
      FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, CAST(rn AS INT) AS fused_rank FROM (
      SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM fused)
    WHERE rn <= 10
    """,
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the standard
    RAG-index serving pattern: BM25 lexical top-50 (only query-term
    hits shuffled) and cosine vector top-50 against probe vec_id 0
    (query broadcast, corpus never self-joined) are fused by
    RRF(d) = Σ 1/(60 + rank_d) and re-ranked. Both top-50 cuts use
    orderBy+limit (TakeOrderedAndProject — distributed partial top-k,
    NO single-partition global sort over the corpus); rank numbers
    are then assigned by a window over the bounded 50-row result,
    and the fused window sees ≤ 100 rows. Output is ranks only —
    no float column crosses the engine boundary."""
    from mapreducewordoccurences_spark.functions.ranking import bm25_scores
    from mapreducewordoccurences_spark.functions.similarity import (
        cosine_similarity,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    lex50 = (
        bm25_scores(docs, ["spark", "window", "join", "stream"])
        .select("doc_id", F.round("score", 4).alias("__s"))
        .orderBy(F.col("__s").desc(), F.col("doc_id"))
        .limit(50)
    )
    lexr = lex50.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("__s").desc(), F.col("doc_id")))
        .cast("int")
        .alias("lex_rank"),
    )

    probe = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__q")
    )
    vec50 = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity("embedding", "__q").alias("__cs"),
        )
        .orderBy(F.col("__cs").desc(), F.col("doc_id"))
        .limit(50)
    )
    vecr = vec50.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("__cs").desc(), F.col("doc_id")))
        .cast("int")
        .alias("vec_rank"),
    )

    fused = lexr.join(vecr, "doc_id", "full")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0))
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number()
            .over(Window.orderBy(rrf.desc(), F.col("doc_id")))
            .cast("int"),
        )
        .where(F.col("fused_rank") <= 10)
        .select("doc_id", "lex_rank", "vec_rank", "fused_rank")
    )


@register(
    "streaming_static_enrich_nation_totals",
    """
    SELECT n.n_name, count(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join — the remaining canonical
    streaming join shape next to the stream-stream interval join
    (streaming_interval_join_views_purchases): events stream in as one
    availableNow micro-batch and are enriched against a STATIC
    dimension (customer ⋈ nation, built as a plain batch DataFrame)
    broadcast into every micro-batch — no state store, no watermark,
    the dimension is re-resolvable per batch by contract. Stateful
    complete-mode groupBy then totals per nation; the oracle
    recomputes relationally, and the decimal-exact value sum makes
    the hash-match order-independent. At scale this is the dimension
    pattern for streams: the per-batch broadcast costs |dim|, the
    stream side never shuffles for the join."""
    import shutil
    import tempfile
    import uuid

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    work = tempfile.mkdtemp(prefix="stream_enrich_")
    sink = f"enrich_{uuid.uuid4().hex[:8]}"
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        enriched = stream.join(F.broadcast(dim), "user_id")
        agg = enriched.groupBy("n_name").agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", 4, "total_value"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = spark.table(sink)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
