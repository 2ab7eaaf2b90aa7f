"""Statistical and data-quality queries: correlations, hypothesis tests, robust statistics, sketch aggregates (approx distinct, HLL partial unions), histograms/quantiles, expectations and integrity audits.

Split from the former single-module queries.py (round 7). The
QUERIES/ORACLES registration contract is unchanged: importing this
module registers its queries with the shared registry.
"""

from __future__ import annotations

from mapreducewordoccurences_spark.queries._shared import *  # noqa: F401,F403

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
           -- CAST: DuckDB types BIGINT * 2.0 as DECIMAL; Spark as
           -- DOUBLE. Both engines must emit DOUBLE for the strict
           -- type-class comparator (and the driver's value hash).
           CAST(p50_bucket * 2.0 AS DOUBLE) AS p50_bucket_lo,
           CAST(p95_bucket * 2.0 AS DOUBLE) AS p95_bucket_lo,
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
