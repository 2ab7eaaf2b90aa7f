"""Partitioning-invariance: catalog results must be IDENTICAL (not
approximately equal) under different shuffle-partition counts — the
engine's core determinism claim (decimal-exact sums, total orders,
integer arithmetic) means an AQE re-plan or cluster resize can never
change an answer.

Representative set: decimal aggregation (q1), fact-fact join + agg
(q9), windowed (sessionize), ratio (q14), dedup estimation (minhash),
packing (prefix sums).
"""

from __future__ import annotations

import pytest

from mapreducewordoccurences_spark.queries import QUERIES

from tests.conftest import SF_DIR

REPRESENTATIVE = [
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "q14_promo_revenue_ratio",
    "sessionize_events",
    "dedup_minhash_lsh_pairs",
    "pack_documents_to_sequences",
    "scd2_customer_priority",
    "time_weighted_avg_user_value",
]


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_results_invariant_under_shuffle_partitions(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = rows_of(QUERIES[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        many = rows_of(QUERIES[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert few == many, f"{name}: results changed with partition count"


@pytest.mark.parametrize("name", ["q9_profit_by_nation_year",
                                  "near_dedup_keepset",
                                  "pagerank_event_transitions",
                                  "window_topk_orders_per_cust"])
def test_results_invariant_under_aqe_toggle(spark, name):
    """AQE re-plans joins/partitions at runtime; results must not
    depend on whether it ran (the decimal/fixed-point protocols and
    total-order tiebreaks exist precisely for this)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = rows_of(QUERIES[name](spark, SF_DIR))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        on = rows_of(QUERIES[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert off == on
