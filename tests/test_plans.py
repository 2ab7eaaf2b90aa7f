"""Plan-quality regression tests: the physical plans the engine would
run at 100 TB must keep their scale-critical properties — pushdown,
pruning, broadcast, bounded shuffle counts, no Python in relational
hot paths. A failure here is a performance regression even when
results stay correct.
"""

from __future__ import annotations

import pytest

from mapreducewordoccurences_spark.plans.explain import (
    codegen_spans,
    count_exchanges,
    has_broadcast_join,
    has_pushed_filters,
    has_python_eval,
    plan_audit,
    read_schema_columns,
)
from mapreducewordoccurences_spark.queries import QUERIES

from tests.conftest import SF_DIR


def q(spark, name):
    return QUERIES[name](spark, SF_DIR)


def test_wordcount_plan_shape(spark):
    df = q(spark, "wordcount")
    # scan → tokenize → partial agg → ONE shuffle → final agg
    assert count_exchanges(df) == 1
    # column pruning: only the text column leaves the scan
    assert read_schema_columns(df) == [["text"]]
    assert not has_python_eval(df)
    # (codegen spans only appear in the simple plan after AQE
    # finalizes; asserted post-execution in tuning sessions instead)


def test_q1_filter_pushdown_and_single_shuffle(spark):
    df = q(spark, "q1_pricing_summary")
    assert has_pushed_filters(df, "l_shipdate")
    assert count_exchanges(df) == 1  # partial agg before the shuffle
    cols = read_schema_columns(df)[0]
    assert "l_comment" not in cols  # (no such col, but guard pruning)
    assert set(cols) <= {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }
    assert not has_python_eval(df)


def test_q5_broadcasts_dims(spark):
    df = q(spark, "q5_region_revenue")
    assert has_broadcast_join(df)
    assert has_pushed_filters(df, "r_name")  # dim filter reaches scan
    assert not has_python_eval(df)


def test_window_topk_inserts_group_limit(spark):
    from mapreducewordoccurences_spark.plans.explain import formatted_plan

    df = q(spark, "window_topk_orders_per_cust")
    # rank-filter pattern must trigger WindowGroupLimit: partial top-k
    # before the shuffle so it carries O(groups×k), not all rows
    assert "WindowGroupLimit" in formatted_plan(df)
    assert count_exchanges(df) == 1


def test_asof_join_single_shuffle(spark):
    df = q(spark, "asof_join_purchase_signup")
    # union + window — exactly one hash shuffle on user_id
    assert count_exchanges(df) == 1
    assert not has_python_eval(df)


def test_text_queries_stay_jvm_side(spark):
    for name in ["text_stats", "language_id", "quality_score", "dedup_exact"]:
        assert not has_python_eval(q(spark, name)), name


def test_text_stats_prunes_to_two_columns(spark):
    cols = read_schema_columns(q(spark, "text_stats"))[0]
    assert set(cols) == {"doc_id", "text"}


def test_brute_force_knn_broadcasts_queries(spark):
    df = q(spark, "embedding_cosine_topk")
    assert has_broadcast_join(df)
    # corpus side never hash-shuffles pre-score; only the per-query
    # top-k window shuffles (1 exchange)
    assert count_exchanges(df) == 1


def test_dedup_exact_single_shuffle(spark):
    assert count_exchanges(q(spark, "dedup_exact")) == 1
