"""Blocked fuzzy matching (functions/fuzzy.py): recall contract,
best-match determinism, and the no-cross-join plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordoccurences_spark.functions.fuzzy import (
    best_fuzzy_match,
    blocked_fuzzy_join,
)


def _catalog(spark):
    rows = [
        (1, "golden widget"),
        (2, "golden widget"),  # exact dup of 1
        (3, "golden widgets"),
        (4, "silver bearing"),
        (5, "golden bracket"),
    ]
    return spark.createDataFrame(rows, ["cid", "cname"])


def test_recall_edit_past_prefix_is_found(spark):
    cat = _catalog(spark)
    # delete one char at position 8 ("golden wdget") — same 4-prefix
    probes = spark.createDataFrame([(100, "golden wdget")], ["pid", "pname"])
    got = blocked_fuzzy_join(probes, cat, "pname", "cname", max_dist=2).collect()
    matched = {(r.cid, r.dist) for r in got}
    assert (1, 1) in matched and (2, 1) in matched and (3, 2) in matched
    assert (4, 0) not in matched  # different block entirely


def test_best_match_ties_break_by_smallest_cand_id(spark):
    cat = _catalog(spark)
    probes = spark.createDataFrame([(100, "golden wdget")], ["pid", "pname"])
    best = best_fuzzy_match(
        probes, cat, "pname", "cname", probe_id="pid", cand_id="cid"
    ).collect()
    assert len(best) == 1
    assert best[0].cid == 1 and best[0].dist == 1


def test_unmatched_probe_absent_and_no_cross_join(spark):
    cat = _catalog(spark)
    probes = spark.createDataFrame(
        [(100, "golden wdget"), (101, "zzzz nothing")], ["pid", "pname"]
    )
    best = best_fuzzy_match(
        probes, cat, "pname", "cname", probe_id="pid", cand_id="cid"
    )
    assert [r.pid for r in best.collect()] == [100]
    # blocking must appear as an equi-join, never a cartesian product
    plan = best._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_catalog_dedup_path_is_equivalent(spark):
    """Duplicate-heavy catalog: the distinct-name fast path must give
    the identical best match (dist + min cand id) as the full path."""
    import random

    rng = random.Random(7)
    names = ["golden widget", "golden widgets", "silver bearing", "golden bracket"]
    cat = spark.createDataFrame(
        [(i, names[rng.randrange(len(names))]) for i in range(200)], ["cid", "cname"]
    )
    probes = spark.createDataFrame(
        [(100, "golden wdget"), (101, "silvr bearing")], ["pid", "pname"]
    )
    full = {
        (r.pid, r.cid, r.dist)
        for r in best_fuzzy_match(
            probes, cat, "pname", "cname", probe_id="pid", cand_id="cid"
        ).collect()
    }
    fast = {
        (r.pid, r.cid, r.dist)
        for r in best_fuzzy_match(
            probes, cat, "pname", "cname", probe_id="pid", cand_id="cid",
            catalog_dedup=True,
        ).collect()
    }
    assert full == fast and len(full) == 2
