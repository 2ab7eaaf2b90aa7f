"""merge_upsert (operators/merge.py): update/insert/delete/carry-over
semantics and latest-version collapse."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducewordoccurences_spark.operators.merge import latest_per_key, merge_upsert


def test_merge_upsert_all_four_outcomes(spark):
    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "x"]
    )
    upd = spark.createDataFrame(
        [
            (2, "b1", 21.0, 1, False),   # update (older)
            (2, "b2", 22.0, 2, False),   # update (latest wins)
            (3, "c", 30.0, 1, True),     # delete
            (9, "new", 90.0, 1, False),  # insert
        ],
        ["k", "s", "x", "v", "del"],
    )
    out = {
        r.k: (r.s, r.x)
        for r in merge_upsert(cur, upd, ["k"], version_col="v", delete_col="del").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b2", 22.0), 9: ("new", 90.0)}


def test_latest_per_key_picks_max_version(spark):
    upd = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 3), (1, "z", 2)], ["k", "s", "v"]
    )
    got = latest_per_key(upd, ["k"], "v").collect()
    assert len(got) == 1 and got[0].s == "y"


def test_merge_without_version_or_delete(spark):
    cur = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    upd = spark.createDataFrame([(2, "B"), (5, "E")], ["k", "s"])
    out = {r.k: r.s for r in merge_upsert(cur, upd, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 5: "E"}
