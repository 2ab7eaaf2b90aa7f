"""Unit tests for the per-query bench regression gate (tools/bench_diff.py).

Pure-Python (no Spark session): the gate runs at the end of every bench
invocation and must be cheap and side-effect-free to test.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_diff import (  # noqa: E402
    comparable,
    diff_records,
    latest_local_record,
    record_round,
)


def _rec(queries, extra=None, sf=0.1, runs=7):
    return {
        "queries": dict(queries),
        "extra_queries": dict(extra or {}),
        "sf": sf,
        "runs_per_query": runs,
    }


def test_flags_only_above_ratio_and_floor():
    prev = _rec({"a": 1.0, "b": 0.1, "c": 2.0})
    cur = _rec({"a": 1.6, "b": 0.25, "c": 2.2})
    regs = diff_records(prev, cur)
    # a: 1.6x and +0.6s -> flagged; b: 2.5x but only +0.15s (< floor);
    # c: +0.2s and 1.1x -> neither
    assert [r["query"] for r in regs] == ["a"]
    assert regs[0]["ratio"] == 1.6


def test_sorted_worst_ratio_first_and_extras_included():
    prev = _rec({"a": 1.0}, extra={"x": 0.5})
    cur = _rec({"a": 1.9}, extra={"x": 1.6})
    regs = diff_records(prev, cur)
    assert [r["query"] for r in regs] == ["x", "a"]


def test_additions_and_removals_ignored():
    prev = _rec({"gone": 1.0, "kept": 1.0})
    cur = _rec({"new": 9.0, "kept": 1.0})
    assert diff_records(prev, cur) == []


def test_incomparable_records_yield_no_flags():
    warm = _rec({"a": 1.0}, sf=0.1, runs=7)
    cold = _rec({"a": 9.0}, sf=0.001, runs=1)
    assert not comparable(cold, warm)
    assert diff_records(cold, warm) == []
    # same sf, different warm-up protocol is also incomparable
    assert not comparable(_rec({}, runs=1), _rec({}, runs=7))
    assert comparable(_rec({"a": 1}), _rec({"b": 2}))


def test_latest_local_record_filters_by_comparability(tmp_path):
    for n, sf in ((3, 0.1), (4, 0.001), (5, 0.1)):
        (tmp_path / f"BENCH_local_r{n}.json").write_text(
            json.dumps(_rec({"a": 1.0}, sf=sf))
        )
    like = _rec({}, sf=0.1)
    assert latest_local_record(str(tmp_path)).endswith("r5.json")
    assert latest_local_record(str(tmp_path), like=like).endswith("r5.json")
    assert latest_local_record(
        str(tmp_path), like=_rec({}, sf=1.0)
    ) is None
    assert record_round(str(tmp_path / "BENCH_local_r5.json")) == 5


def test_latest_sf1_record_before_round_excludes_self(tmp_path):
    # ADVICE r9 #3: a re-run within round N must baseline against the
    # newest artifact from a round < N, never the file it overwrites.
    from tools.bench_sf1 import latest_sf1_record

    for n in (7, 8, 9):
        (tmp_path / f"BENCH_sf1_r{n:02d}.json").write_text("{}")
    assert latest_sf1_record(str(tmp_path)).endswith("r09.json")
    assert latest_sf1_record(str(tmp_path), before_round=9).endswith("r08.json")
    assert latest_sf1_record(str(tmp_path), before_round=7) is None
