"""Physical-plan inspection helpers.

The 100 TB design rule this engine holds itself to (SURVEY.md §4,
BASELINE.json north star): filters and projections reach the parquet
scan, small dims broadcast, shuffles are counted and justified, and no
row-at-a-time Python sits in a hot path. These helpers make those
properties assertable in tests (tests/test_plans.py) instead of
eyeballed — a plan regression fails CI, not the 1000-executor run.

Parsing matches Spark 4 EXPLAIN output: FORMATTED mode lists each
operator as a numbered detail block ("(5) Exchange"), SIMPLE mode
marks whole-stage-codegen spans with "*(n)" prefixes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (each is a full network rewrite of
    its input — the dominant cost at scale). BroadcastExchange is
    excluded (it ships only the small side)."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.MULTILINE))


def count_scans(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE))


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if a scan carries non-empty PushedFilters (optionally
    matching a fragment, e.g. a column name)."""
    plan = formatted_plan(df)
    pushed = ",".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    if not pushed.strip():
        return False
    return fragment is None or fragment in pushed


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (column-pruning
    check: a 2-column projection must not read 16 columns)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python (BatchEvalPython)
    or Arrow-batched Python (ArrowEvalPython / MapInPandas). The
    catalog's relational/text queries must report False; only the
    multimodal stubs may report True."""
    plan = formatted_plan(df)
    return bool(
        re.search(
            r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan
        )
    )


def codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans in the simple plan ("*(n)"
    markers). Wider/fewer spans ⇒ more operators fused into single
    generated loops."""
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))


def plan_audit(df: DataFrame) -> dict:
    """One-call summary used by tests and tuning sessions."""
    return {
        "exchanges": count_exchanges(df),
        "broadcast_join": has_broadcast_join(df),
        "python_eval": has_python_eval(df),
        "scans": count_scans(df),
        "codegen_spans": codegen_spans(df),
        "read_schemas": read_schema_columns(df),
    }


def global_window_inputs(df: DataFrame) -> list[str]:
    """The ``Input`` line of every UNPARTITIONED Window node in the
    plan (empty list = no single-partition windows).

    A Window node's ``Arguments`` carry [functions], [partition cols],
    [order] when partitioned but only [functions], [order] when global
    — so the top-level list separator ``], [`` appears twice vs once.
    Callers (the catalog-wide plan audit) match the returned Input
    lines against known config-bounded axes: a global window is only
    acceptable over an aggregate whose row count is bounded by
    configuration or algebra (partition counts, frequency classes,
    percentile grids), never over a scan of a scaling table.
    """
    plan = formatted_plan(df)
    out: list[str] = []
    for block in re.split(r"^\(\d+\) ", plan, flags=re.MULTILINE):
        lines = block.splitlines()
        # exact node-name match: "WindowGroupLimit" (partial top-k,
        # always partitioned) must not count
        if not lines or lines[0].strip() != "Window":
            continue
        args = next((ln for ln in lines if ln.startswith("Arguments:")), "")
        # Arguments carry [functions], [partition], [order] — but both
        # the partition and order lists are omitted when empty, so the
        # top-level list count alone is ambiguous at 2: it's either
        # global+ordered ([funcs], [order]) or partitioned+unordered
        # ([funcs], [partition]). Order lists always carry ASC/DESC
        # markers; partition lists never do.
        n_lists = args.count("], [") + 1
        if n_lists >= 3:
            continue  # partitioned (+ordered)
        if n_lists == 2:
            last = args.rsplit("], [", 1)[-1]
            if " ASC" not in last and " DESC" not in last:
                continue  # partitioned, no order — not global
        out.append(next((ln for ln in lines if ln.startswith("Input")), ""))
    return out
