"""Interleaved A/B bench: attribute the r4→r6 headline creep.

The driver-recorded headline total rose 11.45 → 12.87 → 13.78 s across
rounds 4-6.  Each step sat inside the documented host-noise band, but
three same-direction steps need attribution, not another band citation.
Back-to-back full bench runs can't separate host drift from plan
regressions because the host state differs between the two runs.  This
harness removes that confound by *interleaving at query granularity*:

- parent spawns two child processes, A = an old tree (e.g. the round-4
  snapshot checked out via ``git worktree``) and B = HEAD, each child
  owning one warmed local[N] SparkSession built with bench.py's exact
  confs (driver mem, 1g code cache, warm-up query);
- for each rep, for each headline query: run on A, then immediately on
  B (then B-first on odd reps, cancelling order effects), so any host
  drift hits both sides of every comparison equally;
- per-query min over reps on each side, plus the paired per-rep deltas.

Child protocol: one query name per stdin line → one JSON timing line on
stdout (sentinel-prefixed).  Query-name drift across rounds is handled
with a small rename map (bench.py renamed ``dedup_minhash_lsh`` →
``dedup_minhash_lsh_pairs`` in r5; same computation).

Usage:
  git worktree add /tmp/abtree_r4 98bd8de
  python tools/ab_interleave.py /tmp/abtree_r4 /root/repo [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SENTINEL = "@@AB@@"

# old-name fallbacks: HEAD name -> candidate names in older trees
RENAMES = {"dedup_minhash_lsh_pairs": ["dedup_minhash_lsh"]}

HEADLINE = [
    "wordcount",
    "wordcount_topk",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q6_discount_revenue",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_order_count_distribution",
    "q18_large_order_customers",
    "window_topk_orders_per_cust",
    "window_running_user_spend",
    "asof_join_purchase_signup",
    "sessionize_events",
    "json_extract_event_stats",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "embedding_cosine_topk",
]


def child_main(repo_dir: str, sf_dir: str, cpus: str) -> int:
    os.chdir(repo_dir)
    sys.path.insert(0, repo_dir)
    from mapreducewordoccurences_spark.session import get_spark

    try:
        from mapreducewordoccurences_spark.queries import QUERIES
    except ImportError:  # pre-split trees keep the monolithic module
        from mapreducewordoccurences_spark import queries as _q

        QUERIES = _q.QUERIES

    spark = get_spark(
        f"ab-{os.path.basename(repo_dir)}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    print(f"{SENTINEL} " + json.dumps({"ready": True, "names": sorted(QUERIES)}), flush=True)

    for line in sys.stdin:
        name = line.strip()
        if not name or name == "__exit__":
            break
        resolved = name if name in QUERIES else next(
            (c for c in RENAMES.get(name, []) if c in QUERIES), None
        )
        if resolved is None:
            print(f"{SENTINEL} " + json.dumps({"query": name, "err": "missing"}), flush=True)
            continue
        t = time.monotonic()
        try:
            QUERIES[resolved](spark, sf_dir).write.mode("overwrite").format("noop").save()
            out = {"query": name, "sec": round(time.monotonic() - t, 3)}
        except Exception as exc:  # noqa: BLE001
            out = {"query": name, "err": f"{type(exc).__name__}: {exc}"[:300]}
        spark.catalog.clearCache()
        print(f"{SENTINEL} " + json.dumps(out), flush=True)
    spark.stop()
    return 0


class Child:
    def __init__(self, label: str, repo_dir: str, sf_dir: str, cpus: str):
        self.label = label
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", repo_dir, sf_dir, cpus],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            bufsize=1,
        )
        self.ready = self._read()
        assert self.ready.get("ready"), self.ready

    def _read(self) -> dict:
        for line in self.proc.stdout:
            if line.startswith(SENTINEL):
                return json.loads(line[len(SENTINEL) :])
        raise RuntimeError(f"{self.label}: child died")

    def run(self, name: str) -> dict:
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        return self._read()

    def close(self) -> None:
        try:
            self.proc.stdin.write("__exit__\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:  # noqa: BLE001
            self.proc.kill()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child_main(sys.argv[2], sys.argv[3], sys.argv[4])

    tree_a, tree_b = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    # target a specific delta (e.g. one flagged sf1 row) instead of the
    # full headline: SPARK_GRAFT_AB_QUERIES=dedup_ngram_jaccard,...
    only = os.environ.get("SPARK_GRAFT_AB_QUERIES")
    if only:
        HEADLINE[:] = [q.strip() for q in only.split(",") if q.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    a = Child("A", tree_a, sf_dir, cpus)
    b = Child("B", tree_b, sf_dir, cpus)
    results: dict[str, dict[str, list[float]]] = {q: {"A": [], "B": []} for q in HEADLINE}
    try:
        for rep in range(reps):
            order = (a, b) if rep % 2 == 0 else (b, a)
            for q in HEADLINE:
                for child in order:
                    r = child.run(q)
                    # One slot PER REP (None on error): pairing by index
                    # must mean same-rep, or a single early failure shifts
                    # every later "pair" onto different reps and corrupts
                    # the drift-immune paired statistic.
                    results[q][child.label].append(r.get("sec"))
                    if "sec" not in r:
                        print(f"{child.label} {q}: {r.get('err')}", file=sys.stderr)
            print(f"rep {rep + 1}/{reps} done", file=sys.stderr, flush=True)
    finally:
        a.close()
        b.close()

    rows = []
    for q in HEADLINE:
        # pair only reps where BOTH sides succeeded
        pairs = [
            (x, y)
            for x, y in zip(results[q]["A"], results[q]["B"])
            if x is not None and y is not None
        ]
        ra = [x for x, _ in pairs]
        rb = [y for _, y in pairs]
        if not pairs:
            rows.append({"query": q, "err": "missing on one side"})
            continue
        # min-vs-min mirrors the bench protocol; paired median delta is
        # the drift-immune statistic (same-rep pairs share host state)
        deltas = sorted(y - x for x, y in pairs)
        rows.append(
            {
                "query": q,
                "a_min": min(ra),
                "b_min": min(rb),
                "b_minus_a_min": round(min(rb) - min(ra), 3),
                "paired_median_delta": round(deltas[len(deltas) // 2], 3),
            }
        )
    ok = [r for r in rows if "err" not in r]
    summary = {
        "tree_a": tree_a,
        "tree_b": tree_b,
        "reps": reps,
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "a_total_min": round(sum(r["a_min"] for r in ok), 3),
        "b_total_min": round(sum(r["b_min"] for r in ok), 3),
        "paired_total_delta": round(sum(r["paired_median_delta"] for r in ok), 3),
        "per_query": rows,
    }
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
