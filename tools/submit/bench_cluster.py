"""Cluster bench driver: time the 20 headline queries on a REAL
standalone cluster (2+ workers, separate JVMs, real shuffle over the
block-transfer service) and record per-query SHUFFLE READ/WRITE BYTES
alongside wall time (VERDICT r11 ask #3).

Why this exists: every timing artifact before r12 was local[32] —
one JVM, where "shuffle" is a memory copy and a plan that doubles
shuffle volume can time the same. The byte metrics here are the
signal local mode cannot see; the regression gate flags growth in
shuffle volume per query against the previous round's artifact even
when wall time looks flat.

Metrics come from the driver's own REST status API
(/api/v1/applications/<app>/stages) — the same numbers the Spark UI
shows, summed over the stages each query completed. This is
standard public Spark monitoring surface (monitoring.md), no
listener plumbing needed from Python.

Submitted by tools/submit/bench_standalone.sh; also runnable against
any master. The artifact schema:
  {"metric": "cluster_headline_total_sec", "value": ...,
   "queries": {name: {"sec", "shuffle_read_bytes",
                      "shuffle_write_bytes", "executor_run_ms",
                      "n_stages"}},
   "cluster": {...}, "shuffle_regressions": [...]}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def _completed_stages(spark) -> dict[tuple[int, int], dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    return {(s["stageId"], s["attemptId"]): s for s in stages}


def _stage_delta(before: dict, after: dict) -> dict:
    new = [s for k, s in after.items() if k not in before]
    return {
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "input_bytes": sum(s.get("inputBytes", 0) for s in new),
        "executor_run_ms": sum(s.get("executorRunTime", 0) for s in new),
        "n_stages": len(new),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prev", default=None, help="previous artifact for the shuffle gate")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-workers", type=int, default=None,
                    help="worker JVM count, recorded in the artifact")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mapreducewordoccurences-cluster-bench").getOrCreate()

    # client-mode driver: repo root is the submit cwd
    sys.path.insert(0, os.getcwd())
    from bench import HEADLINE  # the exact list bench.py times

    from mapreducewordoccurences_spark.queries import QUERIES

    # warm-up: JVM + codegen + parquet footer caches
    QUERIES["wordcount"](spark, args.sf_dir).write.mode("overwrite").format("noop").save()

    results: dict[str, dict] = {}
    for name in HEADLINE:
        best = None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            before = _completed_stages(spark)
            t0 = time.monotonic()
            QUERIES[name](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            sec = time.monotonic() - t0
            # stage records land in the status store asynchronously;
            # poll briefly until the set stabilizes
            after = _completed_stages(spark)
            for _ in range(10):
                time.sleep(0.2)
                nxt = _completed_stages(spark)
                if len(nxt) == len(after):
                    break
                after = nxt
            delta = _stage_delta(before, after)
            if best is None or sec < best["sec"]:
                best = {"sec": round(sec, 3), **delta}
        results[name] = best

    sc = spark.sparkContext
    # executor inventory from the REST API (driver row excluded)
    with urllib.request.urlopen(
        f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/executors",
        timeout=10,
    ) as r:
        executors = [e for e in json.loads(r.read()) if e["id"] != "driver"]

    # shuffle-byte regression gate vs the previous artifact: flag
    # growth a local[32] wall-clock gate cannot see. Thresholds: 1.3x
    # AND +16 MiB absolute (tiny-query byte jitter is not a signal).
    regressions = []
    if args.prev and os.path.exists(args.prev):
        prev = json.load(open(args.prev)).get("queries", {})
        for name, cur in results.items():
            p = prev.get(name)
            if not p:
                continue
            for metric in ("shuffle_read_bytes", "shuffle_write_bytes"):
                was, now = p.get(metric, 0), cur.get(metric, 0)
                if now > was * 1.3 and now - was > 16 * 1024 * 1024:
                    regressions.append(
                        {"query": name, "metric": metric, "prev": was, "cur": now,
                         "ratio": round(now / max(was, 1), 2)}
                    )

    payload = {
        "metric": "cluster_headline_total_sec",
        "value": round(sum(r["sec"] for r in results.values()), 3),
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "reps": args.reps,
        "cluster": {
            "master": sc.master,
            "n_executors": len(executors),
            "n_workers": args.n_workers,
            "executor_host_ports": sorted(e["hostPort"] for e in executors),
            "executor_cores": [e.get("totalCores") for e in executors],
            "default_parallelism": sc.defaultParallelism,
        },
        "total_shuffle_write_bytes": sum(
            r["shuffle_write_bytes"] for r in results.values()
        ),
        "queries": results,
        "shuffle_regressions": regressions,
        "regressions_baseline": args.prev if args.prev and os.path.exists(args.prev) else None,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("metric", "value", "total_shuffle_write_bytes",
                       "shuffle_regressions")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
