"""Cluster-mode driver program: run named catalog queries via
spark-submit and write a one-line JSON digest per query.

This is the file a real deployment submits — it deliberately does NOT
call ``get_spark()``'s master-setting path: master, executor sizing,
and all cluster confs come from spark-submit/cluster defaults, the
engine only layers its semantic confs (AQE, Arrow, UTC, pushdown) on
top via ``spark.conf`` where they are runtime-settable or expects them
in --conf (see docs/DEPLOY.md for the canonical submit line).

Usage (see tools/submit/smoke_standalone.sh for a working example):
  spark-submit --master spark://host:7077 \
      --py-files dist/mapreducewordoccurences_spark.zip \
      tools/submit/submit_job.py --sf-dir /data/sf1 \
      --queries wordcount,dedup_exact --out /tmp/digest.json

The digest (row count + order-insensitive value hash per query) is
the same three-gate shape the correctness sweeps use, so a cluster
run can be diffed 1:1 against a local[32] run of the same queries —
the acceptance that executors computed what the single box computed.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True, help="comma-separated catalog names")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mapreducewordoccurences-submit").getOrCreate()

    # registry import AFTER the session exists: the zip arrives via
    # --py-files, and executors resolve it from the spark files dir
    from mapreducewordoccurences_spark.queries import QUERIES

    results = {}
    for name in args.queries.split(","):
        name = name.strip()
        t0 = time.monotonic()
        df = QUERIES[name](spark, args.sf_dir)
        rows = df.collect()
        cols = sorted(df.columns)
        canon = sorted(
            "|".join(repr(r[c]) for c in cols) for r in rows
        )
        digest = hashlib.md5("\n".join(canon).encode()).hexdigest()
        results[name] = {
            "rows": len(rows),
            "value_md5": digest,
            "sec": round(time.monotonic() - t0, 3),
        }

    payload = {
        "master": spark.sparkContext.master,
        "executors": spark.sparkContext.defaultParallelism,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
