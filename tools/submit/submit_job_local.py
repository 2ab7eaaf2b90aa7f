"""local[32] reference side of the cluster smoke: same digest protocol
as tools/submit/submit_job.py, session built by the engine's own
factory — the pair proves executors on a real cluster compute exactly
what the single box computes."""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from mapreducewordoccurences_spark.queries import QUERIES
    from mapreducewordoccurences_spark.session import get_spark

    spark = get_spark("submit-local-ref", master="local[32]", shuffle_partitions=16)
    results = {}
    for name in args.queries.split(","):
        name = name.strip()
        t0 = time.monotonic()
        df = QUERIES[name](spark, args.sf_dir)
        rows = df.collect()
        cols = sorted(df.columns)
        canon = sorted("|".join(repr(r[c]) for c in cols) for r in rows)
        results[name] = {
            "rows": len(rows),
            "value_md5": hashlib.md5("\n".join(canon).encode()).hexdigest(),
            "sec": round(time.monotonic() - t0, 3),
        }
    with open(args.out, "w") as f:
        json.dump({"master": "local[32]", "results": results}, f, indent=1)
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
