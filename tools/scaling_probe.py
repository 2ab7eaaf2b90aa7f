"""Empirical scaling probe: time representative catalog operators at
sf0.001 / sf0.01 / sf0.1 and fit the per-decade growth factor.

The SCALE.md design audit argues each family is ~linear in input
size; this tool MEASURES it on the three driver-generated scale
factors (100× span). A growth factor near 10 per 10× data is linear;
<10 means fixed costs still dominate at these sizes; >>10 flags a
super-linear blow-up worth a plan audit.

Usage:  python tools/scaling_probe.py [query ...]
Prints one JSON line per query: times per sf + the sf0.01→sf0.1
growth factor (the cleaner decade — sf0.001 is mostly fixed cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_PROBES = [
    "wordcount",                 # scan → agg → sort
    "q1_pricing_summary",        # scan-heavy aggregate
    "q9_profit_by_nation_year",  # multi-join
    "dedup_exact",               # fingerprint groupBy
    "dedup_ngram_jaccard",       # capped posting-list self-join
    "dedup_minhash_lsh_pairs",   # banding + candidate join
    "embedding_cosine_topk",     # ANN brute-force tier
    "sessionize_events",         # windowed islands
    "near_dedup_keepset",        # full cascade
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> int:
    probes = sys.argv[1:] or DEFAULT_PROBES
    from mapreducewordoccurences_spark.queries import QUERIES
    from mapreducewordoccurences_spark.session import get_spark

    spark = get_spark(
        "scaling-probe",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    results = []
    for name in probes:
        fn = QUERIES[name]
        times: dict[str, float] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = float("inf")
            for _ in range(3):
                t = time.monotonic()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.monotonic() - t)
                spark.catalog.clearCache()
            times[sf] = round(best, 3)
        growth = round(times["0.1"] / times["0.01"], 2) if times["0.01"] else None
        rec = {"query": name, "sec": times, "growth_001_to_01x10": growth}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
