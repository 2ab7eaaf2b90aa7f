"""Empirical scaling probe: time representative catalog operators at
sf0.01 / sf0.1 / sf1 and fit the per-decade growth factor.

The SCALE.md design audit argues each family is ~linear in input
size; this tool MEASURES it. A growth factor near 10 per 10x data is
linear; <10 means fixed costs still dominate at that size; >>10 flags
a super-linear blow-up worth a plan audit.

sf0.001-0.1 are the driver-generated read-only sets; sf1 is the
locally synthesized decade (``python tools/gen_sf1.py`` ->
``.localdata/sf1/``, structure-preserving replication — see that
tool's docstring for why naive replication would fake quadratic
growth in the dedup family). The sf0.1 -> sf1 decade is the one that
matters: r5's probe stopped at sf0.1 where growth factors of 1.3-1.6x
per decade proved only that fixed costs dominate.

Usage:  python tools/scaling_probe.py [query ...]
Env:    SPARK_GRAFT_PROBE_SFS  comma list (default "0.01,0.1,1")
        SPARK_GRAFT_PROBE_RUNS best-of runs per point (default 3)
Prints one JSON line per query: sec per sf + per-decade growth.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The 9 heaviest catalog queries by BENCH_r05 cost plus wordcount (the
# reference-parity scan->agg->sort baseline). Between them these cover
# every expensive family: LSH banding, exact-verify cascade, iterative
# graph/BPE loops, posting-list self-joins, ANN, interval overlap.
DEFAULT_PROBES = [
    "wordcount",
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_prefix_filter",
    "near_dedup_keepset",
    "near_dedup_keepset_lsh",
    "dedup_incremental_minhash",
    "embedding_cosine_topk",
    "sessionize_events",
    "pagerank_event_transitions",
    "op:triangles_approx",
    "label_noise_knn_disagreement",
    "bpe_learn_merges",
    "dsir_importance_weights",
    "repetition_filter_stats",
    # round-8 additions
    "triangles_planted_acceptance",
    "mmr_diversified_topk",
    "matryoshka_prefix_recall",
    # round-11 additions: vendored GIF/MP4 tiers (generator+codec
    # bound — the probe checks the per-decade shape stays ~linear)
    "media_gif_dhash_pairs",
    "media_mp4_clip_dhash_pairs",
]


def _probe_triangles_approx(spark, sf_dir_path):
    """Probe-only: the wedge-SAMPLING estimator alone. The catalog
    acceptance row couples it with the exact count (needed for its
    oracle), and exact counting is the thing that explodes on the
    ~13%-dense sf1 overlap graph (~10¹⁰ wedges — the r7 sweep hung
    over an hour on it). The operator whose scaling matters at 100 TB
    is the estimator: O(E + k) by design; this measures it."""
    from mapreducewordoccurences_spark.operators.graph import triangle_count_approx
    from mapreducewordoccurences_spark.queries.graph import _session_overlap_edges

    return triangle_count_approx(
        _session_overlap_edges(spark, sf_dir_path), "user_a", "user_b",
        n_samples=50_000,
    )


# names prefixed "op:" resolve here instead of the catalog — operators
# whose oracle-able catalog formulation deliberately includes work
# that cannot scale (e.g. an exact-count acceptance denominator)
PROBE_ONLY_OPS = {
    "op:triangles_approx": _probe_triangles_approx,
}


def sf_dir(sf: str) -> str:
    path = f"/root/testdata/sf{sf}"
    if os.path.isdir(path):
        return path
    local = os.path.join(REPO, ".localdata", f"sf{sf}")
    if os.path.isdir(local):
        return local
    raise SystemExit(
        f"no data for sf{sf}: generate it first (python tools/gen_sf1.py)"
    )


def main() -> int:
    probes = sys.argv[1:] or DEFAULT_PROBES
    sfs = (os.environ.get("SPARK_GRAFT_PROBE_SFS") or "0.01,0.1,1").split(",")
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS") or "3")
    dirs = {sf: sf_dir(sf) for sf in sfs}

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

    unknown_ops = [
        n for n in probes if n.startswith("op:") and n not in PROBE_ONLY_OPS
    ]
    if unknown_ops:
        raise SystemExit(
            f"unknown op-probe(s) {unknown_ops}; known: {sorted(PROBE_ONLY_OPS)}"
        )
    for name in probes:
        fn = PROBE_ONLY_OPS.get(name) or QUERIES[name]
        times: dict[str, float] = {}
        for sf in sfs:
            best = float("inf")
            for _ in range(runs):
                t = time.monotonic()
                fn(spark, dirs[sf]).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.monotonic() - t)
                spark.catalog.clearCache()
            times[sf] = round(best, 3)
        rec: dict = {"query": name, "sec": times}
        for lo, hi in zip(sfs, sfs[1:]):
            if times.get(lo):
                rec[f"growth_{lo}_to_{hi}"] = round(times[hi] / times[lo], 2)
        print(json.dumps(rec), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
