"""sf1 bench: the heavy-core queries timed at the synthesized sf1
decade, with the same round-over-round regression gate the sf0.1
headline has (VERDICT r7 ask #7).

Until round 7 the only sf1 timing data lived in SCALING_r{N}.jsonl —
useful for growth-ratio fits but with no regression discipline: a
query could get 2x slower at sf1 while its sf0.1 time (fixed-cost
dominated) stayed flat, and nothing would flag it. This tool times
the sf1-core set (the 27 queries the r7 sf1 oracle sweep verified,
plus later sf1-grade additions) via the noop sink, best-of-N warm,
and writes ``BENCH_sf1_r{N}.json`` with a ``regressions`` list
computed against the previous round's artifact by
tools/bench_diff.diff_records (same 1.5x / 0.3 s gate).

Timing protocol matches bench.py: noop sink (no collect), per-query
cache clear, best-of-N warm with cold times alongside. Run on a quiet
box — do not overlap with the sf1 oracle sweep or pytest.

Usage: python tools/bench_sf1.py [round] [sf_dir]
       (defaults: $SPARK_GRAFT_ROUND; .localdata/sf1)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The r7 sf1-verified core + round-8 sf1-grade additions. Keep this
# list in sync with the heavy family the sf1 oracle sweep exercises
# (it is intentionally NOT the full catalog: sf1 timing costs ~25 min
# and the long tail's scale behavior is covered by the growth probes).
SF1_CORE = [
    "wordcount",
    "q1_pricing_summary",
    "q9_profit_by_nation_year",
    "q18_large_order_customers",
    "window_topk_orders_per_cust",
    "rollup_orders",
    "sessionize_events",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix_filter",
    "dedup_containment",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_incremental_minhash",
    "dedup_threshold_sensitivity",
    "near_dedup_keepset",
    "near_dedup_keepset_lsh",
    "dedup_clusters",
    "substring_dedup_spans",
    "kcore_near_dup_docs",
    "group_split_leakage_audit",
    "bpe_learn_merges",
    "embedding_cosine_topk",
    "pagerank_event_transitions",
    "degree_distribution_session_graph",
    "dsir_importance_weights",
    "repetition_filter_stats",
    # round-8 additions
    "triangles_planted_acceptance",
    "ntile_customer_value_quartiles",
    # round-9 additions (the perceptual dedup tier + edit tier;
    # first timed in the r9 artifact as NEW rows — the round-over-
    # round gate compares per-query, so additions don't perturb the
    # existing rows' baselines)
    "dedup_edit_distance_pairs",
    "media_image_dhash_pairs",
    "media_audio_fingerprint_pairs",
    "media_video_clip_dhash_pairs",
    "near_dup_cross_source_matrix",
    # round-10 additions (vendored JPEG tier + the persisted ANN
    # lifecycle; NEW rows — the per-query gate diffs by name, so
    # additions don't perturb existing baselines)
    "media_jpeg_dhash_pairs",
    "embedding_ivfpq_persisted_topk",
    # round-11 additions (vendored GIF + MP4/MJPEG tiers, and the
    # now-distributed MMR over its IVF shortlist)
    "media_gif_dhash_pairs",
    "media_mp4_clip_dhash_pairs",
    "mmr_diversified_topk_ivf",
]


def latest_sf1_record(repo_dir: str, before_round: int | None = None) -> str | None:
    """Newest BENCH_sf1 artifact, optionally restricted to rounds
    strictly BEFORE ``before_round`` — a re-run within the same round
    must diff against the PRIOR round's artifact, not the file it is
    about to overwrite (which would record a clean gate against
    itself)."""
    best, best_n = None, -1
    for path in glob.glob(os.path.join(repo_dir, "BENCH_sf1_r*.json")):
        m = re.search(r"BENCH_sf1_r(\d+)", os.path.basename(path))
        if not m:
            continue
        n = int(m.group(1))
        if before_round is not None and n >= before_round:
            continue
        if n > best_n:
            best, best_n = path, n
    return best


def main() -> int:
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_ROUND", "8")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else ".localdata/sf1"
    out_path = os.path.join(repo_dir, f"BENCH_sf1_r{int(rnd):02d}.json")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from tools.bench_diff import diff_records

    from mapreducewordoccurences_spark.queries import QUERIES
    from mapreducewordoccurences_spark.session import get_spark

    t0 = time.monotonic()
    spark = get_spark(
        "bench-sf1",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    startup = time.monotonic() - t0

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in SF1_CORE:
        best = float("inf")
        for r in range(runs):
            t = time.monotonic()
            try:
                QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench_sf1: {name} failed: {errors[name]}", file=sys.stderr)
                break
            dt = round(time.monotonic() - t, 3)
            if r == 0:
                cold[name] = dt
            best = min(best, dt)
            spark.catalog.clearCache()
        if name not in errors:
            timings[name] = best
            print(f"{name}: {best}s", file=sys.stderr, flush=True)

    record = {
        "metric": "sf1_core_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "startup_sec": round(startup, 3),
        "cold_total_sec": round(sum(cold.values()), 3),
        "runs_per_query": runs,
        "cpus": 32,
        "errors": errors,
    }
    prev_path = latest_sf1_record(repo_dir, before_round=int(rnd))
    regressions: list[dict] = []
    compared = False
    if prev_path:
        try:
            with open(prev_path) as f:
                regressions = diff_records(json.load(f), record)
            compared = True
        except (OSError, ValueError) as exc:
            print(f"bench_sf1: gate skipped: {exc}", file=sys.stderr)
    record["regressions"] = regressions
    # None when nothing was actually compared — an empty regressions
    # list must never masquerade as a clean gate with no baseline
    record["regressions_baseline"] = (
        os.path.basename(prev_path) if compared else None
    )
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: record[k] for k in (
        "metric", "value", "sf", "runs_per_query", "regressions",
    )}))
    spark.stop()
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
