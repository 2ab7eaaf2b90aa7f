"""Reference-vs-engine wordcount baseline, with a LOAD-CHECK preamble
(VERDICT r8 ask #8).

The BASELINE.md protocol (reference ``mapred_woc <corpus> <ncores>``
rebuilt from /root/reference/src with the Makefile's flags, vs the
engine's ``count_words_in_file`` on a warmed local[32] session, same
74.5 MB corpus = sf0.1 documents.text joined with newlines × 50,
best-of-N warm on both sides) was previously run by hand each round —
and the r8 judge measured 1.33× under co-tenant load where the
quiet-box history is 1.14×, purely because the 14-minute test suite
was running concurrently. This tool makes the protocol one command
and RECORDS THE LOAD CONTEXT alongside the ratio, so every future
number carries the evidence needed to tell measurement drift from
co-tenancy:

- /proc/loadavg (1/5/15-min) before and after,
- MemAvailable before,
- a count of live java/pytest/python processes other than this one.

A 1-min load average above ``--max-load`` (default 4.0) prints a loud
warning into the record (``load_warning``) — the number is still
measured, but flagged as a loaded-box upper bound.

Usage: python tools/baseline_wordcount.py [runs]
Writes one JSON line to stdout; append the table to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 50
MAX_LOAD = float(os.environ.get("SPARK_GRAFT_BASELINE_MAX_LOAD", "4.0"))


def load_context() -> dict:
    with open("/proc/loadavg") as f:
        l1, l5, l15 = (float(x) for x in f.read().split()[:3])
    mem_avail_kb = None
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable:"):
                mem_avail_kb = int(line.split()[1])
                break
    try:
        out = subprocess.run(
            ["ps", "-eo", "comm="], capture_output=True, text=True, check=True
        ).stdout.splitlines()
        heavy = sum(
            1 for c in out if c.strip() in ("java", "pytest", "duckdb")
        )
    except (OSError, subprocess.SubprocessError):
        heavy = None
    return {
        "loadavg_1m": l1,
        "loadavg_5m": l5,
        "loadavg_15m": l15,
        "mem_available_gib": round(mem_avail_kb / 1048576, 1)
        if mem_avail_kb
        else None,
        "co_tenant_jvm_or_test_procs": heavy,
    }


def build_corpus(work: str) -> str:
    import duckdb

    con = duckdb.connect()
    text = "\n".join(
        r[0]
        for r in con.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    )
    path = os.path.join(work, "corpus_big.txt")
    with open(path, "w") as f:
        for _ in range(REPEATS):
            f.write(text)
            f.write("\n")
    return path


def build_reference(work: str) -> str:
    ref = os.path.join(work, "refbuild")
    shutil.copytree(REFERENCE, ref)
    subprocess.run(
        ["make"], cwd=ref, check=True, capture_output=True, text=True
    )
    exe = os.path.join(ref, "mapred_woc")
    if not os.path.exists(exe):
        raise RuntimeError("reference build produced no mapred_woc")
    return exe


def warm_page_cache(path: str) -> None:
    """Read the corpus fully once before ANY timing: the file was
    written seconds earlier, and overlapping writeback/cold-cache I/O
    depressed a full best-of-4 by ~2× when first measured (r9)."""
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass


def time_reference(exe: str, corpus: str, threads: int, runs: int) -> float:
    best = float("inf")
    for r in range(runs + 1):
        t0 = time.perf_counter()
        subprocess.run(
            [exe, corpus, str(threads)],
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        if r > 0:  # run 0 is the untimed warmup
            best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    before = load_context()
    record: dict = {"load_before": before, "corpus_repeats": REPEATS}
    if before["loadavg_1m"] > MAX_LOAD:
        record["load_warning"] = (
            f"1-min load {before['loadavg_1m']} > {MAX_LOAD}: this is a "
            "loaded-box upper bound, not a quiet-box baseline"
        )
        print(f"WARNING: {record['load_warning']}", file=sys.stderr)

    work = tempfile.mkdtemp(prefix="baseline_wc_")
    try:
        corpus = build_corpus(work)
        record["corpus_mb"] = round(os.path.getsize(corpus) / 1e6, 1)
        exe = build_reference(work)
        os.sync()
        warm_page_cache(corpus)
        record["ref_1t_sec"] = time_reference(exe, corpus, 1, runs)
        record["ref_32t_sec"] = time_reference(exe, corpus, 32, runs)

        from mapreducewordoccurences_spark.core.wordcount import (
            count_words_in_file,
        )
        from mapreducewordoccurences_spark.session import get_spark

        t0 = time.monotonic()
        spark = get_spark(
            "baseline-wc", master="local[32]", shuffle_partitions=32
        )
        spark.range(1000).selectExpr("sum(id)").collect()
        record["startup_sec"] = round(time.monotonic() - t0, 3)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            count_words_in_file(spark, corpus).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        record["engine_sec"] = round(best, 3)
        spark.stop()

        record["ratio_vs_32t"] = round(
            record["engine_sec"] / record["ref_32t_sec"], 3
        )
        record["ratio_vs_1t"] = round(
            record["engine_sec"] / record["ref_1t_sec"], 3
        )
        record["load_after"] = load_context()
        record["runs"] = runs
        print(json.dumps(record))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
