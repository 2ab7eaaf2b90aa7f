"""Streaming tests: file-source micro-batches → memory sink, checked
against the batch oracle (streaming results must equal batch results
on the same finite input — the exactly-once contract)."""

from __future__ import annotations

import collections
import os
import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.streaming import (
    read_text_stream,
    streaming_word_counts,
    tumbling_event_counts,
    session_event_counts,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_wordcount_matches_batch_oracle(spark, tmpdir):
    src = os.path.join(tmpdir, "src")
    os.makedirs(src)
    # two "arrivals" — two files, processed as micro-batches
    with open(os.path.join(src, "a.txt"), "w") as f:
        f.write("foo bar qux\nbar bar baz\n")
    with open(os.path.join(src, "b.txt"), "w") as f:
        f.write("foo Foo 42 bar\n")

    counts = streaming_word_counts(read_text_stream(spark, src))
    q = (
        counts.writeStream.format("memory")
        .queryName("wc_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["word"]: r["count"]
        for r in spark.sql("SELECT * FROM wc_stream").collect()
    }
    text = "foo bar qux\nbar bar baz\nfoo Foo 42 bar\n"
    expected = dict(collections.Counter(re.findall(r"[A-Za-z0-9]+", text)))
    assert got == expected


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "ts timestamp, event_type string, user_id bigint, value double"
    )
    df.write.mode("overwrite").parquet(path)
    return df


def test_tumbling_window_counts(spark, tmpdir):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m), "click", 1, 1.0)
        for m in [1, 2, 59, 61, 121]
    ]
    src = os.path.join(tmpdir, "events")
    _write_events(spark, src, rows)

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, user_id bigint, value double"
    ).parquet(src)
    out = tumbling_event_counts(stream, ts_col="ts", window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("tumble")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].hour, r["n_events"])
        for r in spark.sql("SELECT * FROM tumble").collect()
    }
    assert got == {(0, 3), (1, 1), (2, 1)}


def test_session_window_counts(spark, tmpdir):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # user 1: burst of 3 within 10 min, then 2 more after a 45-min gap
    rows = [
        (base + dt.timedelta(minutes=m), "click", 1, 1.0)
        for m in [0, 5, 10, 55, 60]
    ]
    src = os.path.join(tmpdir, "events")
    _write_events(spark, src, rows)

    stream = spark.readStream.schema(
        "ts timestamp, event_type string, user_id bigint, value double"
    ).parquet(src)
    out = session_event_counts(stream, ts_col="ts", key_col="user_id", gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["n_events"] for r in spark.sql("SELECT * FROM sessions").collect())
    assert got == [2, 3]


def test_streaming_events_ts_normalization(spark):
    """The events table's ts column (whatever physical type the
    testdata ships) converts to event-time for windowing (batch
    DataFrame check of the same expression)."""
    from mapreducewordoccurences_spark.sources.readers import load_table
    from mapreducewordoccurences_spark.streaming.windows import _as_event_time

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df, et = _as_event_time(ev, "ts")
    row = df.select(et).first()
    assert row[0].year >= 2024


def test_kvtext_streaming_source_tails_new_files(spark, tmp_path):
    """The kvtext streaming reader must pick up files exactly once:
    two files at start, one more mid-stream, no dup rows."""
    import time

    from mapreducewordoccurences_spark.sources.kv_datasource import register_kvtext

    src = tmp_path / "kvstream"
    src.mkdir()
    (src / "kv-0.txt").write_text("a=1\nb=2\n")
    (src / "kv-1.txt").write_text("c=3\n")

    register_kvtext(spark)
    stream = (
        spark.readStream.format("kvtext")
        .schema("key string, value bigint")
        .load(str(src))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kv_stream_test")
        .outputMode("append")
        .trigger(processingTime="0.2 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "kv-2.txt").write_text("d=4\n")
        deadline = time.monotonic() + 30
        want = {("a", 1), ("b", 2), ("c", 3), ("d", 4)}
        got = set()
        while time.monotonic() < deadline:
            q.processAllAvailable()
            got = {
                (r.key, r.value)
                for r in spark.sql("SELECT * FROM kv_stream_test").collect()
            }
            if got == want:
                break
            time.sleep(0.3)
        assert got == want
        # exactly once: no duplicate rows
        n = spark.sql("SELECT count(*) AS n FROM kv_stream_test").collect()[0].n
        assert n == 4
    finally:
        q.stop()


def test_materialized_aggregate_matches_batch(spark, tmp_path):
    """Stream a parquet directory in two availableNow passes; the
    maintained snapshot must equal the one-shot batch aggregate."""
    import os

    from pyspark.sql import functions as F

    from mapreducewordoccurences_spark.streaming.materialized import (
        read_current_snapshot,
        start_materialized_sum_count,
    )

    src = str(tmp_path / "src")
    base = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    df1 = spark.range(0, 500).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    df1.write.mode("append").parquet(src)

    schema = "k bigint, v double"
    q = start_materialized_sum_count(
        spark.readStream.schema(schema).parquet(src), "k", "v", base, ckpt
    )
    q.awaitTermination(120)

    df2 = spark.range(500, 900).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    df2.write.mode("append").parquet(src)
    q2 = start_materialized_sum_count(
        spark.readStream.schema(schema).parquet(src), "k", "v", base, ckpt
    )
    q2.awaitTermination(120)

    snap = {
        r.k: (r.sum_value, r.n_rows)
        for r in read_current_snapshot(spark, base).collect()
    }
    want = {
        r.k: (r.sum_value, r.n_rows)
        for r in spark.read.parquet(src)
        .groupBy("k")
        .agg(F.sum("v").alias("sum_value"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert snap == want and len(snap) == 7
