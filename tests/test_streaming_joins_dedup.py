"""Streaming joins / dedup / foreachBatch: file-source micro-batches
checked against the equivalent batch computation (exactly-once
contract on finite input)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest

from mapreducewordoccurences_spark.sources.sinks import start_foreach_batch_sink
from mapreducewordoccurences_spark.streaming import (
    dedup_stream,
    dedup_stream_within_watermark,
    enrich_stream_with_dim,
    stream_stream_interval_join,
)

EVENT_SCHEMA = "ts timestamp, event_type string, user_id bigint, value double"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_jd_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, path, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return df


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_static_join_matches_batch(spark, tmpdir):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=m), "click", m % 3, 1.0) for m in range(9)]
    src = os.path.join(tmpdir, "ev")
    batch_df = _events(spark, src, rows)
    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver")], "user_id bigint, tier string"
    )

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = enrich_stream_with_dim(stream, dim, on="user_id", how="left")
    _run_to_memory(out, "enriched")

    got = {
        (r["user_id"], r["tier"])
        for r in spark.sql("SELECT user_id, tier FROM enriched").collect()
    }
    expected = {
        (r["user_id"], r["tier"])
        for r in batch_df.join(dim, "user_id", "left").collect()
    }
    assert got == expected
    assert (0, "bronze") in got and (2, None) in got


def test_stream_stream_interval_join(spark, tmpdir):
    base = dt.datetime(2024, 1, 1)
    clicks = [(base + dt.timedelta(minutes=m), "click", 1, float(m)) for m in (0, 10, 120)]
    buys = [
        (base + dt.timedelta(minutes=m), "purchase", 1, float(m)) for m in (5, 200)
    ]
    csrc, bsrc = os.path.join(tmpdir, "clicks"), os.path.join(tmpdir, "buys")
    _events(spark, csrc, clicks)
    _events(spark, bsrc, buys)

    cs = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(csrc)
        .selectExpr("ts AS click_ts", "user_id", "value AS click_val")
    )
    bs = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(bsrc)
        .selectExpr("ts AS buy_ts", "user_id", "value AS buy_val")
    )
    out = stream_stream_interval_join(
        cs, bs, key="user_id", left_ts="click_ts", right_ts="buy_ts",
        max_delay="30 minutes", watermark="4 hours",
    )
    _run_to_memory(out, "attributed")

    got = {
        (r["click_val"], r["buy_val"])
        for r in spark.sql("SELECT click_val, buy_val FROM attributed").collect()
    }
    # purchase@5min joins clicks at 0 and... click@10 is AFTER the buy → no;
    # click@0 only. purchase@200 is >30min after click@120 → no match.
    assert got == {(0.0, 5.0)}


def test_streaming_dedup_exact(spark, tmpdir):
    base = dt.datetime(2024, 1, 1)
    # duplicate (user_id, value) pairs across the input
    rows = [
        (base + dt.timedelta(minutes=m), "click", m % 2, float(m % 3)) for m in range(12)
    ]
    src = os.path.join(tmpdir, "ev")
    batch_df = _events(spark, src, rows)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = dedup_stream(stream, ["user_id", "value"])
    _run_to_memory(out, "dedup_exact_stream")

    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_exact_stream").first()["n"]
    expected = batch_df.dropDuplicates(["user_id", "value"]).count()
    assert n == expected == 6


def test_streaming_dedup_within_watermark(spark, tmpdir):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base, "click", 1, 1.0),
        (base + dt.timedelta(minutes=5), "click", 1, 1.0),  # dup within horizon
        (base + dt.timedelta(minutes=9), "click", 2, 2.0),
    ]
    src = os.path.join(tmpdir, "ev")
    _events(spark, src, rows)

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = dedup_stream_within_watermark(
        stream, ["user_id", "value"], ts_col="ts", watermark="1 hour"
    )
    _run_to_memory(out, "dedup_wm_stream")
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_wm_stream").first()["n"]
    assert n == 2


def test_foreach_batch_sink_idempotent_layout(spark, tmpdir):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=m), "click", m, float(m)) for m in range(10)]
    src = os.path.join(tmpdir, "ev")
    _events(spark, src, rows)
    out_dir = os.path.join(tmpdir, "out")
    ckpt = os.path.join(tmpdir, "ckpt")

    def write_batch(batch_df, batch_id: int):
        # idempotent: replaying a batch_id overwrites its own partition
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = start_foreach_batch_sink(stream, write_batch, checkpoint_dir=ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    assert got.count() == 10
    assert "batch_id" in got.columns


def test_stream_stream_left_outer_emits_unmatched(spark, tmpdir):
    """Outer stream-stream join: clicks with NO purchase in the
    interval must still emit (NULL right side) once the watermark
    passes their join horizon — the state-eviction contract. A far-
    future sentinel on both streams advances the watermark so the
    finite test input flushes its outer results."""
    base = dt.datetime(2024, 1, 1)
    clicks = [
        (base + dt.timedelta(minutes=m), "click", 1, float(m)) for m in (0, 10)
    ] + [(base + dt.timedelta(days=30), "click", 9, 999.0)]  # sentinel
    buys = [(base + dt.timedelta(minutes=5), "purchase", 1, 5.0)] + [
        (base + dt.timedelta(days=30), "purchase", 9, 999.0)  # sentinel
    ]
    csrc, bsrc = os.path.join(tmpdir, "clicks_lo"), os.path.join(tmpdir, "buys_lo")
    _events(spark, csrc, clicks)
    _events(spark, bsrc, buys)

    cs = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(csrc)
        .selectExpr("ts AS click_ts", "user_id", "value AS click_val")
    )
    bs = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(bsrc)
        .selectExpr("ts AS buy_ts", "user_id", "value AS buy_val")
    )
    out = stream_stream_interval_join(
        cs, bs, key="user_id", left_ts="click_ts", right_ts="buy_ts",
        max_delay="30 minutes", watermark="1 hour", how="left_outer",
    )
    _run_to_memory(out, "attributed_lo")

    got = {
        (r["click_val"], r["buy_val"])
        for r in spark.sql(
            "SELECT click_val, buy_val FROM attributed_lo WHERE user_id = 1"
        ).collect()
    }
    # click@0 matches buy@5; click@10 has no purchase within 30min and
    # must emit as (10.0, None) after the sentinel advances the watermark
    assert got == {(0.0, 5.0), (10.0, None)}
