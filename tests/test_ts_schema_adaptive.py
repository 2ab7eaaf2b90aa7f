"""The engine's event-time convention must survive the testdata's
physical timestamp type changing under it (it has shipped as both
TIMESTAMP(NANOS)-read-as-bigint and timestamp[us]): the same events,
written once at nanosecond and once at microsecond parquet precision,
must produce byte-identical query results through the schema-adaptive
``ts_micros`` path."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mapreducewordoccurences_spark.queries import QUERIES
from mapreducewordoccurences_spark.sources.readers import load_table, ts_micros

BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in epoch-micros


def _write_events(dirpath: str, unit: str) -> None:
    """Write an events.parquet with ts at the given timestamp unit.

    ``ns`` produces parquet TIMESTAMP(NANOS), which Spark 4 reads as
    bigint epoch-nanos under nanosAsLong (the legacy testdata shape);
    ``us`` produces timestamp[us] → Spark timestamp_ntz (the current
    shape).
    """
    n = 200
    ts_us = [BASE_US + (i % 7) * 1_900_000_000 + i * 13_000_000 for i in range(n)]
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")).cast(pa.timestamp(unit)),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                ["purchase" if i % 3 == 0 else "signup" for i in range(n)]
            ),
            "value": pa.array([float(i % 11) for i in range(n)], pa.float64()),
            "props": pa.array(['{"k": %d}' % (i % 4) for i in range(n)]),
        }
    )
    pq.write_table(
        table,
        os.path.join(dirpath, "events.parquet"),
        coerce_timestamps=None if unit == "ns" else unit,
        store_schema=False,
    )


@pytest.fixture(scope="module")
def dual_dirs():
    root = tempfile.mkdtemp(prefix="ts_adaptive_")
    ns_dir = os.path.join(root, "ns")
    us_dir = os.path.join(root, "us")
    os.makedirs(ns_dir)
    os.makedirs(us_dir)
    _write_events(ns_dir, "ns")
    _write_events(us_dir, "us")
    yield ns_dir, us_dir
    shutil.rmtree(root, ignore_errors=True)


def test_fixture_types_actually_differ(spark, dual_dirs):
    ns_dir, us_dir = dual_dirs
    ns_t = dict(load_table(spark, ns_dir, "events").dtypes)["ts"]
    us_t = dict(load_table(spark, us_dir, "events").dtypes)["ts"]
    assert ns_t == "bigint", ns_t  # nanosAsLong legacy path
    assert us_t.startswith("timestamp"), us_t


def test_ts_micros_identical_across_units(spark, dual_dirs):
    ns_dir, us_dir = dual_dirs
    out = []
    for d in dual_dirs:
        ev = load_table(spark, d, "events")
        out.append(
            sorted(
                (r["event_id"], r["us"])
                for r in ev.select(
                    "event_id", ts_micros(ev, "ts").alias("us")
                ).collect()
            )
        )
    assert out[0] == out[1]
    assert out[0][0][1] == BASE_US


@pytest.mark.parametrize(
    "qname",
    ["sessionize_events", "asof_join_purchase_signup", "range_frame_hourly_spend"],
)
def test_event_time_queries_identical_across_units(spark, dual_dirs, qname):
    ns_dir, us_dir = dual_dirs
    fn = QUERIES[qname]
    ns_rows = sorted(map(tuple, fn(spark, ns_dir).collect()))
    us_rows = sorted(map(tuple, fn(spark, us_dir).collect()))
    assert ns_rows == us_rows
    assert len(ns_rows) > 0


def test_resample_identical_across_units(spark, dual_dirs):
    from mapreducewordoccurences_spark.operators.timeseries import (
        resample_with_gap_fill,
    )

    outs = []
    for d in dual_dirs:
        ev = load_table(spark, d, "events")
        outs.append(sorted(map(tuple, resample_with_gap_fill(ev).collect())))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0
