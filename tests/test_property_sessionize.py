"""Property-based differential test for sessionization: for ANY set of
(user, timestamp) events, the engine's gaps-and-islands sessionization
must equal a straightforward single-threaded Python reference.

One Spark job per Hypothesis example is slow, so examples are kept few
and each carries many events across several users.
"""

from __future__ import annotations

import collections

from hypothesis import given, settings, strategies as st

GAP_US = 1_800_000_000  # 30 min in micros, matching the catalog query


def reference_sessions(events):
    """events: list of (user_id, ts_us) → {(user, session_id): (n, lo, hi)}
    with session_id numbered 0.. per user in time order (ties broken by
    input order index, mirroring the engine's event_id tiebreak)."""
    per_user = collections.defaultdict(list)
    for idx, (u, ts) in enumerate(events):
        per_user[u].append((ts, idx))
    out = {}
    for u, rows in per_user.items():
        rows.sort()
        sid, prev = 0, None
        bucket = []
        for ts, _ in rows:
            if prev is not None and ts - prev > GAP_US:
                out[(u, sid)] = (len(bucket), min(bucket), max(bucket))
                sid += 1
                bucket = []
            bucket.append(ts)
            prev = ts
        out[(u, sid)] = (len(bucket), min(bucket), max(bucket))
    return out


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # few users → long chains
        st.integers(min_value=0, max_value=20 * GAP_US),  # ts_us
    ),
    min_size=1,
    max_size=120,
)


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_sessionize_matches_python_reference(spark, events):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(events)],
        "event_id bigint, user_id bigint, ts_us bigint",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ordered = df.withColumn(
        "is_new",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > GAP_US, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sessions = ordered.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n"], r["lo"], r["hi"])
        for r in sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts_us").alias("lo"),
            F.max("ts_us").alias("hi"),
        )
        .collect()
    }
    assert got == reference_sessions(events)
