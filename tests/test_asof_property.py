"""Property-based check of the as-of join against pandas merge_asof
(the reference implementation of as-of semantics): random event sets,
both directions, including tie timestamps and unmatched keys."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from mapreducewordoccurences_spark.operators.joins import asof_join

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # ts (small range → ties)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=20, deadline=None)
@given(left=events, right=events, direction=st.sampled_from(["backward", "forward"]))
def test_asof_matches_pandas_merge_asof(spark, left, right, direction):
    left_rows = [(k, t, i) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, 1000 + i) for i, (k, t) in enumerate(right)]
    ldf = spark.createDataFrame(left_rows, "k bigint, t bigint, lid bigint")
    rdf = spark.createDataFrame(right_rows, "k bigint, t bigint, rid bigint")

    got = {
        r["lid"]: r["t_right"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t",
            right_cols=[], direction=direction,
        ).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    # merge_asof resolves equal timestamps per key arbitrarily among
    # right rows; our operator guarantees only the matched TIMESTAMP.
    rpd = (
        pd.DataFrame(right_rows, columns=["k", "t", "rid"])
        .sort_values("t", kind="stable")
    )
    merged = pd.merge_asof(lpd, rpd, on="t", by="k", direction=direction, suffixes=("", "_r"))
    expected = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.t))
        for r in merged.itertuples()
    }
    # compare matched right-timestamp (NaN ⇒ no match) — merge_asof
    # reports the LEFT t; recompute matched right ts via rid lookup
    rid_to_t = {1000 + i: t for i, (k, t) in enumerate(right)}
    expected = {
        int(r.lid): (None if pd.isna(r.rid) else rid_to_t[int(r.rid)])
        for r in merged.itertuples()
    }
    assert got == expected
