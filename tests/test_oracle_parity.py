"""Mirror of the driver's correctness gate: run every catalog query on
Spark and its DuckDB oracle side-by-side, compare row count, column
names, and values (order-insensitive, exact).

Runs at sf0.001 for speed; the driver repeats this at sf0.01.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from mapreducewordoccurences_spark.queries import ORACLES, QUERIES

from tests.conftest import SF_DIR


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        # unify integer flavors (duckdb int32 vs spark int64 etc.)
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("Int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def assert_frames_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        if pd.api.types.is_float_dtype(sv):
            both_nan = sv.isna() & dv.isna()
            close = (sv == dv) | both_nan
            if not close.all():
                bad = (~close).idxmax()
                raise AssertionError(
                    f"{name}.{col}: value mismatch at row {bad}: "
                    f"{sv[bad]!r} != {dv[bad]!r}"
                )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}.{col}: value mismatch at row {bad}: "
                    f"{sv[bad]!r} != {dv[bad]!r}"
                )


ORACLE_QUERIES = sorted(ORACLES)
ROWS_ONLY_QUERIES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(ORACLES[name]).df()
    assert_frames_match(name, spark_pdf, duck_pdf)


def test_every_query_is_oracle_gated():
    """Positive assertion of the fully-oracle-gated state reached in
    round 6: no catalog entry may ship without a DuckDB oracle. A
    regression here means a new query was registered rows-only."""
    assert not ROWS_ONLY_QUERIES
