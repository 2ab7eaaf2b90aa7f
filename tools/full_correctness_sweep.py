"""Full-catalog correctness sweep → committed round artifact.

Mirrors the driver's correctness gate over the ENTIRE catalog (the
driver's fixed set checks 50 names; pytest checks all of them but
leaves no artifact): run every ``QUERIES[name]`` at sf0.01 alongside
its DuckDB ``ORACLES[name]``, compare row count, column-name schema,
column TYPE CLASS, and order-insensitive exact values, and write one
JSON object per query to ``CORRECTNESS_full_r{N}.json``.

The type-class check is the strict guard the r7 driver fail
(``order_fulfillment_lag_stats``: Spark ``percentile_disc`` DOUBLE vs
oracle ``quantile_disc`` BIGINT — numerically equal, hash-different)
proved necessary: pandas ``==`` coerces dtypes, the driver's value
hash does not.  We therefore compare ENGINE-level types (Spark
``df.dtypes`` vs the DuckDB relation's ``types``), normalized to
coarse classes (all int widths equal; float vs int is a FAIL;
decimal, bool, str, date, timestamp, nested each their own class).

Usage:
    python tools/full_correctness_sweep.py [round_number] [out_path]

Defaults: round from $SPARK_GRAFT_ROUND or "5"; sf dir from
$SPARK_GRAFT_TEST_SF_DIR or /root/testdata/sf0.01.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


_INT_TYPES = {
    "TINYINT", "SMALLINT", "INT", "INTEGER", "BIGINT", "HUGEINT",
    "LONG", "SHORT", "BYTE", "UTINYINT", "USMALLINT", "UINTEGER",
    "UBIGINT",
}


def type_class(type_str: str) -> str:
    """Coarse, engine-neutral class for a Spark or DuckDB type string.

    Int widths are interchangeable (the driver normalizes those), but
    float vs int, decimal vs double, etc. are distinct — matching the
    driver's type-sensitive value hash.
    """
    t = str(type_str).strip().upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]") or t.startswith(("ARRAY", "LIST", "STRUCT", "MAP", "ROW")):
        return "nested"
    if t in _INT_TYPES:
        return "int"
    if t in {"FLOAT", "REAL", "DOUBLE"}:
        return "float"
    if t in {"BOOLEAN", "BOOL"}:
        return "bool"
    if t in {"VARCHAR", "STRING", "TEXT", "CHAR"}:
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t in {"BINARY", "BLOB", "VARBINARY", "BYTEA"}:
        return "binary"
    return t


def dtype_mismatches(
    spark_dtypes: list[tuple[str, str]],
    oracle_cols: list[str],
    oracle_types: list,
) -> list[str]:
    """Columns (matched by name) whose engine type classes differ."""
    s_map = {c: type_class(t) for c, t in spark_dtypes}
    o_map = {c: type_class(t) for c, t in zip(oracle_cols, oracle_types)}
    return sorted(
        f"{c}: spark={s_map[c]} oracle={o_map[c]}"
        for c in s_map.keys() & o_map.keys()
        if s_map[c] != o_map[c]
    )


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("Int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def values_match(s: pd.DataFrame, d: pd.DataFrame) -> bool:
    s, d = normalize(s), normalize(d)
    for col in s.columns:
        sv, dv = s[col], d[col]
        eq = (sv == dv) | (sv.isna() & dv.isna())
        if not eq.all():
            return False
    return True


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_ROUND", "5")
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else f"CORRECTNESS_full_r{int(rnd):02d}.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

    from mapreducewordoccurences_spark.queries import ORACLES, QUERIES
    from mapreducewordoccurences_spark.session import get_spark

    spark = get_spark("full-sweep", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    results: dict[str, dict] = {}
    n_green = n_rows_only = n_fail = 0
    for name in sorted(QUERIES):
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = QUERIES[name](spark, sf_dir)
            spark_dtypes = sdf.dtypes
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
            if name in ORACLES:
                rel = con.sql(ORACLES[name])
                oracle_cols, oracle_types = list(rel.columns), list(rel.types)
                ddf = rel.df()
                rec["oracle_rows"] = len(ddf)
                rec["rows_match"] = len(spdf) == len(ddf)
                bad_types = dtype_mismatches(spark_dtypes, oracle_cols, oracle_types)
                if bad_types:
                    rec["dtype_mismatches"] = bad_types
                rec["schema_match"] = (
                    sorted(spdf.columns) == sorted(ddf.columns) and not bad_types
                )
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and values_match(spdf, ddf)
                )
                if rec["hash_match"]:
                    n_green += 1
                else:
                    n_fail += 1
            else:
                rec["err"] = "no_oracle"
                n_rows_only += 1
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            n_fail += 1
        results[name] = rec
        status = (
            "green" if rec["hash_match"]
            else ("rows_only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name}: {status}", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(QUERIES),
        "n_oracles": len(ORACLES),
        "n_green": n_green,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
