"""Property test for the edit-distance verification tier: Spark's
JVM-side ``F.levenshtein`` must agree with the textbook
Wagner–Fischer DP on arbitrary short strings. The catalog row
``dedup_edit_distance_pairs`` rests on Spark and DuckDB implementing
the SAME definition — this pins the Spark side to an independent
reference implementation so a drift in either engine is caught at
the unit level, not as an opaque sweep hash-mismatch.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def _wagner_fischer(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


_short = st.text(
    alphabet=st.characters(codec="ascii", categories=("L", "N", "P", "Zs")),
    max_size=24,
)


class TestLevenshteinParity:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(_short, _short), min_size=1, max_size=8))
    def test_spark_matches_reference_dp(self, spark, pairs):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
        )
        got = {
            r["i"]: r["d"]
            for r in df.select("i", F.levenshtein("a", "b").alias("d")).collect()
        }
        for i, (a, b) in enumerate(pairs):
            assert got[i] == _wagner_fischer(a, b), (a, b)

    @settings(max_examples=60, deadline=None)
    @given(st.tuples(_short, _short))
    def test_duckdb_matches_reference_dp(self, pair):
        import duckdb

        a, b = pair
        got = duckdb.execute(
            "SELECT levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert got == _wagner_fischer(a, b), (a, b)
