"""Custom Python DataSource (Spark 4 DataSource API) — a
deterministic synthetic-corpus generator with real partition
parallelism and filter pushdown.

Why this exists: at 100 TB you frequently need a *generator* source —
load testing, schema rehearsal, synthetic pre-training mixes — and
the Spark-4 Python DataSource API is the idiomatic way to plug one in
(`spark.read.format("synthetic_corpus")`), instead of
`spark.range().withColumn(...)` chains or driver-side createDataFrame
(which materializes on one machine). The design mirrors what a real
connector must do:

- **partitions()** splits the id space into ``numPartitions`` ranges —
  each executor generates ITS slice independently; nothing flows
  through the driver.
- **pushFilters()** absorbs ``doc_id`` comparison predicates and
  shrinks the generated range BEFORE generation (the analog of
  predicate pushdown into a scan): `WHERE doc_id < 1000` generates
  1000 rows, not all rows then a filter. Unsupported filters are
  returned to Spark to evaluate post-scan, per the API contract.
- Rows are a pure function of doc_id (same closed-form trick as
  multimodal.make_fake_media), so output is deterministic across
  runs, partitionings, and retries — a task retry regenerates
  identical rows, which is what makes a generator source safe under
  speculative execution.

Usage:
    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("numRows", 10_000)
          .option("numPartitions", 8)
          .load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "doc_id bigint, text string, lang string, source string, n_tokens int"

_LANGS = ["en", "es", "fr", "de", "zh"]
_WORDS = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark dup filter shuffle broadcast skew"
).split()


def _row(i: int) -> tuple[int, str, str, str, int]:
    n_tokens = 8 + (i * 13) % 25
    words = [_WORDS[(i * 31 + 7 * k) % len(_WORDS)] for k in range(n_tokens)]
    return (
        i,
        " ".join(words),
        _LANGS[i % len(_LANGS)],
        f"src{i % 20}",
        n_tokens,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.num_rows = int(options.get("numRows", 1000))
        self.num_partitions = int(options.get("numPartitions", 4))
        # pushed doc_id bounds: generation range [lo, hi)
        self.lo = 0
        self.hi = self.num_rows

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb doc_id range predicates into the generation bounds;
        yield back everything else for Spark to apply post-scan."""
        for f in filters:
            col = f.attribute[0] if isinstance(f.attribute, tuple) else f.attribute
            if col != "doc_id" or not isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) or not isinstance(f.value, int):
                yield f  # unsupported → Spark evaluates it after read
                continue
            v = f.value
            if isinstance(f, EqualTo):
                self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, v)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, v)
            else:  # LessThanOrEqual
                self.hi = min(self.hi, v + 1)

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.num_partitions)
        span = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + span, hi)))
            s += span
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)
