"""Custom Python DataSource (Spark 4 DataSource V2 API) for the
reference's ``key=value`` line format — the other half of the
``write_csv_kv`` sink, so the engine round-trips its own (and the
reference's, `src/main.c:168-174`) output as a first-class table:

    spark.dataSource.register(KvTextDataSource)
    spark.read.format("kvtext").schema("word string, count bigint") \\
         .load("/path/to/kv-dir")

Scale shape: one InputPartition per file (the files were written by a
distributed sink, so file count ≈ upstream partition count — parallel
read with no planning bottleneck), streamed line-by-line per
partition (no whole-file materialization). Values keep everything
after the FIRST '=' (keys are [A-Za-z0-9]+ runs in the reference
contract, but the reader stays tolerant). The declared schema's
second column type drives the value cast.

This is the "custom connector" extension surface: anything with a
listable/partitionable layout (an internal line protocol, an
object-store manifest) plugs into DataFrame planning the same way —
Python-side, Arrow-batched by the runtime, no JVM code required.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class KvFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KvTextReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: 'path' option is required")
        self.schema = schema

    def partitions(self):
        paths = []
        if os.path.isdir(self.path):
            for name in sorted(os.listdir(self.path)):
                if name.startswith(("part-", "kv-")) or name.endswith(".txt"):
                    paths.append(os.path.join(self.path, name))
        else:
            paths = [self.path]
        if not paths:
            raise ValueError(f"kvtext: no input files under {self.path}")
        return [KvFilePartition(p) for p in paths]

    def read(self, partition):
        value_type = self.schema.fields[1].dataType.simpleString()
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, sep, val = line.partition("=")
                if not sep:
                    continue
                if value_type in ("bigint", "int", "long"):
                    try:
                        out = int(val)
                    except ValueError:
                        out = None
                elif value_type == "double":
                    try:
                        out = float(val)
                    except ValueError:
                        out = None
                else:
                    out = val
                yield (key, out)


class KvTextDataSource(DataSource):
    """``spark.read.format("kvtext")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        # default when the caller doesn't supply one
        return "key string, value string"

    def reader(self, schema) -> DataSourceReader:
        return KvTextReader(self.options, schema)

    def simpleStreamReader(self, schema) -> "KvTextStreamReader":
        return KvTextStreamReader(self.options, schema)


def register_kvtext(spark) -> None:
    spark.dataSource.register(KvTextDataSource)


class KvTextStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the kvtext source: tail a directory for new
    kv files; the offset is the sorted list of files already consumed,
    so every file is read exactly once and `readBetweenOffsets` can
    replay a batch deterministically after failure — the connector-
    side half of end-to-end exactly-once (the sink's idempotence is
    the other half). A production variant would swap the listing for
    an object-store manifest; the offset/replay contract is the same.
    """

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext: 'path' option is required")
        self.schema = schema

    def _list(self):
        if not os.path.isdir(self.path):
            return [self.path] if os.path.exists(self.path) else []
        return sorted(
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if n.startswith(("part-", "kv-")) or n.endswith(".txt")
        )

    def initialOffset(self):
        return {"files": []}

    def _read_files(self, paths):
        # materialized list, not a generator: the runtime prefetches
        # and pickles these rows to ship them to the cluster
        reader = KvTextReader({"path": self.path}, self.schema)
        rows = []
        for p in paths:
            rows.extend(reader.read(KvFilePartition(p)))
        return rows

    def read(self, start):
        seen = set(start.get("files", []))
        new = [p for p in self._list() if p not in seen]
        end = {"files": sorted(seen | set(new))}
        return iter(self._read_files(new)), end

    def readBetweenOffsets(self, start, end):
        seen = set(start.get("files", []))
        upto = set(end.get("files", []))
        return iter(self._read_files(sorted(upto - seen)))

    def commit(self, end):
        pass  # offsets carry full state; nothing external to clean up
