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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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


def register_kvtext(spark) -> None:
    spark.dataSource.register(KvTextDataSource)
