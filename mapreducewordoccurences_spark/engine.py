"""User-facing engine facade.

The reference's entire user surface is one CLI (``mapred_woc <file>
<threads>``). This engine keeps that CLI (cli.py) and adds the two
surfaces a Spark-native engine owes its users:

- ``Engine.sql(...)``: full Spark SQL over the registered tables
  (every catalog query in queries.py is equally expressible here).
- ``Engine.table(...)`` + the operator/function modules: programmatic
  DataFrame composition.

At 100 TB the Engine is constructed once per application; tables
register as temp views over parquet directories, so Catalyst sees
the file-source relations directly (pushdown/pruning intact —
registration itself reads nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreducewordoccurences_spark.session import get_spark
from mapreducewordoccurences_spark.sources.readers import TABLES, load_table


class Engine:
    """One stop for session + tables + SQL + the query catalog."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        data_dir: str | None = None,
        register: bool = True,
        **session_kwargs,
    ):
        self.spark = spark or get_spark(**session_kwargs)
        self.data_dir = data_dir
        if data_dir and register:
            self.register_tables(data_dir)

    def register_tables(self, data_dir: str, tables: list[str] | None = None) -> None:
        """Register each parquet table as a temp view named after it."""
        for name in tables or TABLES:
            load_table(self.spark, data_dir, name).createOrReplaceTempView(name)

    def table(self, name: str) -> DataFrame:
        if self.data_dir:
            return load_table(self.spark, self.data_dir, name)
        return self.spark.table(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def query(self, name: str) -> DataFrame:
        """Run a named catalog query (queries.py) against data_dir."""
        from mapreducewordoccurences_spark.queries import QUERIES

        if self.data_dir is None:
            raise ValueError("Engine(data_dir=...) required for catalog queries")
        return QUERIES[name](self.spark, self.data_dir)

    def word_counts(self, path: str) -> DataFrame:
        """The reference's query, as the engine API (file → counts)."""
        from mapreducewordoccurences_spark.core import count_words_in_file

        return count_words_in_file(self.spark, path)

    @property
    def catalog(self) -> list[str]:
        from mapreducewordoccurences_spark.queries import QUERIES

        return sorted(QUERIES)


def observed(df, name: str, **metrics):
    """Attach zero-cost pipeline metrics to a DataFrame: the given
    aggregate expressions are computed DURING the next action on the
    same pass (no extra scan, no second job) and surface via the
    returned Observation once the action completes.

        obs, out = observed(df, "gate", n=F.count(F.lit(1)),
                            nulls=F.sum(F.col("k").isNull().cast("int")))
        out.write.parquet(...)
        obs.get  # {'n': ..., 'nulls': ...}

    This is the monitoring half of a production pipeline: row counts,
    null rates, and domain counters recorded on every write without
    re-reading 100 TB. (For streaming, the same metrics flow through
    StreamingQueryListener events instead.)"""
    from pyspark.sql import Observation

    obs = Observation(name)
    return obs, df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
