"""User-defined function surface: vectorized pandas UDF, grouped
applyInPandas (UDAF-shaped), and a Python UDTF.

The reference exposes no extension surface at all (SURVEY.md §2d);
this module IS the engine's extension contract, demonstrating the
three shapes users plug custom logic into — always Arrow-batched,
never row-at-a-time Python:

- scalar pandas UDF: batch-columnar compute (numpy under the hood)
- applyInPandas: per-group pandas frames (grouped-map "UDAF")
- UDTF: one row in → many rows out with schema

Rule of thumb baked into the docstrings: if pyspark.sql.functions can
express it, use that instead (JVM codegen beats Arrow transfer); UDFs
are for logic Catalyst genuinely can't express (models, custom
numerics, external libraries).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


# DataType objects (not DDL strings): string return types are parsed
# eagerly and need an active SparkSession at import time
@pandas_udf(T.DoubleType())
def vector_norm_udf(vecs: pd.Series) -> pd.Series:
    """L2 norm of an array<float> column, one Arrow batch at a time.

    (Spark's own `aggregate`/`sqrt` expressions do this JVM-side —
    functions/similarity.py — this UDF exists as the canonical
    vectorized-UDF example and for logic numpy has but Catalyst
    lacks.)"""
    def norm(v):
        if v is None:
            return None
        # float64 accumulation: keeps the result oracle-comparable
        # (float32 dot products drift ~1e-7, past round-6 tolerance)
        v64 = np.asarray(v, dtype=np.float64)
        return float(np.sqrt(np.dot(v64, v64)))

    return vecs.map(norm)


def zscore_by_group(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-group elementwise z-score normalization of embeddings via
    applyInPandas: each group becomes one pandas frame (grouped-map
    UDAF shape). Groups must fit a worker's memory — true for
    per-label/per-shard normalization; for unbounded groups use a
    two-pass mean/std join instead."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(group_col, T.IntegerType()),
            T.StructField("zscored", T.ArrayType(T.DoubleType())),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        # float64 up front: float32 mean/std accumulation error (~1e-7
        # relative) would exceed the round-4 oracle tolerance downstream
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        mean = mat.mean(axis=0)
        std = mat.std(axis=0)
        std[std == 0] = 1.0
        z = (mat - mean) / std
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "zscored": list(z),
            }
        )

    return df.select(id_col, group_col, vec_col).groupBy(group_col).applyInPandas(
        normalize, out_schema
    )


@udtf(
    returnType=T.StructType(
        [
            T.StructField("sentence", T.StringType()),
            T.StructField("idx", T.IntegerType()),
            T.StructField("n_words", T.IntegerType()),
        ]
    )
)
class SplitSentences:
    """UDTF: text → one row per sentence with position and word count.

    Lateral-join shape: ``SELECT s.* FROM docs, LATERAL
    split_sentences(text) s`` (register via
    spark.udtf.register("split_sentences", SplitSentences))."""

    def eval(self, text: str):
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text) if p.strip()]
        for i, p in enumerate(parts):
            yield p, i, len(p.split())
