"""Streaming wordcount — the reference's one query over an unbounded
source (new capability; the reference is batch-only, SURVEY.md §2d).

The tokenize+count logic is the SAME DataFrame expression as the
batch core (core/wordcount.py) applied to a streaming DataFrame:
Structured Streaming runs it with incremental state — counts update
per micro-batch, the shuffle carries per-batch partial aggregates,
and state lives in the state store keyed by word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreducewordoccurences_spark.core.wordcount import count_words


def read_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-arrival text stream: each new file in ``path`` becomes
    micro-batch input (DataFrame[value: string])."""
    return spark.readStream.text(path)


def streaming_word_counts(stream_df: DataFrame, text_col: str = "value") -> DataFrame:
    """Running word counts over an unbounded text stream.

    Output mode must be ``update`` or ``complete`` (aggregation without
    watermark retains all word state — the distinct-word set, small).
    """
    return count_words(stream_df, text_col=text_col, sort=False)
