"""PySpark-native analytics engine with the query surface of
msellitto/MapReduceWordOccurences, generalized to a full relational +
text-pipeline engine designed for 100 TB scale.

The reference (C99 + pthreads, /root/reference) implements a single
hardcoded query: case-sensitive ``[A-Za-z0-9]+`` word-occurrence
counting, sorted by word (see SURVEY.md). This package re-expresses
that surface Spark-first (DataFrame/Catalyst), then extends it with
the relational operators, dedup/similarity/text-analysis pipeline
operators, and streaming surface a large-scale training-data pipeline
needs.

Layout:
  core/       wordcount parity core (reference semantics, SURVEY §2a)
  operators/  relational operators (joins incl. as-of, aggs, windows, set ops)
  sources/    readers & sinks (parquet/csv/json/text; kv-line sink)
  functions/  scalar/text/similarity function surface
  dedup/      exact + MinHash-LSH + SimHash + n-gram-Jaccard dedup
  multimodal/ binary-column (image/audio) plumbing with stubbed decoders
  streaming/  Structured Streaming wordcount + windowed aggregations
  plans/      plan inspection helpers (explain/shuffle audit)
"""

__version__ = "0.1.0"
