from mapreducewordoccurences_spark.sources.readers import TABLES, load_table, read_text, read_csv, read_json, read_parquet
from mapreducewordoccurences_spark.sources.sinks import write_parquet, write_csv_kv, write_json

__all__ = [
    "TABLES",
    "load_table",
    "read_text",
    "read_csv",
    "read_json",
    "read_parquet",
    "write_parquet",
    "write_csv_kv",
    "write_json",
]
