from mapreducewordoccurences_spark.core.wordcount import (
    WORD_REGEX,
    SEPARATOR_REGEX,
    tokenize,
    count_words,
    count_words_in_file,
    format_kv_lines,
)

__all__ = [
    "WORD_REGEX",
    "SEPARATOR_REGEX",
    "tokenize",
    "count_words",
    "count_words_in_file",
    "format_kv_lines",
]
