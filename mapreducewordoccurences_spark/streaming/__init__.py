from mapreducewordoccurences_spark.streaming.wordcount_stream import (
    streaming_word_counts,
    read_text_stream,
)
from mapreducewordoccurences_spark.streaming.windows import (
    tumbling_event_counts,
    sliding_event_counts,
    session_event_counts,
)

__all__ = [
    "streaming_word_counts",
    "read_text_stream",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_event_counts",
]
