from mapreducewordoccurences_spark.streaming.wordcount_stream import (
    streaming_word_counts,
    read_text_stream,
)
from mapreducewordoccurences_spark.streaming.windows import (
    tumbling_event_counts,
    sliding_event_counts,
    session_event_counts,
)
from mapreducewordoccurences_spark.streaming.joins import (
    enrich_stream_with_dim,
    stream_stream_interval_join,
)
from mapreducewordoccurences_spark.streaming.dedup import (
    dedup_stream,
    dedup_stream_within_watermark,
)

__all__ = [
    "streaming_word_counts",
    "read_text_stream",
    "tumbling_event_counts",
    "sliding_event_counts",
    "session_event_counts",
    "enrich_stream_with_dim",
    "stream_stream_interval_join",
    "dedup_stream",
    "dedup_stream_within_watermark",
]
