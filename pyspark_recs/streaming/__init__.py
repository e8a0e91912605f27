from pyspark_recs.streaming.ops import (
    read_event_stream,
    streaming_dedup,
    streaming_enrich,
    streaming_hopping_agg,
    streaming_quarantine,
    streaming_session_agg,
    streaming_sessionize,
    streaming_static_anti_join,
    streaming_stream_join,
    streaming_tumbling_agg,
    streaming_user_profile,
    stream_to_kv_sink,
)

__all__ = [
    "read_event_stream",
    "stream_to_kv_sink",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_hopping_agg",
    "streaming_quarantine",
    "streaming_session_agg",
    "streaming_sessionize",
    "streaming_static_anti_join",
    "streaming_stream_join",
    "streaming_tumbling_agg",
    "streaming_user_profile",
]
