from etl_hero_spark.streaming.windows import (
    daily_from_hourly,
    hourly_rollup,
    json_props_agg,
    session_agg_native,
    sessionize_batch,
    sliding_agg,
    stream_dedup,
    stream_session_agg,
    stream_tumbling_agg,
    tumbling_agg,
    windowed_quality_metrics,
)

__all__ = [
    "hourly_rollup",
    "daily_from_hourly",
    "tumbling_agg",
    "sliding_agg",
    "sessionize_batch",
    "session_agg_native",
    "json_props_agg",
    "windowed_quality_metrics",
    "stream_tumbling_agg",
    "stream_dedup",
    "stream_session_agg",
]
