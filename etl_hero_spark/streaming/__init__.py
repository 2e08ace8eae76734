from etl_hero_spark.streaming.windows import (
    json_props_agg,
    sessionize_batch,
    sliding_agg,
    stream_tumbling_agg,
    tumbling_agg,
    windowed_quality_metrics,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "sessionize_batch",
    "json_props_agg",
    "windowed_quality_metrics",
    "stream_tumbling_agg",
]
