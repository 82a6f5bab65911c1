from rearview_spark.streaming.ingest import events_stream, ingest_to_metrics
from rearview_spark.streaming.standing import standing_window_agg, streaming_threshold_alerts

__all__ = [
    "events_stream",
    "ingest_to_metrics",
    "standing_window_agg",
    "streaming_threshold_alerts",
]
