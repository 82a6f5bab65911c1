"""Structured Streaming in the correctness gate (SURVEY.md §2.4 S2/S9).

The standing-query path — file-source stream -> watermark -> tumbling
window aggregation -> append-mode emission — driven to completion with
``Trigger.AvailableNow`` so a batch driver can call it like any other
query. The emission rule is deterministic here (the source is staged as
ONE file, so there is a single data micro-batch and the final watermark
is ``max(ts) - delay``), which makes the result fully SQL-expressible:
append mode emits exactly the windows whose end <= final watermark. The
oracle reproduces that rule, so the gate hash-checks *streaming* output —
including which late windows were withheld — not just a batch lookalike.

On a cluster the source line becomes Kafka and the trigger becomes
processingTime; nothing else changes (batch/stream unification is the
point of the ingest design, streaming/ingest.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.plans._exact import r4
from rearview_spark.sources.loader import Tables
from rearview_spark.streaming.ingest import events_stream, to_metrics
from rearview_spark.streaming.standing import standing_window_agg

WATERMARK = "10 minutes"


def stream_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage events as a single-file stream source, run the standing
    hourly aggregation with a 10-minute watermark to completion
    (availableNow), and return the append-mode emissions from the memory
    sink. The last (still-open) window stays in state and is NOT emitted
    — the oracle asserts that too."""
    events = Tables(spark, sf_dir).events
    src = tempfile.mkdtemp(prefix="rv_stream_src_")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    stream = to_metrics(
        events_stream(spark, src, max_files_per_trigger=1_000_000), WATERMARK
    )
    agg = standing_window_agg(stream, "1 hour", fns=("sum", "count"))
    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "metric",
        F.col("window_start").alias("ts"),
        r4(F.col("sum_value")).alias("sum_value"),
        "n_points",
    )


STREAM_HOURLY_SQL = """
WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
hourly AS (
  SELECT event_type AS metric, date_trunc('hour', ts) AS ts,
         sum(value) AS sv, count(value) AS n
  FROM events GROUP BY 1, 2
)
SELECT metric, ts, round(sv + 0.00000005, 4) AS sum_value, n AS n_points
FROM hourly, wm WHERE ts + INTERVAL 1 HOUR <= wm.w
"""


QUERIES: dict[str, dict] = {
    "stream_hourly_stats": {"fn": stream_hourly_stats, "oracle": STREAM_HOURLY_SQL},
}
