"""Monitor-run queries: the reference's core path (§3.1 — window fetch ->
target evaluation -> status) driven through the driver's `events` table so
the correctness gate exercises the applyInPandas evaluation layer.

Two fixed monitors run against metric='error' (events mapped to the tall
shape): one whose threshold certainly fires and one that certainly holds.
The monitor expression semantics (``a.mean() > k``) are SQL-expressible,
so the oracle reproduces the whole run's observable outcome
(status + message) even though the engine path goes through the restricted
-expression evaluator in a Python worker.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.monitors.evaluate import MonitorSpec, evaluate_monitors
from rearview_spark.sources.loader import Tables, events_as_timeseries

WINDOW_END = dt.datetime(2024, 2, 1)
WINDOW_MINUTES = 60 * 24 * 31  # whole January

SPECS = [
    MonitorSpec(
        id=1, metrics=["error"], monitor_expr="a.mean() > 1", minutes=WINDOW_MINUTES,
        to_date=WINDOW_END, name="error-rate-high", description="error rate high",
    ),
    MonitorSpec(
        id=2, metrics=["error"], monitor_expr="a.mean() > 1000000", minutes=WINDOW_MINUTES,
        to_date=WINDOW_END, name="error-rate-extreme", description="error rate extreme",
    ),
    MonitorSpec(
        id=3, metrics=["no.such.metric"], monitor_expr="a.mean() > 1", minutes=WINDOW_MINUTES,
        to_date=WINDOW_END, name="missing-series", description="missing series",
    ),
]


def monitor_run_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end monitor evaluation: target compile -> window fetch ->
    variable binding -> restricted expression -> status."""
    metrics = events_as_timeseries(Tables(spark, sf_dir).events)
    results = evaluate_monitors(spark, SPECS, metrics, now=WINDOW_END, with_graph=False)
    return results.select("job_id", "scheduled_ts", "status", "message").orderBy("job_id")


MONITOR_RUN_SQL = """
WITH w AS (
  SELECT value FROM events
  WHERE event_type = 'error'
    AND ts >= TIMESTAMP '2024-02-01' - INTERVAL 44640 MINUTE
    AND ts <= TIMESTAMP '2024-02-01'
), m AS (SELECT avg(value) AS mean_v, count(value) AS n FROM w)
SELECT 1 AS job_id, TIMESTAMP '2024-02-01' AS scheduled_ts,
       CASE WHEN n = 0 THEN 'error' WHEN mean_v > 1 THEN 'failed' ELSE 'success' END AS status,
       CASE WHEN n = 0 THEN 'no data in window'
            WHEN mean_v > 1 THEN 'alert: error rate high (a.mean() > 1)' END AS message
FROM m
UNION ALL
SELECT 2, TIMESTAMP '2024-02-01',
       CASE WHEN n = 0 THEN 'error' WHEN mean_v > 1000000 THEN 'failed' ELSE 'success' END,
       CASE WHEN n = 0 THEN 'no data in window'
            WHEN mean_v > 1000000 THEN 'alert: error rate extreme (a.mean() > 1000000)' END
FROM m
UNION ALL
SELECT 3, TIMESTAMP '2024-02-01', 'error', 'no data in window'
"""


def monitor_graph_data_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized job_data graph payload (S8 shape): per-run point
    counts and value checksum, proving the graph_data round-trip."""
    metrics = events_as_timeseries(Tables(spark, sf_dir).events)
    results = evaluate_monitors(spark, SPECS[:2], metrics, now=WINDOW_END)
    exploded = results.select("job_id", F.explode("graph_data").alias("p"))
    return (
        exploded.groupBy("job_id")
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.sum("p.value") + F.lit(5e-8), 4).alias("value_sum"),
            F.min("p.ts").alias("first_ts"),
            F.max("p.ts").alias("last_ts"),
        )
        .orderBy("job_id")
    )


MONITOR_GRAPH_SQL = """
WITH w AS (
  SELECT value, ts FROM events
  WHERE event_type = 'error'
    AND ts >= TIMESTAMP '2024-02-01' - INTERVAL 44640 MINUTE
    AND ts <= TIMESTAMP '2024-02-01'
)
SELECT job_id, count(*) AS n_points,
       round(sum(value) + 0.00000005, 4) AS value_sum,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM w CROSS JOIN (SELECT unnest([1, 2]) AS job_id) j
GROUP BY job_id ORDER BY job_id
"""


QUERIES: dict[str, dict] = {
    "monitor_run_statuses": {"fn": monitor_run_statuses, "oracle": MONITOR_RUN_SQL},
    "monitor_graph_data_points": {"fn": monitor_graph_data_points, "oracle": MONITOR_GRAPH_SQL},
}
