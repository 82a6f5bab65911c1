"""End-to-end monitoring engine demo — the reference's core loop on this
engine, driven against the driver's events table:

  events ─ hourly series ─ two monitors (threshold + robust_z expression)
         ─ scheduler tick (cron due-selection, sandboxed evaluation,
           status lifecycle, outbox) ─ alert delivery to a live local
           webhook ─ plus the batch analytics a dashboard renders:
           MAD anomalies, CUSUM drift, LTTB decimation.

Usage:  python examples/monitoring_demo.py [sf_dir]     (default sf0.01)
"""

from __future__ import annotations

import datetime as dt
import http.server
import json
import sys
import threading

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.monitors.schemas import MONITORS
from rearview_spark.monitors.notify import AlertRouter, CollectingNotifier, WebhookNotifier
from rearview_spark.monitors.scheduler import MonitorScheduler
from rearview_spark.monitors.store import JobStore
from rearview_spark.operators.anomaly import cusum_drift, mad_anomalies
from rearview_spark.operators.timeseries import lttb_downsample
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables, events_as_timeseries


def _webhook_server():
    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_port, received


def main(sf_dir: str) -> None:
    import tempfile

    spark = get_spark("monitoring_demo")
    series = events_as_timeseries(Tables(spark, sf_dir).events)
    hourly = (
        series.groupBy("metric", F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("value").alias("value"))
        .select("metric", F.col("w.start").alias("ts"), "value")
        .cache()  # reused by the tick and all four analytics below
    )
    now = hourly.agg(F.max("ts")).collect()[0][0] + dt.timedelta(minutes=1)
    names = [r["metric"] for r in hourly.select("metric").distinct().limit(2).collect()]
    print(f"series: {names} … up to {now}")

    # two monitors: a plain threshold and the stock robust-z rule
    rows = [
        (1, "threshold", True, None, None, "* * * * *", "success", 1,
         ["webhook"], None, 60, "sum too high", 1,
         [names[0]], "a.mean() > 1", 240, None, now, now),
        (2, "robust", True, None, None, "* * * * *", "success", 1,
         ["webhook"], None, 60, "robust outlier", 1,
         [names[1]], "robust_z(a).abs().max() > 3.5", 240, None, now, now),
    ]
    srv, port, received = _webhook_server()
    try:
        store = JobStore(spark, tempfile.mkdtemp(prefix="rv_demo_"))
        store.save_monitors(spark.createDataFrame(rows, MONITORS))
        router = AlertRouter(default=CollectingNotifier())
        router.register("webhook", WebhookNotifier(f"http://127.0.0.1:{port}/hook"))
        sched = MonitorScheduler(spark, store, hourly, router)
        summary = sched.tick(now)
        print(f"scheduler tick: {summary}")
        print(f"webhook deliveries: {len(received)}"
              + (f" (first: job {received[0]['job_id']})" if received else ""))

        # the dashboard analytics over the same series
        anomalies = mad_anomalies(hourly).count()
        drifts = cusum_drift(hourly).filter("drift").count()
        decimated = lttb_downsample(hourly, 50).count()
        full = hourly.count()
        print(f"MAD anomalies: {anomalies}  CUSUM drift points: {drifts}")
        print(f"LTTB: {full} -> {decimated} points for rendering")
    finally:
        srv.shutdown()
        srv.server_close()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
