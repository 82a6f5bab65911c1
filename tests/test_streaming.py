"""Streaming ingest + standing-query tests: file-source micro-batches
driven to completion with availableNow (the container-supported source;
the transforms are source-agnostic)."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from rearview_spark.monitors.notify import AlertRouter, CollectingNotifier
from rearview_spark.streaming.ingest import events_stream, ingest_to_metrics, to_metrics
from rearview_spark.streaming.standing import standing_window_agg, streaming_threshold_alerts

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Two event files incl. out-of-order timestamps (watermark path)."""
    rows1 = [
        (1, T0 + dt.timedelta(minutes=1), 10, "click", 100.0, "{}"),
        (2, T0 + dt.timedelta(minutes=2), 11, "click", 200.0, "{}"),
        (3, T0 + dt.timedelta(minutes=7), 12, "error", 5.0, "{}"),
    ]
    rows2 = [
        # late event: minute 3 arrives in the second file
        (4, T0 + dt.timedelta(minutes=3), 13, "click", 300.0, "{}"),
        (5, T0 + dt.timedelta(minutes=8), 14, "error", 7.0, "{}"),
    ]
    src = tmp_path / "events_src"
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(str(src))
    yield str(src)
    shutil.rmtree(src, ignore_errors=True)


def test_ingest_to_metrics(spark, events_dir, tmp_path):
    out = tmp_path / "metrics"
    ckpt = tmp_path / "ckpt"
    q = ingest_to_metrics(spark, events_dir, str(out), str(ckpt))
    q.awaitTermination(120)
    df = spark.read.parquet(str(out))
    assert df.count() == 5
    assert set(df.columns) == {"metric", "ts", "value", "dt"}
    # date-partitioned layout (pruning at the batch read path)
    assert (out / "dt=2024-01-01").exists()
    # late row (event 4) was ingested — append mode file sink keeps it
    got = {r["value"] for r in df.filter(F.col("metric") == "click").collect()}
    assert got == {100.0, 200.0, 300.0}
    # restart with same checkpoint: no duplicates (exactly-once per file)
    q2 = ingest_to_metrics(spark, events_dir, str(out), str(ckpt))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 5


def test_standing_window_agg(spark, events_dir, tmp_path):
    metrics = to_metrics(events_stream(spark, events_dir), watermark="10 minutes")
    agg = standing_window_agg(metrics, window="5 minutes", fns=("avg", "count"))
    # update mode: emits window aggregates as they evolve (append would
    # wait for the watermark to pass the window end, which a finite file
    # stream never reaches)
    q = (
        agg.writeStream.outputMode("update")
        .format("memory").queryName("standing_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {
        (r["metric"], r["window_start"]): r
        for r in spark.sql("SELECT * FROM standing_out").collect()
    }
    click = rows[("click", T0)]
    assert click["n_points"] == 3 and click["avg_value"] == pytest.approx(200.0)
    err = rows[("error", T0 + dt.timedelta(minutes=5))]
    assert err["n_points"] == 2 and err["avg_value"] == pytest.approx(6.0)


def test_streaming_threshold_alerts(spark, events_dir, tmp_path):
    collector = CollectingNotifier()
    router = AlertRouter(default=collector)
    metrics = to_metrics(events_stream(spark, events_dir), watermark="10 minutes")
    q = streaming_threshold_alerts(
        metrics, router, job_id=7, alert_keys=["email:ops@example.com"],
        threshold=50.0, window="5 minutes",
        checkpoint_dir=str(tmp_path / "ckpt3"), queryName="alerts_test",
    )
    q.awaitTermination(120)
    # click window mean=200 breaches; error windows (5, 7) do not
    assert len(collector.sent) == 1
    alert = collector.sent[0]
    assert alert.job_id == 7 and "click" in alert.message and alert.key == "email:ops@example.com"
