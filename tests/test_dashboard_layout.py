"""Dashboard read layer (R3/R8/R9/R10/R11) + metrics storage layout."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rearview_spark.monitors import dashboard as DB
from rearview_spark.monitors.schemas import APPLICATIONS, JOB_ERRORS, MONITORS, USERS
from rearview_spark.sources.layout import read_metrics_dir, write_metrics_dir

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def apps(spark):
    rows = [
        # two trees: 1 -> (2 -> 4), 3; paths are ancestor id chains
        (1, 1, "root-a", None, "", T0, T0, None),
        (2, 1, "child-a1", None, "1", T0, T0, None),
        (4, 1, "grandchild", None, "1/2", T0, T0, None),
        (3, 2, "root-b", None, "", T0, T0, None),
        (5, 2, "deleted-child", None, "3", T0, T0, T0),
    ]
    return spark.createDataFrame(rows, APPLICATIONS)


def test_app_tree(apps):
    roots = {r["id"] for r in DB.app_roots(apps).collect()}
    assert roots == {1, 3}
    desc = {r["id"] for r in DB.app_descendants(apps, 1, "").collect()}
    assert desc == {2, 4}
    kids = {r["id"] for r in DB.app_children(apps, 1, "").collect()}
    assert kids == {2}
    # soft-deleted children excluded
    assert DB.app_descendants(apps, 3, "").count() == 0


@pytest.fixture(scope="module")
def monitors_df(spark):
    def row(id, app_id, user_id, status, active=True, deleted=None):
        return (
            id, f"m{id}", active, T0, None, "* * * * *", status, user_id,
            [], deleted, 60, None, app_id, ["x"], "a.mean() > 1", 60, None, T0, T0,
        )

    rows = [
        row(10, 1, 1, "success"),
        row(11, 1, 1, "failed"),
        row(12, 2, 2, "error", active=False),
        row(13, 1, 2, "success", deleted=T0),
    ]
    return spark.createDataFrame(rows, MONITORS)


def test_job_listings(monitors_df):
    assert {r["id"] for r in DB.jobs_by_app(monitors_df, 1).collect()} == {10, 11}
    assert {r["id"] for r in DB.jobs_by_user(monitors_df, 2).collect()} == {12}
    assert {r["id"] for r in DB.jobs_by_status(monitors_df, "failed", "error").collect()} == {11, 12}


def test_error_history_and_overview(spark, monitors_df):
    err_rows = [
        (1, 11, T0, T0, "boom", "triggered", T0),
        (2, 11, T0 - dt.timedelta(hours=1), T0, "old", "resolved", None),
        (3, 12, T0, T0, "fetch failed", "triggered", T0),
    ]
    errors = spark.createDataFrame(err_rows, JOB_ERRORS)
    hist = DB.error_history(errors, 11, limit=1).collect()
    assert len(hist) == 1 and hist[0]["message"] == "boom"
    assert DB.open_errors(errors).count() == 2

    from rearview_spark.monitors.schemas import JOB_DATA
    overview = {r["app_id"]: r for r in DB.dashboard_overview(
        monitors_df, spark.createDataFrame([], JOB_DATA), errors
    ).collect()}
    assert overview[1]["n_jobs"] == 2  # deleted excluded
    assert overview[1]["n_failed"] == 1
    assert overview[1]["n_open_incidents"] == 1
    assert overview[2]["n_open_incidents"] == 1


def test_user_by_email(spark):
    users = spark.createDataFrame(
        [(1, "admin@localhost", "Ad", "Min", T0, {"tz": "UTC"}, T0, T0)], USERS
    )
    assert DB.user_by_email(users, "admin@localhost").count() == 1
    assert DB.user_by_email(users, "nobody@x").count() == 0


def test_preview_run(spark):
    rows = [("stats.req", T0 + dt.timedelta(minutes=i), 200.0) for i in range(30)]
    metrics = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    out = DB.preview_run(
        spark, metrics, ["stats.req"], "a.mean() > 100", minutes=60,
        now=T0 + dt.timedelta(minutes=30),
    )
    assert out["status"] == "failed"
    assert len(out["graph_data"]) == 30


def test_metrics_layout_roundtrip(spark, tmp_path):
    rows = [
        ("m.a", T0 + dt.timedelta(hours=h), float(h)) for h in range(48)
    ] + [("m.b", T0 + dt.timedelta(hours=h), 2.0 * h) for h in range(48)]
    metrics = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    path = str(tmp_path / "metrics")
    write_metrics_dir(metrics, path)
    # partition dirs by date
    import os

    assert sorted(d for d in os.listdir(path) if d.startswith("dt="))[:2] == [
        "dt=2024-01-01", "dt=2024-01-02",
    ]
    back = read_metrics_dir(spark, path)
    assert back.count() == 96
    assert set(back.columns) == {"metric", "ts", "value"}
    # date-filter reads prune partitions (plan shows PartitionFilters)
    pruned = back.filter(F.col("ts") >= "2024-01-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == 48


def test_bucketed_layout_colocated_join_and_pruning(spark, tmp_path):
    """The two claims the bucketed layout makes at 100 TB (layout.py):
    same-bucket self-joins need NO shuffle, and exact-metric scans prune
    to one bucket."""
    import datetime as dtm

    from rearview_spark.sources.layout import write_metrics_table

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        (f"m{i % 8}", t0 + dtm.timedelta(minutes=j), float(i + j))
        for i in range(8)
        for j in range(20)
    ]
    df = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    spark.sql("DROP TABLE IF EXISTS m_bucket_test")
    write_metrics_table(df, "m_bucket_test", buckets=4, mode="overwrite", path=str(tmp_path / "tbl"))
    t = spark.table("m_bucket_test")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = t.select("metric", "ts", "value")
        b = t.select("metric", F.col("value").alias("value_b"))
        j = a.join(b, "metric")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucketed-by-metric scans already satisfy the join's required
        # distribution: no Exchange anywhere in the physical plan
        assert "Exchange" not in plan, plan
        assert j.count() == 8 * 20 * 20
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # bucket pruning: autoBucketedScan turns bucketed reads off when no
    # operator needs the distribution, which also forgoes pruning — pin
    # it on to observe the pruned scan (at scale the win is real: 1 of N
    # buckets read for an exact-metric lookup)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        pruned = t.filter(F.col("metric") == "m3")
        pplan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 4" in pplan, pplan
        assert pruned.count() == 20
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS m_bucket_test")


def test_zorder_spans_shrink_both_dimensions(spark, sf_dir):
    """Z-order clustering vs linear ts-sort: per-partition user_id spans
    must shrink decisively (that span IS the file-level min/max stat a
    scan prunes on), while ts spans stay useful."""
    from pyspark.sql import functions as F

    from rearview_spark.sources.loader import load_table
    from rearview_spark.sources.layout import quantize_col, zorder_layout

    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    bounds = ev.agg(
        F.min(sec).alias("mn_t"), F.max(sec).alias("mx_t"),
        F.min("user_id").alias("mn_u"), F.max("user_id").alias("mx_u"),
    )
    q = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id", "user_id", sec.alias("sec"),
        quantize_col(sec, F.col("mn_t"), F.col("mx_t")).alias("q_ts"),
        quantize_col(F.col("user_id"), F.col("mn_u"), F.col("mx_u")).alias("q_user"),
    )
    n_parts = 8

    def avg_user_span(df):
        spans = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max("user_id") - F.min("user_id")).alias("span"))
            .agg(F.avg("span"))
            .collect()[0][0]
        )
        return float(spans)

    linear = q.repartitionByRange(n_parts, "sec").sortWithinPartitions("sec")
    zed = zorder_layout(q, [F.col("q_ts"), F.col("q_user")], n_parts)
    lin_span, z_span = avg_user_span(linear), avg_user_span(zed)
    assert z_span < 0.7 * lin_span, (lin_span, z_span)


def test_zorder_read_side_skips_more_row_groups(spark, sf_dir, tmp_path):
    """The span shrink landing where it matters: WRITE both layouts and
    count, from the parquet footers' per-row-group min/max stats, the
    rows a stats-pruning scan must read for two-predicate queries.
    Averaged over a 6x6 grid of 10% x 10% (ts, user_id) windows, the
    z-ordered table must read decisively fewer rows than the linear
    ts-sort (measured ~0.6-0.7x at 64 row groups; single windows can
    flip — z-order trades worst-case alignment for average skipping,
    which is the documented contract in sources/layout.py)."""
    import glob as g

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from rearview_spark.sources.loader import load_table
    from rearview_spark.sources.layout import quantize_col, zorder_layout

    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    bounds = ev.agg(
        F.min(sec).alias("mn_t"), F.max(sec).alias("mx_t"),
        F.min("user_id").alias("mn_u"), F.max("user_id").alias("mx_u"),
    )
    b = bounds.collect()[0]
    q = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id", "user_id", sec.alias("sec"),
        quantize_col(sec, F.col("mn_t"), F.col("mx_t")).alias("q_ts"),
        quantize_col(F.col("user_id"), F.col("mn_u"), F.col("mx_u")).alias("q_user"),
    )
    n = 64
    lin_path, zed_path = str(tmp_path / "lin"), str(tmp_path / "zed")
    (
        q.repartitionByRange(n, "sec").sortWithinPartitions("sec")
        .drop("q_ts", "q_user").write.parquet(lin_path)
    )
    (
        zorder_layout(q, [F.col("q_ts"), F.col("q_user")], n)
        .drop("q_ts", "q_user").write.parquet(zed_path)
    )

    def must_read_rows(path, t_lo, t_hi, u_lo, u_hi):
        rows = 0
        for f in g.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                ss = rg.column(idx["sec"]).statistics
                su = rg.column(idx["user_id"]).statistics
                if ss.min <= t_hi and ss.max >= t_lo and su.min <= u_hi and su.max >= u_lo:
                    rows += rg.num_rows
        return rows

    def window(lo_pct, mn, mx, w_pct=10):
        return mn + (mx - mn) * lo_pct // 100, mn + (mx - mn) * (lo_pct + w_pct) // 100

    lin_total = zed_total = 0
    offsets = (0, 18, 36, 54, 72, 88)
    for tp in offsets:
        for up in offsets:
            t_lo, t_hi = window(tp, b.mn_t, b.mx_t)
            u_lo, u_hi = window(up, b.mn_u, b.mx_u)
            lin_total += must_read_rows(lin_path, t_lo, t_hi, u_lo, u_hi)
            zed_total += must_read_rows(zed_path, t_lo, t_hi, u_lo, u_hi)
    assert zed_total < 0.85 * lin_total, (lin_total, zed_total)

    # the documented trade, also pinned: a ts-ONLY scan favors the
    # linear sort (z-order spends ts selectivity to buy user selectivity)
    t_lo, t_hi = window(44, b.mn_t, b.mx_t)
    lin_ts = must_read_rows(lin_path, t_lo, t_hi, b.mn_u, b.mx_u)
    zed_ts = must_read_rows(zed_path, t_lo, t_hi, b.mn_u, b.mx_u)
    assert lin_ts < zed_ts, (lin_ts, zed_ts)
