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

On a cluster the source line becomes Kafka — swap ``load_events_stream``
for ``sources.loader.load_events_stream_kafka`` (same output schema,
option translation + value decode unit-tested in
tests/test_loader_dtypes.py) and the trigger becomes processingTime;
nothing else changes (batch/stream unification is the point of the
ingest design, streaming/ingest.py).
"""

from __future__ import annotations

import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.plans._exact import r4
from rearview_spark.sources.loader import load_events_stream
from rearview_spark.streaming.ingest import to_metrics
from rearview_spark.streaming.standing import run_to_memory_sink, standing_window_agg

WATERMARK = "10 minutes"


def _epoch_checked(ctx: str, ts_col: str = "ts"):
    """``CAST(ts AS LONG)`` with the batch operators' negative-epoch
    raise (ADVICE r14): a pre-1970 row would both mis-bucket (Spark's
    truncating ``div`` vs the oracle's floor ``//``) and silently
    vanish from every ``% 3`` micro-batch slice (Spark ``%`` keeps the
    dividend's sign), so the streaming gate path now fails as loudly
    as the batch operators it mirrors (behavior.py's slo_burn /
    stickiness guard)."""
    t = F.col(ts_col).cast("long")
    return F.when(t >= 0, t).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{ctx}: negative epoch timestamp "),
                F.coalesce(t.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )


@contextmanager
def _nanos_conf_guard(spark: SparkSession):
    """Snapshot/restore ``spark.sql.legacy.parquet.nanosAsLong`` around a
    streaming run: the schema-adaptive reader (sources/loader.py) sets it
    for nanos-encoded event files and leaves it untouched for micros
    files — either way the session conf must come back to its pre-call
    state so later batch reads in the same session see their expected
    encoding."""
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def stream_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events file directly (no staging copy — the shared
    schema-adaptive reader keeps batch and stream agreeing on the ts
    encoding), run the standing hourly aggregation with a 10-minute
    watermark to completion (availableNow), and return the append-mode
    emissions from the memory sink. The source is one file -> one data
    micro-batch -> deterministic final watermark. The last (still-open)
    window stays in state and is NOT emitted — the oracle asserts that
    too."""
    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    # state-partition sizing rationale lives with the knob:
    # streaming/standing.py DEFAULT_STATE_PARTITIONS
    with _nanos_conf_guard(spark):
        events = load_events_stream(spark, sf_dir)
        stream = to_metrics(events, WATERMARK)
        agg = standing_window_agg(stream, "1 hour", fns=("sum", "count"))
        sink = run_to_memory_sink(spark, agg, name)
    return sink.select(
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


def stream_dedup_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery -> exactly-once counts, end to end in the
    stream: the source is read TWICE and unioned (a faithful stand-in for
    redelivery/replay), watermarked ``dropDuplicates`` on the event key
    collapses the duplicates with bounded state, and the standing hourly
    aggregation emits closed windows. Two chained stateful operators
    (dedup -> windowed agg) with watermark propagation — the oracle sees
    each event exactly once, so it is the same emission rule over plain
    distinct events. Deterministic for the same reason as
    stream_hourly_stats (one data micro-batch)."""
    from rearview_spark.streaming.ingest import dedup_stream

    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    with _nanos_conf_guard(spark):
        doubled = load_events_stream(spark, sf_dir).unionByName(
            load_events_stream(spark, sf_dir)
        )
        deduped = dedup_stream(doubled, WATERMARK)
        # the watermark set before dropDuplicates propagates through; a
        # second withWatermark on the same column is disallowed across
        # stateful ops
        stream = deduped.select(
            F.col("event_type").alias("metric"),
            "ts",
            F.col("value").cast("double").alias("value"),
        )
        agg = standing_window_agg(stream, "1 hour", fns=("sum", "count"))
        sink = run_to_memory_sink(spark, agg, name)
    return sink.select(
        "metric",
        F.col("window_start").alias("ts"),
        r4(F.col("sum_value")).alias("sum_value"),
        "n_points",
    )


STREAM_DEDUP_SQL = """
WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
uniq AS (SELECT DISTINCT ON (event_id, ts) event_type, ts, value FROM events),
hourly AS (
  SELECT event_type AS metric, date_trunc('hour', ts) AS ts,
         sum(value) AS sv, count(value) AS n
  FROM uniq GROUP BY 1, 2
)
SELECT metric, ts, round(sv + 0.00000005, 4) AS sum_value, n AS n_points
FROM hourly, wm WHERE ts + INTERVAL 1 HOUR <= wm.w
"""


def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join as an oracle-gated query (was
    unit-only, VERDICT r04 §2.4 'Prov-A stream-stream join'): each
    purchase joined to the same user's clicks within the preceding 30
    minutes (streaming/standing.py stream_stream_purchase_attribution).
    INNER stream-stream joins emit matches as soon as both sides arrive —
    the watermark bounds click-state retention, not emission — so one
    availableNow pass over the file produces the complete deterministic
    interval join, and the oracle is the identical join in plain SQL.
    At scale the time-bound condition is what keeps state finite: clicks
    expire once the watermark passes click_ts + 30min."""
    from rearview_spark.streaming.standing import stream_stream_purchase_attribution

    name = "stream_attr_" + uuid.uuid4().hex[:8]
    with _nanos_conf_guard(spark):
        events = load_events_stream(spark, sf_dir)
        joined = stream_stream_purchase_attribution(events)
        sink = run_to_memory_sink(spark, joined, name)
    return sink.select(
        "purchase_id",
        "purchase_ts",
        "user_id",
        "click_id",
        "click_ts",
        r4(F.col("amount")).alias("amount"),
    )


STREAM_ATTR_SQL = """
SELECT p.event_id AS purchase_id, p.ts AS purchase_ts, p.user_id AS user_id,
       c.event_id AS click_id, c.ts AS click_ts,
       round(p.value + 0.00000005, 4) AS amount
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


def stream_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join
    (streaming/standing.stream_stream_attribution_outer): attributed
    purchases emit eagerly; ORGANIC purchases (no click in the preceding
    30 minutes) emit a NULL-click row only once the joint watermark —
    min over both inputs of max(event time) - 10min — passes their
    timestamp, because only then can the join prove no match is coming.
    One availableNow pass is deterministic (single data micro-batch +
    the no-data flush batch), and the oracle encodes the full emission
    rule: plain LEFT JOIN results, minus unmatched rows at-or-above the
    joint watermark (those are still buffered in the state store — the
    gate hash-checks what streaming WITHHELD, not just what it
    emitted)."""
    from rearview_spark.streaming.standing import stream_stream_attribution_outer

    name = "stream_outer_" + uuid.uuid4().hex[:8]
    with _nanos_conf_guard(spark):
        events = load_events_stream(spark, sf_dir)
        joined = stream_stream_attribution_outer(events)
        sink = run_to_memory_sink(spark, joined, name)
    return sink.select(
        "purchase_id",
        "purchase_ts",
        "user_id",
        "click_id",
        "click_ts",
        r4(F.col("amount")).alias("amount"),
    ).orderBy("purchase_id", "click_id")


STREAM_OUTER_ATTR_SQL = """
WITH wm AS (
  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
               (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
         - INTERVAL 10 MINUTE AS w),
p AS (SELECT event_id AS purchase_id, ts AS purchase_ts, user_id, value AS amount
      FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
      FROM events WHERE event_type = 'click'),
m AS (SELECT p.purchase_id, p.purchase_ts, p.user_id, c.click_id, c.click_ts, p.amount
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.click_ts <= p.purchase_ts
       AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE)
SELECT purchase_id, purchase_ts, user_id, click_id, click_ts,
       round(amount + 0.00000005, 4) AS amount
FROM m
UNION ALL
SELECT p.purchase_id, p.purchase_ts, p.user_id, NULL, NULL,
       round(p.amount + 0.00000005, 4)
FROM p, wm
WHERE p.purchase_ts < wm.w
  AND p.purchase_id NOT IN (SELECT purchase_id FROM m)
ORDER BY purchase_id, click_id
"""


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment under the driver (VERDICT r05
    next-round #7): the events stream joined per micro-batch to the
    static customer dimension (user_id -> c_mktsegment), the canonical
    micro-batch shape where AQE cannot re-plan and broadcasting the dim
    is the scale remedy (streaming/standing.py stream_static_enrich;
    operators/skew.py names this motivation). Stateless join -> append
    mode emits each enriched row exactly once, so one availableNow pass
    is deterministic and the oracle is the plain SQL join."""
    from rearview_spark.sources.loader import Tables
    from rearview_spark.streaming.standing import stream_static_enrich as enrich

    name = "stream_enrich_" + uuid.uuid4().hex[:8]
    with _nanos_conf_guard(spark):
        events = load_events_stream(spark, sf_dir)
        dim = Tables(spark, sf_dir).customer.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
        )
        joined = enrich(events, dim, "user_id").select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "c_mktsegment",
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            r4(F.col("value")).alias("value"),
        )
        sink = run_to_memory_sink(spark, joined, name)
    return sink


STREAM_ENRICH_SQL = """
SELECT e.event_id, e.ts, e.user_id, e.event_type,
       c.c_mktsegment, CAST(c.c_nationkey AS INTEGER) AS c_nationkey,
       round(e.value + 0.00000005, 4) AS value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


def stream_anomaly_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly alerting in the production shape: the robust
    baseline (per-metric median/MAD, operators/anomaly.py) is computed
    OFFLINE on the batch table — exactly how a deployment trains
    detection stats on history — and broadcast into the stream as a
    static dimension; each arriving event is then scored statelessly
    (|0.6745*(x-med)| > 3.5*MAD), so append mode emits each alert
    exactly once and one availableNow pass is deterministic. No
    state store, no watermark: the scale cost is the broadcast of a
    |metrics|-row frame per micro-batch. The oracle re-derives the
    rank-explicit medians and replays the comparison on identical
    doubles (anomaly.py determinism contract)."""
    from rearview_spark.operators.anomaly import (
        DEFAULT_THRESHOLD,
        MAD_SCALE,
        mad_scores,
    )
    from rearview_spark.sources.loader import Tables
    from rearview_spark.streaming.standing import stream_static_enrich as enrich

    name = "stream_anomaly_" + uuid.uuid4().hex[:8]
    with _nanos_conf_guard(spark):
        series = Tables(spark, sf_dir).events.select(
            F.col("event_type").alias("metric"), "ts", "value"
        )
        baseline = (
            mad_scores(series)
            .groupBy("metric")
            .agg(F.max("med").alias("med"), F.max("mad").alias("mad"))
        )
        stream = load_events_stream(spark, sf_dir).select(
            "event_id", "ts", F.col("event_type").alias("metric"), "value"
        )
        signed = F.lit(MAD_SCALE) * (F.col("value") - F.col("med"))
        alerts = (
            enrich(stream, baseline, "metric")
            .filter(
                (F.col("mad") > 0)
                & (F.abs(signed) > F.lit(DEFAULT_THRESHOLD) * F.col("mad"))
            )
            .select(
                "event_id",
                "metric",
                "ts",
                r4(F.col("value")).alias("value"),
                r4(signed / F.col("mad")).alias("robust_z"),
            )
        )
        sink = run_to_memory_sink(spark, alerts, name)
    return sink


STREAM_ANOMALY_SQL = """
WITH r1 AS (
  SELECT event_id, event_type AS metric, ts, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, ts) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT metric, sum(value) / count(value) AS med FROM r1
  WHERE r = (n + 1) // 2 OR r = n // 2 + 1 GROUP BY metric
),
d AS (
  SELECT r1.event_id, r1.metric, r1.ts, r1.value, med.med,
         abs(r1.value - med.med) AS dev
  FROM r1 JOIN med USING (metric)
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY metric ORDER BY dev, ts) AS r,
         count(*) OVER (PARTITION BY metric) AS n
  FROM d
),
mad AS (
  SELECT metric, sum(dev) / count(dev) AS mad FROM r2
  WHERE r = (n + 1) // 2 OR r = n // 2 + 1 GROUP BY metric
)
SELECT d.event_id, d.metric, d.ts,
       round(d.value + 0.00000005, 4) AS value,
       round(0.6745 * (d.value - d.med) / mad.mad + 0.00000005, 4) AS robust_z
FROM d JOIN mad USING (metric)
WHERE mad.mad > 0 AND abs(0.6745 * (d.value - d.med)) > 3.5 * mad.mad
"""


def stream_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD Type-2: the events stream drives
    ``scd2_foreach_batch`` (operators/scd.py) under availableNow — the
    micro-batch merges into the versioned history store and the gate
    returns the landed snapshot. One staged file means one data
    micro-batch (the deterministic-emission rule every stream_* gate
    uses), so the snapshot equals the batch construction and the
    oracle replays the same lag-dedup + lead-close windows; the
    multi-batch recurrence and retry hygiene are pinned by
    tests/test_monitors.py::test_scd2_foreach_batch_recurrence_and_retry."""
    import shutil
    import tempfile

    from rearview_spark.operators.scd import scd2_foreach_batch

    work = tempfile.mkdtemp(prefix="scd2_gate_")
    hist = f"{work}/history"
    try:
        with _nanos_conf_guard(spark):
            ev = load_events_stream(spark, sf_dir).select(
                "user_id", "event_type", "ts"
            )
            q = (
                ev.writeStream.foreachBatch(
                    scd2_foreach_batch(spark, hist, "user_id", ["event_type"], "ts")
                )
                .trigger(availableNow=True)
                .option("checkpointLocation", f"{work}/ckpt")
                .start()
            )
            q.awaitTermination()
        # survive the finally-rmtree without a driver collect round-trip:
        # executor-side materialization of the (small) history snapshot
        out = (
            spark.read.parquet(f"{hist}/v=0")
            .orderBy("user_id", "valid_from", "event_type")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# the streaming gate lands the SAME history the batch gate derives, so
# the oracle IS the batch gate's — single-sourced from events_queries
from rearview_spark.plans.events_queries import EV_SCD2_SQL as STREAM_SCD2_SQL  # noqa: E402


QUERIES: dict[str, dict] = {
    "stream_scd2_history": {"fn": stream_scd2_history, "oracle": STREAM_SCD2_SQL},
    "stream_hourly_stats": {"fn": stream_hourly_stats, "oracle": STREAM_HOURLY_SQL},
    "stream_anomaly_alerts": {"fn": stream_anomaly_alerts, "oracle": STREAM_ANOMALY_SQL},
    "stream_dedup_hourly_counts": {"fn": stream_dedup_hourly_counts, "oracle": STREAM_DEDUP_SQL},
    "stream_attribution": {"fn": stream_attribution, "oracle": STREAM_ATTR_SQL},
    "stream_outer_attribution": {
        "fn": stream_outer_attribution,
        "oracle": STREAM_OUTER_ATTR_SQL,
    },
    "stream_static_enrich": {"fn": stream_static_enrich, "oracle": STREAM_ENRICH_SQL},
}


def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift with the CURRENT period's occupancy accumulated by the
    foreachBatch recurrence (operators/anomaly.psi_foreach_batch) over
    three deterministic micro-batch slices instead of one pass: per-bin
    counts merge by ADDITION, so the streamed state — and therefore the
    PSI — is bit-identical to the batch gate, and this gate shares
    ev_psi_drift's FULL value oracle (micro-batching is a delivery
    choice, not a semantics change; the doc_bm25_indexed discipline).
    The batch=<id> state dirs carry the CM/HLL retry contract."""
    import tempfile

    from rearview_spark.operators.anomaly import (
        psi_foreach_batch,
        psi_from_occupancy,
        psi_occupancy,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    bins = 10
    ev = Tables(spark, sf_dir).events
    v = ev.filter(F.col("value").isNotNull()).select(
        F.col("ts").cast("long").alias("t"), F.col("value").alias("v")
    )
    rng = v.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).collect()[0]
    mid = (int(rng["lo"]) + int(rng["hi"])) // 2
    base = v.filter(F.col("t") <= mid)
    cur = v.filter(F.col("t") > mid)
    edges = base.agg(
        *[
            F.expr(
                f"percentile_disc({k / bins}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"e{k}")
            for k in range(1, bins)
        ]
    ).collect()[0]
    edge_vals = [float(edges[f"e{k}"]) for k in range(1, bins)]
    state_dir = tempfile.mkdtemp(prefix="psi_stream_")
    proc = psi_foreach_batch(spark, state_dir, edge_vals)
    for i in range(3):
        proc(cur.filter(F.pmod(F.col("t"), F.lit(3)) == i), i)
    merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
    return psi_from_occupancy(
        psi_occupancy(base, edge_vals, "c_base"), merged, bins=bins
    )


from rearview_spark.plans.events_queries import _psi_sql as _stream_psi_sql  # noqa: E402

PENDING_QUERIES: dict[str, dict] = {
    "stream_psi_drift": {"fn": stream_psi_drift, "oracle": _stream_psi_sql()},
}

# r13 registration (VERDICT_r12 next-round #1): the staged backlog flips
# live in one move. Never-driver-checked names front-load automatically via
# group (c) in plans/all_queries(), so each gets a first driver row this
# round; the window's remaining slots rotate the stalest green cohort.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def stream_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity with the sweep-line state accumulated by
    the foreachBatch recurrence (operators/behavior.concurrency_foreach_batch)
    over three deterministic micro-batch slices instead of one pass:
    net boundary deltas merge by ADDITION, so the streamed state — and
    therefore the peak — is bit-identical to the batch gate, and this
    gate shares ev_peak_concurrency's FULL value oracle (micro-batching
    is a delivery choice, not a semantics change; the stream_psi_drift
    discipline). The batch=<id> state dirs carry the CM/HLL retry
    contract; the final read is peak_from_deltas — the distributed
    global running sum, never a single-task window (VERDICT_r12
    next-round #6: sessions/connections are the canonical streaming
    capacity metric)."""
    import shutil
    import tempfile

    from rearview_spark.operators.behavior import (
        concurrency_foreach_batch,
        peak_from_deltas,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    ev = Tables(spark, sf_dir).events
    iv = ev.select(
        "event_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + F.lit(1800)).alias("end"),
    )
    state_dir = tempfile.mkdtemp(prefix="conc_stream_")
    try:
        proc = concurrency_foreach_batch(spark, state_dir)
        for i in range(3):
            proc(iv.filter(F.pmod(F.col("event_id"), F.lit(3)) == i), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
        return peak_from_deltas(merged).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


# the streamed state is addition-merged to the same sweep the batch gate
# runs, so the oracle IS the batch gate's — single-sourced
from rearview_spark.plans.events_queries import EV_PEAK_CONC_SQL as STREAM_PEAK_SQL  # noqa: E402

QUERIES["stream_peak_concurrency"] = {
    "fn": stream_peak_concurrency,
    "oracle": STREAM_PEAK_SQL,
}


def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel_cdc_apply's changelog delivered as three micro-batches with
    the stragglers arriving AFTER their winners (operators/cdc.cdc_
    foreach_batch): batch 0 carries the seq-2 winning updates and the
    deletes, batch 1 the stale seq-1 updates (which must all lose to
    persisted state), batch 2 the inserts — plus a retry of batch 2
    (the batch-dir contract: re-merge from predecessor, no
    double-apply). The per-key (order, op) state with delete tombstones
    is what makes last-writer-wins associative across batches, so the
    final snapshot shares rel_cdc_apply's OUTCOME oracle exactly
    (micro-batching is a delivery choice, not a semantics change)."""
    import shutil
    import tempfile

    from rearview_spark.operators.cdc import cdc_foreach_batch, cdc_state_snapshot
    from rearview_spark.sources.loader import Tables

    o = Tables(spark, sf_dir).orders
    deletes = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        *[F.lit(None).cast(o.schema[c].dataType).alias(c) for c in o.columns[1:]],
        F.lit("D").alias("op"),
        F.lit(1).alias("seq"),
    )
    upd = o.filter(F.col("o_orderkey") % 10 == 1)
    updates_stale = upd.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    updates_win = upd.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") + F.lit(2.0)).alias("o_totalprice"),
        "o_orderdate", "o_orderpriority",
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    inserts = o.filter(F.col("o_orderkey") % 10 == 2).select(
        (F.col("o_orderkey") + F.lit(1000000000)).alias("o_orderkey"),
        "o_custkey", F.lit("N").alias("o_orderstatus"), "o_totalprice",
        "o_orderdate", "o_orderpriority",
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    state_dir = tempfile.mkdtemp(prefix="cdc_stream_")
    try:
        proc = cdc_foreach_batch(spark, state_dir, o, ["o_orderkey"], ["seq"])
        proc(updates_win.unionByName(deletes), 0)
        proc(updates_stale, 1)   # stragglers: must lose to state
        proc(inserts, 2)
        proc(inserts, 2)         # retried batch: no double-apply
        return (
            cdc_state_snapshot(spark, state_dir)
            .orderBy("o_orderkey")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


# the streamed state converges to the same snapshot the batch gate
# derives, so the oracle IS the batch gate's outcome statement
from rearview_spark.plans.relational import REL_CDC_SQL as STREAM_CDC_SQL  # noqa: E402

QUERIES["stream_cdc_apply"] = {"fn": stream_cdc_apply, "oracle": STREAM_CDC_SQL}


# RETIRED GATE (r16, VERDICT_r15 next-round #5): stream_ks_drift — the
# ungrouped foreachBatch KS recurrence; stream_ks_drift_by_type keeps
# the identical ADD-merge state contract, three-slice replay shape, and
# batch=<id> retry dirs driver-checked in segmented form. Coverage of
# the ungrouped recurrence inherits to tests/test_streaming.py::
# test_ks_foreach_batch_replay_and_batch_equality (replay + retried-id
# idempotence + batch equality). Retired together with its batch twin
# ev_ks_drift (see plans/events_queries.py).
def stream_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KS drift with the CURRENT side's (key, value)
    counts accumulated by the segmented foreachBatch recurrence
    (operators/anomaly.ks_by_foreach_batch, VERDICT_r13 next-round #6)
    over three deterministic micro-batch slices: counts merge by
    ADDITION, so the streamed state — and every segment's exact D
    numerator, statistic, and argmax value — is bit-identical to the
    batch gate, and this gate shares ev_ks_drift_by_type's FULL value
    oracle (micro-batching is a delivery choice, not a semantics
    change — the stream_psi_drift discipline, segmented). The
    batch=<id> state dirs carry the CM/HLL retry contract."""
    import shutil
    import tempfile

    from rearview_spark.operators.anomaly import (
        ks_by_foreach_batch,
        ks_by_from_counts,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    ev = Tables(spark, sf_dir).events
    v = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("key"),
        F.col("ts").cast("long").alias("t"),
        F.col("value").alias("v"),
    )
    rng = v.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).collect()[0]
    mid = (int(rng["lo"]) + int(rng["hi"])) // 2
    base = v.filter(F.col("t") <= mid)
    cur = v.filter(F.col("t") > mid)
    state_dir = tempfile.mkdtemp(prefix="ksby_stream_")
    try:
        proc = ks_by_foreach_batch(spark, state_dir)
        for i in range(3):
            proc(cur.filter(F.pmod(F.col("t"), F.lit(3)) == i).select("key", "v"), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
        counts = (
            base.groupBy("key", "v")
            .agg(F.count(F.lit(1)).alias("ca"))
            .withColumn("cb", F.lit(0).cast("long"))
            .unionByName(
                merged.select(
                    "key",
                    "v",
                    F.lit(0).cast("long").alias("ca"),
                    F.col("c_cur").cast("long").alias("cb"),
                )
            )
        )
        # materialize before the state dir disappears (the
        # stream_peak_concurrency cleanup contract)
        return ks_by_from_counts(counts).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


from rearview_spark.plans.events_queries import EV_KS_BY_SQL as _STREAM_KS_BY_SQL  # noqa: E402

# Staged (r14 growth budget: the flip wave + 34 rotations fill the
# window; flips in r15).
PENDING_QUERIES["stream_ks_drift_by_type"] = {
    "fn": stream_ks_drift_by_type,
    "oracle": _STREAM_KS_BY_SQL,
}


def stream_ema_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA crossover alerts as a standing query
    (operators/timeseries.ema_crossover_foreach_batch, VERDICT_r13
    next-round #5): the same two-day hourly window as the batch gate
    ts_ema_crossover, delivered as three contiguous TIME-ORDERED
    micro-batch slices — the sequential-state contract. Per metric the
    carried state (raw EMA pair + last non-zero rounded diff) makes
    each slice continue the recurrences bit-exactly, so the union of
    per-batch crossover emissions equals the batch operator's output
    and this gate shares ts_ema_crossover's FULL value oracle (the
    stream_psi_drift batch-equality discipline). State/retry: the
    batch=<id> dirs carry the sketch-store convention — a retried
    batch reseeds from its predecessor and overwrites its own
    emissions, never double-alerts."""
    import shutil
    import tempfile

    from rearview_spark.operators.timeseries import (
        ema_crossover_foreach_batch,
    )
    from rearview_spark.plans.timeseries_queries import _hourly

    hourly = _hourly(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-05")) & (F.col("ts") < F.lit("2024-01-07"))
    )
    state_dir = tempfile.mkdtemp(prefix="emax_stream_")
    try:
        proc = ema_crossover_foreach_batch(spark, state_dir, fast_n=3, slow_n=10)
        bounds = ["2024-01-05 16:00:00", "2024-01-06 08:00:00"]
        slices = [
            hourly.filter(F.col("ts") < F.lit(bounds[0])),
            hourly.filter(
                (F.col("ts") >= F.lit(bounds[0]))
                & (F.col("ts") < F.lit(bounds[1]))
            ),
            hourly.filter(F.col("ts") >= F.lit(bounds[1])),
        ]
        for i, sl in enumerate(slices):
            proc(sl, i)
        out = spark.read.parquet(f"{state_dir.rstrip('/')}/out")
        # materialize before the state dir disappears (the
        # stream_peak_concurrency cleanup contract); `batch` is the
        # partition-discovery column of the per-batch emission dirs
        return (
            out.select("metric", "ts", "fast", "slow", "cross")
            .orderBy("metric", "ts")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


from rearview_spark.plans.timeseries_queries import (  # noqa: E402
    TS_EMA_CROSS_SQL as _STREAM_EMAX_SQL,
)

# Staged (r14 growth budget; flips in r15).
PENDING_QUERIES["stream_ema_crossover"] = {
    "fn": stream_ema_crossover,
    "oracle": _STREAM_EMAX_SQL,
}


def stream_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning mix with the distinct (user, day)
    activity set accumulated by the set-union foreachBatch recurrence
    (operators/behavior.user_activity_foreach_batch) over three
    micro-batch slices: set union is commutative and idempotent, so
    the streamed state — and the whole mix read off it — is
    bit-identical to the batch gate and shares ev_new_vs_returning's
    FULL value oracle. The batch=<id> state dirs carry the retry
    contract (doubly harmless here: a re-unioned set is the same
    set)."""
    import shutil
    import tempfile

    from rearview_spark.operators.behavior import (
        mix_from_user_buckets,
        user_activity_foreach_batch,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    ev = Tables(spark, sf_dir).events
    ub = ev.select(
        F.col("user_id").alias("u"),
        _epoch_checked("stream_new_vs_returning").alias("t"),
    ).select("u", F.expr("t div 86400").alias("bucket"))
    state_dir = tempfile.mkdtemp(prefix="unr_stream_")
    try:
        proc = user_activity_foreach_batch(spark, state_dir)
        for i in range(3):
            proc(ub.filter(F.pmod(F.col("bucket"), F.lit(3)) == i), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
        # materialize before the state dir disappears (the
        # stream_peak_concurrency cleanup contract)
        return mix_from_user_buckets(merged).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


from rearview_spark.plans.events_queries import (  # noqa: E402
    EV_NEW_RET_SQL as _STREAM_UNR_SQL,
)

# Staged (r14 growth budget; flips in r15).
PENDING_QUERIES["stream_new_vs_returning"] = {
    "fn": stream_new_vs_returning,
    "oracle": _STREAM_UNR_SQL,
}


def stream_metric_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which metrics stopped reporting — per-metric last-seen hourly
    bucket accumulated by the MAX-merge foreachBatch recurrence
    (operators/timeseries.staleness_foreach_batch; max is commutative
    AND idempotent, so micro-batch order and retries are both
    harmless) over three slices, then staleness flags against the
    stream's event-time newest bucket. Bit-identical to one batch
    metric_staleness pass — the gate carries a FULL value oracle."""
    import shutil
    import tempfile

    from rearview_spark.operators.timeseries import (
        staleness_foreach_batch,
        staleness_from_last_seen,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    ev = Tables(spark, sf_dir).events
    mb = ev.select(
        F.col("event_type").alias("metric"),
        _epoch_checked("stream_metric_staleness").alias("t"),
    ).select("metric", F.expr("t div 3600").alias("b"))
    state_dir = tempfile.mkdtemp(prefix="stale_stream_")
    try:
        proc = staleness_foreach_batch(spark, state_dir)
        for i in range(3):
            proc(mb.filter(F.pmod(F.col("b"), F.lit(3)) == i), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
        # materialize before the state dir disappears (the
        # stream_peak_concurrency cleanup contract)
        return staleness_from_last_seen(
            merged, threshold_buckets=3
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


_STREAM_STALE_SQL = """
WITH last AS (
  SELECT event_type AS metric,
         max(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS last_seen_bucket
  FROM events GROUP BY 1),
now AS (SELECT max(last_seen_bucket) AS n FROM last)
SELECT metric,
       CAST(last_seen_bucket AS BIGINT) AS last_seen_bucket,
       CAST(now.n - last_seen_bucket AS BIGINT) AS lag_buckets,
       (now.n - last_seen_bucket) > 3 AS stale
FROM last, now ORDER BY metric
"""

# Staged (r14 growth budget; flips in r15).
PENDING_QUERIES["stream_metric_staleness"] = {
    "fn": stream_metric_staleness,
    "oracle": _STREAM_STALE_SQL,
}


# r15 FLIP (VERDICT_r14 next-round #1): the r14-staged wave registers —
# every gate below was pre-verified at sf0.001 + sf0.01 + sf0.1 through
# tests/test_pending_gates.py, so this is the known-green one-line move.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}

def stream_retention_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention triangle as a standing query (VERDICT_r14
    next-round #6): the distinct (user, epoch-week) activity set
    accumulated by the set-union foreachBatch recurrence
    (operators/behavior.user_activity_foreach_batch — the
    stream_new_vs_returning state, weekly buckets) over three
    micro-batch slices, then the triangle read off the merged state
    through the SAME post-collapse code path as the batch operator
    (behavior.retention_from_user_buckets). Set union is commutative
    and idempotent, so the streamed state — and every (cohort, offset)
    cell, size, and rate read off it — is bit-identical to the batch
    gate, and this gate shares ev_retention_rates' FULL value oracle
    (the stream_psi_drift batch-equality discipline). The batch=<id>
    state dirs carry the retry contract (a re-unioned set is the same
    set)."""
    import shutil
    import tempfile

    from rearview_spark.operators.behavior import (
        retention_from_user_buckets,
        user_activity_foreach_batch,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    ev = Tables(spark, sf_dir).events
    ub = ev.select(
        F.col("user_id").alias("u"),
        _epoch_checked("stream_retention_rates").alias("t"),
    ).select("u", F.expr("t div 604800").alias("bucket"))
    state_dir = tempfile.mkdtemp(prefix="ret_stream_")
    try:
        proc = user_activity_foreach_batch(spark, state_dir)
        for i in range(3):
            proc(ub.filter(F.pmod(F.col("bucket"), F.lit(3)) == i), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
        # materialize before the state dir disappears (the
        # stream_peak_concurrency cleanup contract)
        return retention_from_user_buckets(merged).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


from rearview_spark.plans.events_queries import (  # noqa: E402
    EV_RETENTION_RATES_SQL as _STREAM_RET_SQL,
)

# Staged (r15 — the r15 window is the 15 r14 flips + 35 rotations, so
# new gates wait for r16's budget; pre-verified by
# tests/test_pending_gates.py at three scales).
PENDING_QUERIES["stream_retention_rates"] = {
    "fn": stream_retention_rates,
    "oracle": _STREAM_RET_SQL,
}

# r16 flip: the r15-staged wave registers (window = 7 flips + 34 r10 +
# 9 r11 rotations, pinned by VERDICT_r15 next-round #3).
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def stream_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV-per-user curve as a standing query
    (VERDICT_r15 next-round #6): per-(user, epoch-week) integer-cents
    value sums accumulated by the ADD-merge foreachBatch recurrence
    (operators/behavior.user_value_foreach_batch — the CM/HLL/PSI
    count-merge contract with (u, bucket) keys) over three disjoint
    micro-batch slices, then the curve read off the merged state
    through the SAME post-collapse code path as the batch operator
    (behavior.ltv_from_user_value_buckets). Integer addition is
    commutative/associative, so the streamed state — and every cell,
    prefix sum, and per-user division read off it — is bit-identical
    to the batch gate, and this gate shares ev_cohort_ltv's FULL
    value oracle (the stream_retention_rates discipline, sum-merge
    instead of set-union). The batch=<id> state dirs carry the retry
    contract (a retried id re-reads its predecessor and overwrites —
    never double-adds)."""
    import shutil
    import tempfile

    from rearview_spark.operators.behavior import (
        ltv_from_user_value_buckets,
        user_value_foreach_batch,
    )
    from rearview_spark.operators.sketch import _latest_batch_dir
    from rearview_spark.sources.loader import Tables

    ev = Tables(spark, sf_dir).events
    uvb = ev.select(
        F.col("user_id").alias("u"),
        _epoch_checked("stream_cohort_ltv").alias("t"),
        F.coalesce(
            F.round(F.col("value").cast("double") * 100).cast("long"),
            F.lit(0),
        ).alias("cents"),
    ).select("u", F.expr("t div 604800").alias("bucket"), "cents")
    state_dir = tempfile.mkdtemp(prefix="ltv_stream_")
    try:
        proc = user_value_foreach_batch(spark, state_dir)
        for i in range(3):
            proc(uvb.filter(F.pmod(F.col("bucket"), F.lit(3)) == i), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state_dir))
        # materialize before the state dir disappears (the
        # stream_peak_concurrency cleanup contract)
        return ltv_from_user_value_buckets(merged).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


from rearview_spark.plans.events_queries import (  # noqa: E402
    EV_COHORT_LTV_SQL as _STREAM_LTV_SQL,
)

# Staged (r16 wave — r17 budget; the r16 window is pinned to the 7
# r15-staged flips + 43 rotations, so new gates wait. Pre-verified by
# tests/test_pending_gates.py at three scales).
PENDING_QUERIES["stream_cohort_ltv"] = {
    "fn": stream_cohort_ltv,
    "oracle": _STREAM_LTV_SQL,
}
