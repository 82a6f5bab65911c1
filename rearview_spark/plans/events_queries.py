"""Event-log analytics: JSON property extraction, sessionization, user
activity — the ingestion-side query shapes (the reference's dynamic JSON
columns, SURVEY.md §1.3: job_data.data / alert_keys / preferences were
schema-on-read JSON; here the same handling is shown on events.props)
plus classic clickstream patterns (sessionization = lag + gap cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rearview_spark.sources.loader import Tables


def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON: extract props.k, bucket it, aggregate. The
    extraction is get_json_object (JVM Jackson path, no UDF)."""
    ev = Tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(F.col("event_type"), k.alias("k"), "value")
        .withColumn("k_bucket", (F.col("k") % 10).cast("int"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("k") + F.lit(5e-8), 4).alias("avg_k"),
            F.round(F.sum("value") + F.lit(5e-8), 4).alias("sum_value"),
        )
        .orderBy("event_type", "k_bucket")
    )


EV_JSON_SQL = """
SELECT event_type,
       CAST(CAST(json_extract(props, '$.k') AS INT) % 10 AS INT) AS k_bucket,
       count(*) AS n,
       round(avg(CAST(json_extract(props, '$.k') AS INT)) + 0.00000005, 4) AS avg_k,
       round(sum(value) + 0.00000005, 4) AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def ev_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user (30-min inactivity boundary):
    lag -> new-session flag -> running cumsum = session id; then session
    stats. Two window passes over the same (user_id, ts) ordering — one
    shuffle, Catalyst collapses the Window nodes."""
    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_flag = ev.select("user_id", "ts", "event_id").withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    with_id = with_flag.withColumn(
        "session_seq", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("duration_s"),
        )
        .orderBy("user_id", "session_seq")
    )


EV_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), ids AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       max(CAST(floor(epoch(ts)) AS BIGINT)) - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_s
FROM ids GROUP BY user_id, session_seq ORDER BY user_id, session_seq
"""


def ev_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface (Prov-A category): events-per-day wide by type."""
    ev = Tables(spark, sf_dir).events
    return (
        # date_trunc (timestamp), not to_date: Spark DateType surfaces as
        # python-date objects in the comparison frame while DuckDB DATE
        # arrives as datetime64 — a dtype-family mismatch under the
        # driver's type-sensitive hash. Midnight timestamps agree on both.
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
        .orderBy("day")
    )


EV_PIVOT_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view",
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY 1 ORDER BY 1
"""


def ev_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates surface: HLL++ distinct users per type,
    alongside the exact count the oracle verifies. The approx column is
    engine-specific by nature, so the query returns its absolute error
    bound check (|approx-exact|/exact < 5%) rather than the raw sketch."""
    ev = Tables(spark, sf_dir).events
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_approx"),
    )
    ok = (F.abs(F.col("_approx") - F.col("exact_users")) / F.col("exact_users")) < 0.05
    return per_type.select(
        "event_type", "exact_users", ok.alias("approx_within_5pct")
    ).orderBy("event_type")


EV_APPROX_SQL = """
SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS approx_within_5pct
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES: dict[str, dict] = {
    "ev_json_props": {"fn": ev_json_props, "oracle": EV_JSON_SQL},
    "ev_sessionization": {"fn": ev_sessionization, "oracle": EV_SESSION_SQL},
    "ev_type_pivot": {"fn": ev_type_pivot, "oracle": EV_PIVOT_SQL},
    "ev_approx_distinct": {"fn": ev_approx_distinct, "oracle": EV_APPROX_SQL},
}


def ev_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 session windows via Spark's native session_window (30-min gap):
    same sessions as the lag+cumsum construction in ev_sessionization —
    the oracle derives window bounds from that construction
    (window_end = last event + gap timeout)."""
    ev = Tables(spark, sf_dir).events
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


EV_SESSION_NATIVE_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         -- Spark session_window: a new session starts when the gap REACHES
         -- the timeout (epoch diff >= 1800s, microsecond precision)
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), ids AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM ids GROUP BY user_id, session_seq ORDER BY user_id, session_start
"""


QUERIES.update(
    {
        "ev_session_window_native": {"fn": ev_session_window_native, "oracle": EV_SESSION_NATIVE_SQL},
    }
)


def ev_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): each click event picks up the
    user's most recent purchase at-or-before it (backward inclusive).
    Purchases are pre-aggregated to one row per (user, ts) so the match
    is deterministic; the oracle is DuckDB's native ASOF LEFT JOIN — an
    independent implementation of the same semantics."""
    from rearview_spark.operators.joins import asof_join

    ev = Tables(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    j = asof_join(clicks, purch, on="ts", by=("user_id",), suffix="_p")
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_p").alias("purchase_ts"),
        "purchase_value",
    ).orderBy("event_id")


EV_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def ev_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/joins.py): signup events bucketed into
    overlapping 3-day review windows anchored at each calendar day that
    had an error event — interval containment as a bucketed equi-join
    (no BroadcastNestedLoop; test_joins asserts the plan shape)."""
    from rearview_spark.operators.joins import range_join

    ev = Tables(spark, sf_dir).events
    windows = (
        ev.filter(F.col("event_type") == "error")
        .select(F.date_trunc("day", "ts").alias("w_start"))
        .distinct()
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 3 DAYS"))
    )
    signups = ev.filter(F.col("event_type") == "signup").select("ts", "user_id")
    j = range_join(signups, windows, ts_col="ts", bucket_s=86400)
    return (
        j.groupBy("w_start")
        .agg(
            F.count("*").alias("n_signups"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("w_start")
    )


EV_RANGE_SQL = """
WITH windows AS (
  SELECT DISTINCT date_trunc('day', ts) AS w_start,
         date_trunc('day', ts) + INTERVAL 3 DAY AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT w.w_start, count(*) AS n_signups, count(DISTINCT e.user_id) AS n_users
FROM events e JOIN windows w
  ON e.ts >= w.w_start AND e.ts < w.w_end
WHERE e.event_type = 'signup'
GROUP BY w.w_start ORDER BY w.w_start
"""


QUERIES.update(
    {
        "ev_asof_last_purchase": {"fn": ev_asof_last_purchase, "oracle": EV_ASOF_SQL},
        "ev_range_join_windows": {"fn": ev_range_join_windows, "oracle": EV_RANGE_SQL},
    }
)


# RETIRED GATE (r16, VERDICT_r15 next-round #5): ev_conversion_funnel —
# the inline 3-count strict-after funnel was strictly subsumed by the
# still-gated ev_funnel_stages (same view->click->purchase corpus
# through the SAME chained per-stage min-aggregate machinery in
# operators/behavior.funnel_conversion, plus horizon + per-stage
# ratios; ev_funnel_by_variant and ev_funnel_latency keep two more
# funnel_conversion-family paths gated). Its only semantic delta —
# strictly-after (>) instead of at-or-after — is now the operator's
# `strict=True` option, pinned by
# tests/test_pipeline_ops.py::test_funnel_conversion_hand_sequences
# (same-instant click rejected under strict). Retiring shortens the
# driver recheck cycle.


def ev_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key computation for the events table clustered on
    (ts, user_id) — the multi-column data-skipping layout
    (sources/layout.py: zorder_layout). The gate value-checks the
    rank-quantization and bit-interleave against an oracle generated
    from the same expression builder, so what the writer clusters on is
    exactly what the check pins. Bounds ride in as a broadcast 1-row
    aggregate; everything downstream is a narrow integer map."""
    from rearview_spark.sources.layout import quantize_col, zorder_key

    ev = Tables(spark, sf_dir).events
    sec = F.col("ts").cast("long")
    bounds = ev.agg(
        F.min(sec).alias("mn_t"),
        F.max(sec).alias("mx_t"),
        F.min("user_id").alias("mn_u"),
        F.max("user_id").alias("mx_u"),
    )
    q = ev.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        quantize_col(sec, F.col("mn_t"), F.col("mx_t")).alias("q_ts"),
        quantize_col(F.col("user_id"), F.col("mn_u"), F.col("mx_u")).alias("q_user"),
    )
    return q.select(
        "event_id",
        "q_ts",
        "q_user",
        zorder_key([F.col("q_ts"), F.col("q_user")]).alias("zkey"),
    ).orderBy("event_id")


def _ev_zorder_sql() -> str:
    from rearview_spark.sources.layout import zorder_key_sql

    def quant(x: str, mn: str, mx: str) -> str:
        return (
            f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
            f"least(CAST(floor(((CAST({x} AS DOUBLE) - CAST({mn} AS DOUBLE)) "
            f"/ (CAST({mx} AS DOUBLE) - CAST({mn} AS DOUBLE))) * 256.0) AS INT), 255) END"
        )

    sec = "CAST(floor(epoch(ts)) AS BIGINT)"
    z = zorder_key_sql(["q_ts", "q_user"])
    return f"""
WITH s AS (
  SELECT min({sec}) AS mn_t, max({sec}) AS mx_t,
         min(user_id) AS mn_u, max(user_id) AS mx_u
  FROM events
),
q AS (
  SELECT event_id,
         {quant(sec, 's.mn_t', 's.mx_t')} AS q_ts,
         {quant('user_id', 's.mn_u', 's.mx_u')} AS q_user
  FROM events, s
)
SELECT event_id, q_ts, q_user, CAST({z} AS BIGINT) AS zkey
FROM q ORDER BY event_id
"""


QUERIES.update(
    {
        "ev_zorder_keys": {"fn": ev_zorder_keys, "oracle": _ev_zorder_sql()},
    }
)


HH_K = 120


def ev_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent users (operators/sketch.py heavy_hitters): every
    user with > n/(k+1) of all events, found by per-partition
    Misra-Gries candidate summaries + an exact candidate recount — two
    scans, zero corpus-scale shuffle, no full GROUP BY over the key
    domain. The answer is EXACT (the sketch only bounds the candidate
    set), so the oracle is the plain HAVING-count formulation."""
    from rearview_spark.operators.sketch import heavy_hitters

    ev = Tables(spark, sf_dir).events
    return heavy_hitters(ev, "user_id", k=HH_K).orderBy("user_id")


EV_HH_SQL = f"""
SELECT user_id, count(*) AS n_rows
FROM events
GROUP BY user_id
HAVING count(*) * {HH_K + 1} > (SELECT count(*) FROM events)
ORDER BY user_id
"""


def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, then
    distinct active users per (cohort week, weeks-since) cell — the
    standard growth-analytics triangle. Two aggregates keyed on
    user_id (first-seen, then the join back) share one hash
    partitioning; the final cell aggregate is cohort-cardinality-sized.
    Week offsets are integer epoch arithmetic — float-free."""
    ev = Tables(spark, sf_dir).events
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select("user_id", F.date_trunc("week", "ts").alias("w")).join(
        first, "user_id"
    )
    offset = (
        (F.col("w").cast("long") - F.col("cohort_week").cast("long")) / (7 * 86400)
    ).cast("int")
    return (
        activity.groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EV_COHORT_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY 1
)
SELECT f.cohort_week,
       CAST((CAST(floor(epoch(date_trunc('week', e.ts))) AS BIGINT)
             - CAST(floor(epoch(f.cohort_week)) AS BIGINT)) / (7 * 86400) AS INT) AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES.update(
    {
        "ev_heavy_hitters": {"fn": ev_heavy_hitters, "oracle": EV_HH_SQL},
        "ev_cohort_retention": {"fn": ev_cohort_retention, "oracle": EV_COHORT_SQL},
    }
)


def ev_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch surface (the partner of ev_approx_distinct's
    HLL): per event type, exact DISCRETE p50/p90/p99 (percentile_disc —
    a data value, bit-identical to DuckDB's quantile_disc, no
    interpolation arithmetic to disagree on) alongside a bound check
    that the mergeable approx_percentile sketch (the GK-family operator
    a 100 TB scan would actually run — partial sketches merge map-side,
    no global sort) lands within 5% relative of exact. As with the HLL
    gate, the sketch value itself is engine-specific, so the gate pins
    the exact values and the bound holding — not the sketch
    internals."""
    ev = Tables(spark, sf_dir).events
    aggs = [F.count("*").alias("n")]
    for p in (50, 90, 99):
        aggs.append(
            F.expr(
                f"percentile_disc({p / 100}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"p{p}")
        )
        aggs.append(
            F.expr(f"approx_percentile(value, {p / 100}, 10000)").alias(f"_a{p}")
        )
    per = ev.groupBy("event_type").agg(*aggs)
    ok = None
    for p in (50, 90, 99):
        c = (F.abs(F.col(f"_a{p}") - F.col(f"p{p}")) / F.abs(F.col(f"p{p}"))) < 0.05
        ok = c if ok is None else ok & c
    return per.select(
        "event_type", "n", "p50", "p90", "p99", ok.alias("approx_within_5pct")
    ).orderBy("event_type")


EV_APPROX_Q_SQL = """
SELECT event_type, count(*) AS n,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       quantile_disc(value, 0.99) AS p99,
       true AS approx_within_5pct
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES.update(
    {
        "ev_approx_quantiles": {"fn": ev_approx_quantiles, "oracle": EV_APPROX_Q_SQL},
    }
)


CM_D, CM_W = 4, 512


def ev_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates (operators/sketch.py
    cm_sketch/cm_estimate) for every user, beside the exact counts: the
    sketch is d x w counter sums (mergeable, map-side-combined — the
    shuffle is O(d*w*tasks), never O(keys)), and because the bucket
    hashing is the deterministic md5_60 scheme, the estimates are
    bit-identical in any engine — the oracle rebuilds the SAME sketch in
    SQL. cm_est >= true_n always (deterministic CM guarantee);
    overcount is the collision mass the min didn't cancel."""
    from rearview_spark.operators.sketch import cm_estimate, cm_sketch

    ev = Tables(spark, sf_dir).events
    counters = cm_sketch(ev, "user_id", d=CM_D, w=CM_W)
    truth = ev.groupBy("user_id").agg(F.count("*").alias("true_n"))
    est = cm_estimate(truth.select("user_id"), counters, "user_id", d=CM_D, w=CM_W)
    return (
        truth.join(est, "user_id")
        .select(
            "user_id",
            "true_n",
            "cm_est",
            (F.col("cm_est") - F.col("true_n")).alias("overcount"),
        )
        .orderBy("user_id")
    )


_CM_BUCKET = (
    "CAST(concat('0x', substr(md5(concat(CAST({key} AS VARCHAR), ':cm', "
    f"CAST({{r}} AS VARCHAR))), 1, 15)) AS BIGINT) % {CM_W}"
)

EV_CM_SQL = f"""
WITH rr AS (SELECT unnest(generate_series(0, {CM_D - 1})) AS r),
hashed AS (
  SELECT r, {_CM_BUCKET.format(key='user_id', r='r')} AS b
  FROM events, rr),
counters AS (SELECT r, b, count(*) AS c FROM hashed GROUP BY r, b),
truth AS (SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id),
probes AS (
  SELECT t.user_id, t.true_n, rr.r,
         {_CM_BUCKET.format(key='t.user_id', r='rr.r')} AS b
  FROM truth t, rr)
SELECT p.user_id, p.true_n,
       CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS cm_est,
       CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) - p.true_n AS overcount
FROM probes p LEFT JOIN counters c ON c.r = p.r AND c.b = p.b
GROUP BY p.user_id, p.true_n
ORDER BY user_id
"""


def ev_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled HyperLogLog over event_id (operators/sketch.py
    hll_registers): the full 64-register table plus the raw estimate
    and the exact distinct count. Unlike ev_approx_distinct (which
    bound-checks Spark's built-in engine-specific HLL), every value
    here is oracle-exact: registers are md5-derived integers, and the
    estimate is one double division from an exact bigint
    shift-sum denominator. Registers merge by max — the 100 TB shape
    is per-split register tables max-merged, <= m rows each."""
    from rearview_spark.operators.sketch import (
        HLL_M,
        hll_estimate_expr,
        hll_registers,
    )

    ev = Tables(spark, sf_dir).events
    regs = hll_registers(ev, "event_id", m=HLL_M)
    summary = regs.agg(hll_estimate_expr(HLL_M).alias("hll_estimate")).crossJoin(
        ev.agg(F.countDistinct("event_id").alias("true_distinct"))
    )
    return regs.crossJoin(F.broadcast(summary)).orderBy("bucket")


def _hll_sql() -> str:
    from rearview_spark.operators.sketch import HLL_EST_NUM, HLL_M, hll_rho_case

    md5e = "md5(concat(CAST(event_id AS VARCHAR), ':hll'))"
    return f"""
WITH h AS (
  SELECT CAST(concat('0x', substr({md5e}, 1, 15)) AS BIGINT) % {HLL_M} AS bucket,
         CAST(concat('0x', substr({md5e}, 16, 10)) AS BIGINT) AS x
  FROM events),
r AS (SELECT bucket, {hll_rho_case('x')} AS rho FROM h),
regs0 AS (SELECT bucket, MAX(rho) AS register FROM r GROUP BY bucket),
allb AS (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket),
regs AS (SELECT a.bucket, COALESCE(r0.register, 0) AS register
         FROM allb a LEFT JOIN regs0 r0 ON a.bucket = r0.bucket),
s AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (50 - register)) AS BIGINT) AS denom FROM regs),
t AS (SELECT count(DISTINCT event_id) AS true_distinct FROM events)
SELECT CAST(regs.bucket AS BIGINT) AS bucket, register,
       {HLL_EST_NUM!r} / CAST(denom AS DOUBLE) AS hll_estimate,
       true_distinct
FROM regs, s, t ORDER BY bucket
"""


QUERIES.update(
    {
        "ev_count_min": {"fn": ev_count_min, "oracle": EV_CM_SQL},
        "ev_hll_registers": {"fn": ev_hll_registers, "oracle": _hll_sql()},
    }
)


def ev_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned exact join (operators/bloom.py): filter built over
    high-balance customers' keys, events pruned pre-shuffle by a
    codegen'd md5-bitmask predicate, exact join on survivors. The
    oracle is the PLAIN SQL join — the hash match proves the Bloom
    prune's no-false-negative property end to end (result identical,
    only the shuffled volume shrank). Threshold 7000 keeps the gate
    non-vacuous at EVERY fixture scale (2 rows at sf0.001, 40 at
    sf0.01 — a 9000 cutoff returned zero rows at sf0.001, which would
    have "proved" the property on an empty result)."""
    from rearview_spark.operators.bloom import bloom_semi_join

    t = Tables(spark, sf_dir)
    dim = t.customer.filter(F.col("c_acctbal") > 7000).select(
        "c_custkey", "c_name"
    )
    joined = bloom_semi_join(t.events, dim, "user_id", "c_custkey")
    return (
        joined.groupBy("c_custkey", "c_name")
        .agg(F.count("*").alias("n_events"))
        .orderBy("c_custkey")
    )


EV_BLOOM_SQL = """
SELECT c.c_custkey, c.c_name, count(*) AS n_events
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
WHERE c.c_acctbal > 7000
GROUP BY 1, 2 ORDER BY 1
"""

QUERIES["ev_bloom_prune_join"] = {"fn": ev_bloom_prune_join, "oracle": EV_BLOOM_SQL}


def ev_scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history assembled from the event change stream
    (operators/scd.scd2_from_changes): per user, consecutive-distinct
    event_type runs become versions closed at the next version's start.
    The oracle replays the lag-dedup + lead-close windows."""
    from rearview_spark.operators.scd import scd2_from_changes

    ev = Tables(spark, sf_dir).events.select("user_id", "event_type", "ts")
    return scd2_from_changes(
        ev, key_col="user_id", attr_cols=["event_type"], ts_col="ts"
    ).orderBy("user_id", "valid_from", "event_type")


EV_SCD2_SQL = """
WITH c AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS prev,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_type) AS rn
  FROM events
),
-- rn = 1 marks the first observation (lag NULL is ambiguous between
-- "first row" and "previous attr was NULL"); IS DISTINCT FROM mirrors
-- the operator's null-safe struct comparison on NULL attribute values
v AS (
  SELECT user_id, event_type, ts AS valid_from
  FROM c WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_type) AS valid_to
FROM v
ORDER BY user_id, valid_from, event_type
"""

QUERIES["ev_scd2_user_status"] = {"fn": ev_scd2_user_status, "oracle": EV_SCD2_SQL}


def ev_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding distinct users from MERGED daily HLL sketches
    (operators/sketch.hll_registers_by): one corpus pass builds per-day
    register tables (<= 64 rows/day regardless of event volume), then
    every day's trailing-week estimate is a per-bucket max over the
    window's sketch rows — the mergeable-summaries property driven
    end to end, since at 100 TB the window merge reads 7x64 sketch rows
    per day while the naive form re-scans a week of raw events per day.
    The day x daily-register join below is sketch-sized (days x 64
    rows), never corpus-sized. ``true_distinct`` re-derives the exact
    windowed count from raw events for comparison — the verification
    column a production pipeline would drop. Estimates use the sparse
    denominator (absent bucket = register 0); all arithmetic is exact
    bigint shifts + one double division, so the oracle reproduces every
    value bit-for-bit."""
    from rearview_spark.operators.sketch import (
        HLL_M,
        hll_estimate_sparse_expr,
        hll_registers_by,
    )

    ev = Tables(spark, sf_dir).events.withColumn(
        "day", F.date_trunc("day", "ts")
    )
    # (r16 note: an eager checkpoint of the daily register table was
    # tried — the day list and range-join probe both read it — and
    # measured SLOWER at bench scale than letting both consumers
    # recompute the register pass: the materialization job costs more
    # than the duplicated sketch-sized aggregation saves. Left lazy.)
    daily = hll_registers_by(ev, "user_id", ["day"], m=HLL_M)
    days = daily.select("day").distinct()
    merged = (
        days.alias("d")
        .join(
            daily.alias("r"),
            (F.col("r.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("r.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.bucket").alias("bucket"))
        .agg(F.max("r.register").alias("register"))
    )
    est = merged.groupBy("day").agg(
        hll_estimate_sparse_expr(HLL_M).alias("hll_estimate")
    )
    # distinct (day, user) BEFORE the range join: the day-window
    # nested-loop probe then reads |users|x|days| rows, not raw events
    daily_users = ev.select("day", "user_id").distinct()
    truth = (
        days.alias("d")
        .join(
            daily_users.alias("e"),
            (F.col("e.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("e.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("e.user_id").alias("true_distinct"))
    )
    return est.join(truth, "day").orderBy("day")


def _hll_sliding_sql() -> str:
    from rearview_spark.operators.sketch import HLL_EST_NUM, HLL_M, hll_rho_case

    md5e = "md5(concat(CAST(user_id AS VARCHAR), ':hll'))"
    return f"""
WITH h AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(concat('0x', substr({md5e}, 1, 15)) AS BIGINT) % {HLL_M} AS bucket,
         CAST(concat('0x', substr({md5e}, 16, 10)) AS BIGINT) AS x
  FROM events),
r AS (SELECT day, bucket, {hll_rho_case('x')} AS rho FROM h),
daily AS (SELECT day, bucket, MAX(rho) AS register FROM r GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM daily),
merged AS (
  SELECT d.day, r.bucket, MAX(r.register) AS register
  FROM days d JOIN daily r ON r.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY 1, 2),
est AS (
  SELECT day,
         SUM(CAST(1 AS BIGINT) << (50 - register))
           + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS denom
  FROM merged GROUP BY day),
truth AS (
  SELECT d.day, count(DISTINCT e.user_id) AS true_distinct
  FROM days d JOIN events e ON date_trunc('day', e.ts) BETWEEN d.day - INTERVAL 6 DAY AND d.day
  GROUP BY 1)
SELECT CAST(est.day AS TIMESTAMP) AS day,
       {HLL_EST_NUM!r} / CAST(denom AS DOUBLE) AS hll_estimate,
       truth.true_distinct
FROM est JOIN truth ON est.day = truth.day
ORDER BY est.day
"""


QUERIES["ev_hll_sliding_distinct"] = {
    "fn": ev_hll_sliding_distinct,
    "oracle": _hll_sliding_sql(),
}


def ev_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase within 7 days of the
    first view (operators/behavior.funnel_conversion): first-qualifying
    -event semantics, each stage a user-keyed semi-join aggregate
    reusing the same partitioning. Generalizes (and since r16 subsumes
    — see the RETIRED GATE note) ev_conversion_funnel (inline 3-count,
    strict-after, no deadline):
    arbitrary step lists, a horizon anchored at stage 1, at-or-after
    semantics, and per-stage conversion ratios from ONE job over the
    unioned stage frames. The oracle replays the stage recurrence with
    chained min-aggregate CTEs."""
    from rearview_spark.operators.behavior import funnel_conversion

    ev = Tables(spark, sf_dir).events
    out = funnel_conversion(
        ev, steps=("view", "click", "purchase"), horizon="7 days"
    )
    return out.select(
        "stage",
        "step",
        "n_users",
        F.round(F.col("conversion") + F.lit(5e-10), 6).alias("conversion"),
    ).orderBy("stage")


EV_FUNNEL_STAGES_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t, min(ts) + INTERVAL 7 DAY AS dl
  FROM events WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t, min(s1.dl) AS dl
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t AND e.ts <= s1.dl
  GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t AND e.ts <= s2.dl
  GROUP BY 1),
u AS (
  SELECT 1 AS stage, 'view' AS step, count(*) AS n FROM s1
  UNION ALL SELECT 2, 'click', count(*) FROM s2
  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
SELECT CAST(stage AS INTEGER) AS stage, step, CAST(n AS BIGINT) AS n_users,
       round(n * 1.0 / (SELECT n FROM u WHERE stage = 1) + 0.0000000005, 6)
         AS conversion
FROM u ORDER BY stage
"""


def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix per user sequence
    (operators/behavior.event_transitions): one user-partitioned lead
    window (deterministic ts, event_id ordering), a (src, dst) hash
    aggregate, and row-conditional probabilities from a broadcast of
    the |types|^2-row totals."""
    from rearview_spark.operators.behavior import event_transitions

    ev = Tables(spark, sf_dir).events
    out = event_transitions(ev)
    return out.select(
        "src_type",
        "dst_type",
        "n_transitions",
        F.round(F.col("p") + F.lit(5e-10), 6).alias("p"),
    ).orderBy("src_type", "dst_type")


EV_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst_type
  FROM events),
c AS (
  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2),
t AS (SELECT src_type, CAST(sum(n_transitions) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.src_type, c.dst_type, c.n_transitions,
       round(c.n_transitions * 1.0 / t.tot + 0.0000000005, 6) AS p
FROM c JOIN t USING (src_type) ORDER BY src_type, dst_type
"""


def ev_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-recency multi-touch attribution
    (operators/behavior.multi_touch_attribution): each purchase's value
    split across the same user's clicks in the preceding 30 minutes,
    weighted by integer seconds-of-recency (w = 1800 - dt + 1) — the
    fractional-credit refinement of stream_attribution's full-credit
    interval join. Credit is value * w / total_w, a double
    multiply-divide over identical integers on both engines (no libm
    decay curve)."""
    from rearview_spark.operators.behavior import multi_touch_attribution

    ev = Tables(spark, sf_dir).events
    out = multi_touch_attribution(ev, window_seconds=1800)
    return out.select(
        "conversion_id",
        "touch_id",
        "w",
        F.round(F.col("credit") + F.lit(5e-10), 6).alias("credit"),
    ).orderBy("conversion_id", "touch_id")


EV_DECAY_ATTR_SQL = """
WITH t AS (SELECT user_id, event_id AS touch_id, ts AS touch_ts
           FROM events WHERE event_type = 'click'),
c AS (SELECT user_id, event_id AS conversion_id, ts AS conversion_ts, value
      FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT c.conversion_id, t.touch_id, c.value,
         1800 - (CAST(floor(epoch(c.conversion_ts)) AS BIGINT)
                 - CAST(floor(epoch(t.touch_ts)) AS BIGINT)) + 1 AS w
  FROM c JOIN t ON c.user_id = t.user_id
   AND t.touch_ts <= c.conversion_ts
   AND t.touch_ts >= c.conversion_ts - INTERVAL 30 MINUTE),
tot AS (SELECT conversion_id, CAST(sum(w) AS BIGINT) AS tw FROM j GROUP BY 1)
SELECT j.conversion_id, j.touch_id, CAST(j.w AS BIGINT) AS w,
       round(j.value * j.w / tot.tw + 0.0000000005, 6) AS credit
FROM j JOIN tot USING (conversion_id)
ORDER BY conversion_id, touch_id
"""


def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles per
    user) built on the distributed ntile machinery the deciles rewrite
    introduced (_util.global_row_number + ntile_from_row_number, r11):
    three range-partitioned rank passes over the USERS-sized frame —
    never a partition-less window — each followed by the closed-form
    SQL-standard ntile. Monetary is exact integer cents so the quartile
    ORDER (and therefore every boundary assignment) is bit-identical
    across engines; tile 1 = best (most recent / most frequent /
    highest spend). The oracle is the plain ntile(4) window form — the
    hash match proves the closed form equals the textbook semantics on
    all three dimensions at once."""
    from rearview_spark.operators._util import (
        global_row_number,
        ntile_from_row_number,
    )

    ev = Tables(spark, sf_dir).events
    u = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("spend_cents"),
    )
    orders = {
        "r": F.col("last_ts").desc(),
        "f": F.col("n_events").desc(),
        "m": F.col("spend_cents").desc(),
    }
    for dim, order in orders.items():
        u, n = global_row_number(u, [order, F.col("user_id")], out_col=f"_{dim}_rn")
        u = u.withColumn(
            f"{dim}_tile", ntile_from_row_number(F.col(f"_{dim}_rn"), n, 4)
        ).drop(f"_{dim}_rn")
    return u.select(
        "user_id",
        "r_tile",
        "f_tile",
        "m_tile",
        F.concat(
            F.col("r_tile").cast("string"),
            F.col("f_tile").cast("string"),
            F.col("m_tile").cast("string"),
        ).alias("segment"),
    ).orderBy("user_id")


EV_RFM_SQL = """
WITH u AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS n_events,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS spend_cents
  FROM events GROUP BY 1),
s AS (
  SELECT user_id,
         CAST(ntile(4) OVER (ORDER BY last_ts DESC, user_id) AS INTEGER) AS r_tile,
         CAST(ntile(4) OVER (ORDER BY n_events DESC, user_id) AS INTEGER) AS f_tile,
         CAST(ntile(4) OVER (ORDER BY spend_cents DESC, user_id) AS INTEGER) AS m_tile
  FROM u)
SELECT user_id, r_tile, f_tile, m_tile,
       CAST(r_tile AS VARCHAR) || CAST(f_tile AS VARCHAR) || CAST(m_tile AS VARCHAR)
         AS segment
FROM s ORDER BY user_id
"""


# Staged for later registration (r12 window arithmetic in
# plans/__init__.py: r13's window is exactly filled by the two
# PENDING gates staged before these plus the r08/r09 rotation, so the
# behavior trio + ev_rfm_segments register r14 (4 never-checked
# + 46 stalest = 50 exactly); oracle-green via
# tests/test_pending_gates.py meanwhile).
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 most frequent 3-event journeys across all user sequences
    (operators/behavior.top_paths): sliding trigrams over each user's
    (ts, event_id)-ordered events, counted and ranked with the
    distributed orderBy().limit() top-k — the longer-window companion
    to ev_transition_matrix."""
    from rearview_spark.operators.behavior import top_paths

    ev = Tables(spark, sf_dir).events
    return top_paths(ev, length=3, k=25)


EV_TOP_PATHS_SQL = """
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n_paths
  FROM seq WHERE e3 IS NOT NULL GROUP BY 1
)
SELECT path, n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, path) AS INTEGER) AS rank
FROM paths
ORDER BY n_paths DESC, path
LIMIT 25
"""


PENDING_QUERIES: dict[str, dict] = {
    "ev_top_paths": {"fn": ev_top_paths, "oracle": EV_TOP_PATHS_SQL},
    "ev_funnel_stages": {"fn": ev_funnel_stages, "oracle": EV_FUNNEL_STAGES_SQL},
    "ev_transition_matrix": {"fn": ev_transition_matrix, "oracle": EV_TRANSITIONS_SQL},
    "ev_decay_attribution": {"fn": ev_decay_attribution, "oracle": EV_DECAY_ATTR_SQL},
    "ev_rfm_segments": {"fn": ev_rfm_segments, "oracle": EV_RFM_SQL},
}


def ev_hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types from MERGED HLL
    sketches — the classic segment-overlap read (inclusion-exclusion:
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B), where the union estimate
    is just the per-bucket max of the two register tables — the
    mergeable-summaries property again). One corpus pass builds the
    per-type sketches (≤ 64 rows each); every pairwise computation
    after that is arithmetic over sketch rows — at 100 TB, computing
    all O(segments^2) overlaps never re-touches raw events.
    ``true_overlap`` re-derives the exact intersection for comparison
    (the verification column a production run drops). All register
    arithmetic is exact bigint; estimates are one double division
    each and the overlap a fixed-order sum — bit-replayable."""
    from rearview_spark.operators.sketch import (
        HLL_M,
        hll_estimate_sparse_expr,
        hll_registers_by,
    )

    ev = Tables(spark, sf_dir).events
    regs = hll_registers_by(ev, "user_id", ["event_type"], m=HLL_M)
    est = regs.groupBy("event_type").agg(
        hll_estimate_sparse_expr(HLL_M).alias("est")
    )
    ta = est.select(
        F.col("event_type").alias("type_a"), F.col("est").alias("est_a")
    )
    tb = est.select(
        F.col("event_type").alias("type_b"), F.col("est").alias("est_b")
    )
    pairs = ta.join(tb, F.col("type_a") < F.col("type_b"))
    union_regs = (
        pairs.select("type_a", "type_b")
        .join(
            regs,
            (regs["event_type"] == F.col("type_a"))
            | (regs["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("register").alias("register"))
    )
    est_union = union_regs.groupBy("type_a", "type_b").agg(
        hll_estimate_sparse_expr(HLL_M).alias("est_union")
    )
    users = ev.select("event_type", "user_id").distinct()
    ua = users.select(
        F.col("event_type").alias("type_a"), F.col("user_id").alias("u")
    )
    ub = users.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("u")
    )
    truth = (
        ua.join(ub, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.countDistinct("u").alias("true_overlap"))
    )
    return (
        pairs.join(est_union, ["type_a", "type_b"])
        .join(truth, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_overlap"
            ),
            "true_overlap",
        )
        .orderBy("type_a", "type_b")
    )


def _hll_overlap_sql() -> str:
    from rearview_spark.operators.sketch import HLL_EST_NUM, HLL_M, hll_rho_case

    md5e = "md5(concat(CAST(user_id AS VARCHAR), ':hll'))"
    return f"""
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr({md5e}, 1, 15)) AS BIGINT) % {HLL_M} AS bucket,
         CAST(concat('0x', substr({md5e}, 16, 10)) AS BIGINT) AS x
  FROM events),
r AS (SELECT event_type, bucket, {hll_rho_case('x')} AS rho FROM h),
regs AS (SELECT event_type, bucket, MAX(rho) AS register FROM r GROUP BY 1, 2),
est AS (
  SELECT event_type,
         {HLL_EST_NUM!r} / CAST(
           SUM(CAST(1 AS BIGINT) << (50 - register))
           + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS DOUBLE) AS est
  FROM regs GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.est AS est_a, b.est AS est_b
  FROM est a JOIN est b ON a.event_type < b.event_type),
union_est AS (
  SELECT p.type_a, p.type_b,
         {HLL_EST_NUM!r} / CAST(
           SUM(CAST(1 AS BIGINT) << (50 - register))
           + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS DOUBLE) AS est_union
  FROM (
    SELECT pp.type_a, pp.type_b, r.bucket, MAX(r.register) AS register
    FROM (SELECT type_a, type_b FROM pairs) pp
    JOIN regs r ON r.event_type = pp.type_a OR r.event_type = pp.type_b
    GROUP BY 1, 2, 3) p
  GROUP BY p.type_a, p.type_b),
users AS (SELECT DISTINCT event_type, user_id FROM events),
truth AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(DISTINCT a.user_id) AS true_overlap
  FROM users a JOIN users b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.est_a, p.est_b, u.est_union,
       p.est_a + p.est_b - u.est_union AS est_overlap,
       t.true_overlap
FROM pairs p
JOIN union_est u ON p.type_a = u.type_a AND p.type_b = u.type_b
JOIN truth t ON p.type_a = t.type_a AND p.type_b = t.type_b
ORDER BY p.type_a, p.type_b
"""


PENDING_QUERIES["ev_hll_audience_overlap"] = {
    "fn": ev_hll_audience_overlap,
    "oracle": _hll_overlap_sql(),
}


def ev_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user active time from overlapping 30-minute activity windows
    (operators/behavior.interval_union_time): each event opens a
    [ts, ts+30min) interval; the union length is the user's genuinely
    covered time — what a naive SUM of window lengths double-counts
    wherever events cluster. Exact integer gaps-and-islands; the
    oracle replays both window frames and both aggregates."""
    from rearview_spark.operators.behavior import interval_union_time

    ev = Tables(spark, sf_dir).events
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + F.lit(1800)).alias("end"),
    )
    return interval_union_time(iv, "user_id").orderBy("user_id")


EV_ACTIVE_TIME_SQL = """
WITH iv AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS e
  FROM events),
f AS (
  SELECT user_id, s, e,
         CASE WHEN s > coalesce(
                max(e) OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -4611686018427387904)
              THEN 1 ELSE 0 END AS ni
  FROM iv),
g AS (
  SELECT user_id, s, e,
         sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM f),
isl AS (
  SELECT user_id, island, max(e) - min(s) AS len FROM g GROUP BY 1, 2)
SELECT user_id, count(*) AS n_islands,
       CAST(sum(len) AS BIGINT) AS covered_seconds
FROM isl GROUP BY user_id ORDER BY user_id
"""

PENDING_QUERIES["ev_active_time"] = {
    "fn": ev_active_time,
    "oracle": EV_ACTIVE_TIME_SQL,
}


def ev_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the event value distribution,
    first half of the time range vs second (operators/anomaly.psi_drift):
    the standard ML-monitoring drift score, with discrete-percentile
    bin edges (engine-exact data values), CASE-chain bin assignment,
    and 1e-9-quantized summands so the oracle sums identical integers.
    Bins empty in BOTH periods are absent from both engines alike
    (documented deviation from the textbook constant-bin sum)."""
    from rearview_spark.operators.anomaly import psi_drift

    ev = Tables(spark, sf_dir).events
    return psi_drift(ev, "value", "ts", bins=10)


def _psi_sql() -> str:
    edges = ", ".join(
        f"quantile_disc(v, {k / 10}) AS e{k}" for k in range(1, 10)
    )
    case = "CASE " + " ".join(
        f"WHEN v <= (SELECT e{k} FROM e) THEN {k - 1}" for k in range(1, 10)
    ) + " ELSE 9 END"
    return f"""
WITH v AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, value AS v
  FROM events WHERE value IS NOT NULL),
rng AS (SELECT (min(t) + max(t)) // 2 AS mid FROM v),
base AS (SELECT v.v FROM v, rng WHERE v.t <= rng.mid),
cur  AS (SELECT v.v FROM v, rng WHERE v.t >  rng.mid),
e AS (SELECT {edges} FROM base),
ob AS (SELECT {case} AS bin, count(*) AS c_base FROM base GROUP BY 1),
oc AS (SELECT {case} AS bin, count(*) AS c_cur  FROM cur  GROUP BY 1),
occ AS (
  SELECT coalesce(ob.bin, oc.bin) AS bin,
         coalesce(c_base, 0) AS c_base, coalesce(c_cur, 0) AS c_cur
  FROM ob FULL OUTER JOIN oc ON ob.bin = oc.bin),
tot AS (SELECT sum(c_base) AS nb, sum(c_cur) AS nc FROM occ),
u AS (
  SELECT CAST(round(
           ((c_cur + 1) / CAST(nc + 10 AS DOUBLE)
              - (c_base + 1) / CAST(nb + 10 AS DOUBLE))
           * ln(((c_cur + 1) / CAST(nc + 10 AS DOUBLE))
                / ((c_base + 1) / CAST(nb + 10 AS DOUBLE)))
           * 1000000000.0) AS BIGINT) AS term
  FROM occ, tot)
SELECT (SELECT CAST(nb AS BIGINT) FROM tot) AS n_base,
       (SELECT CAST(nc AS BIGINT) FROM tot) AS n_cur,
       CAST(sum(term) AS BIGINT) / 1000000000.0 AS psi
FROM u
"""


PENDING_QUERIES["ev_psi_drift"] = {"fn": ev_psi_drift, "oracle": _psi_sql()}


def ev_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the view -> purchase funnel:
    each user's FIRST view, their first purchase at-or-after it, and
    the exact latency quartiles over converted users (percentile_disc —
    data values, engine-exact) plus integer min/max. The per-user stage
    times are two min-aggregates re-joined on the user key (the
    funnel_conversion shape); the summary is one row."""
    ev = Tables(spark, sf_dir).events
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("long")).alias("t_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("long").alias("t_p")
    )
    conv = (
        purchases.join(views, "user_id")
        .filter(F.col("t_p") >= F.col("t_view"))
        .groupBy("user_id")
        .agg((F.min("t_p") - F.first("t_view")).alias("latency_s"))
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("latency_s").alias("min_s"),
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_s)"
        ).cast("long").alias("p25_s"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s)"
        ).cast("long").alias("p50_s"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s)"
        ).cast("long").alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    )


EV_FUNNEL_LATENCY_SQL = """
WITH views AS (
  SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id),
conv AS (
  SELECT e.user_id,
         min(CAST(floor(epoch(e.ts)) AS BIGINT)) - any_value(v.t_view) AS latency_s
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase'
    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= v.t_view
  GROUP BY e.user_id)
SELECT count(*) AS n_converted,
       min(latency_s) AS min_s,
       quantile_disc(latency_s, 0.25) AS p25_s,
       quantile_disc(latency_s, 0.5) AS p50_s,
       quantile_disc(latency_s, 0.9) AS p90_s,
       max(latency_s) AS max_s
FROM conv
"""

PENDING_QUERIES["ev_funnel_latency"] = {
    "fn": ev_funnel_latency,
    "oracle": EV_FUNNEL_LATENCY_SQL,
}


def ev_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity (operators/behavior.peak_concurrency):
    the maximum number of simultaneously open 30-minute activity
    windows across ALL users, and the earliest second it is reached —
    sweep-line deltas through the distributed global running sum (the
    sum-shaped sibling of global_row_number), so no partition-less
    window anywhere. The oracle replays the sweep with a plain ordered
    window cumsum."""
    from rearview_spark.operators.behavior import peak_concurrency

    ev = Tables(spark, sf_dir).events
    iv = ev.select(
        "event_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + F.lit(1800)).alias("end"),
    )
    return peak_concurrency(iv, "start", "end", "event_id")


EV_PEAK_CONC_SQL = """
WITH d AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, 1 AS d, event_id FROM events
  UNION ALL
  SELECT CAST(floor(epoch(ts)) AS BIGINT) + 1800, -1, event_id FROM events),
r AS (
  SELECT t, sum(d) OVER (ORDER BY t, d, event_id ROWS UNBOUNDED PRECEDING) AS conc
  FROM d)
SELECT CAST(max(conc) AS BIGINT) AS peak_concurrency,
       min(CASE WHEN conc = (SELECT max(conc) FROM r) THEN t END) AS at_s
FROM r
"""

PENDING_QUERIES["ev_peak_concurrency"] = {
    "fn": ev_peak_concurrency,
    "oracle": EV_PEAK_CONC_SQL,
}

# r13 registration (VERDICT_r12 next-round #1): the staged backlog flips
# live in one move. Never-driver-checked names front-load automatically via
# group (c) in plans/all_queries(), so each gets a first driver row this
# round; the window's remaining slots rotate the stalest green cohort.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


# RETIRED GATES (r16, VERDICT_r15 next-round #5): ev_ks_drift and its
# streaming twin stream_ks_drift — the ungrouped half-vs-half KS pair;
# ev_ks_drift_by_type / stream_ks_drift_by_type keep the SAME split,
# exact integer numerators, argmax tie rule, and ADD-merge foreachBatch
# state driver-checked in segmented form (ks_two_sample_by over a
# constant key IS ks_two_sample). Coverage of the ungrouped operators
# inherits to tests/test_properties.py::
# test_ks_two_sample_matches_scipy_style_bruteforce (brute-force D over
# random pairs) and tests/test_streaming.py::
# test_ks_foreach_batch_replay_and_batch_equality (three-slice replay +
# retried-batch idempotence against the batch operator).


def ev_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B z-test (operators/stats.two_proportion_ztest):
    users split 50/50 by the repo's deterministic md5 bucket (rerun-
    stable, no RNG — the stratified_sample scheme), conversion = the
    user ever made a BIG-TICKET purchase (value > 150 — every user has
    some purchase in this dataset, so plain purchase incidence is
    degenerate and would pin z at NULL; the threshold splits ~45/55 and
    exercises the full statistic). The per-USER collapse happens
    before the test (events would over-power it); counts exact int64,
    rates single divisions, z one fixed double tree mirrored in the
    oracle."""
    from rearview_spark.operators.dedup import md5_bucket
    from rearview_spark.operators.stats import two_proportion_ztest

    ev = Tables(spark, sf_dir).events
    # coalesce per ROW: a NULL value makes the conjunction NULL, and a
    # user whose rows are all NULL-valued purchases would max() to NULL
    # and trip the 0/1 guard while the oracle's CASE reads 0
    users = ev.groupBy("user_id").agg(
        F.max(
            F.coalesce(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150)
                ).cast("int"),
                F.lit(0),
            )
        ).alias("converted")
    )
    assigned = users.select(
        (md5_bucket(F.col("user_id"), "ab-exp") % 2).cast("int").alias("grp"),
        "converted",
    )
    return two_proportion_ztest(assigned, "grp", "converted")


EV_AB_SQL = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1),
a AS (
  SELECT CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || ':ab-exp'), 1, 15)) AS BIGINT)
              % 10000 % 2 AS INT) AS grp,
         converted
  FROM u),
c AS (
  SELECT CAST(sum(1 - grp) AS BIGINT) AS n0,
         CAST(sum(grp) AS BIGINT) AS n1,
         CAST(sum((1 - grp) * converted) AS BIGINT) AS conv0,
         CAST(sum(grp * converted) AS BIGINT) AS conv1
  FROM a)
SELECT n0, n1, conv0, conv1,
       CASE WHEN n0 > 0 THEN CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE) END AS rate0,
       CASE WHEN n1 > 0 THEN CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS rate1,
       CASE WHEN n0 > 0 AND n1 > 0
            THEN CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       END AS diff,
       CASE WHEN n0 > 0 AND n1 > 0 AND conv0 + conv1 > 0
                 AND conv0 + conv1 < n0 + n1
            THEN (CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / sqrt((CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 - CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
       END AS z
FROM c
"""

QUERIES["ev_ab_ztest"] = {"fn": ev_ab_ztest, "oracle": EV_AB_SQL}


def ev_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-purchase after signup
    (operators/stats.kaplan_meier): per user, duration = first purchase
    minus first signup (observed) or window end minus signup (right-
    censored; purchases that precede the signup are noise, censored
    too). The survival product runs in log space as 1e-9-quantized
    int64 sums with one exp per output row at the nudged-6dp edge;
    n_risk/d/c are exact."""
    from rearview_spark.operators.stats import kaplan_meier

    ev = Tables(spark, sf_dir).events
    e = ev.select(
        "user_id", "event_type", F.col("ts").cast("long").alias("tt")
    )
    pu = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("tt"))
        ).alias("s"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("tt"))
        ).alias("p"),
    )
    wend = e.agg(F.max("tt").alias("wend"))
    observed = F.col("p").isNotNull() & (F.col("p") >= F.col("s"))
    base = (
        pu.filter(F.col("s").isNotNull())
        .crossJoin(F.broadcast(wend))
        .select(
            F.when(observed, F.col("p") - F.col("s"))
            .otherwise(F.col("wend") - F.col("s"))
            .alias("dur"),
            F.when(observed, F.lit(1)).otherwise(F.lit(0)).alias("evt"),
        )
    )
    return kaplan_meier(base, "dur", "evt")


EV_KM_SQL = """
WITH e AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS tt
  FROM events),
pu AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN tt END) AS s,
         min(CASE WHEN event_type = 'purchase' THEN tt END) AS p
  FROM e GROUP BY 1),
mx AS (SELECT max(tt) AS wend FROM e),
base AS (
  SELECT CASE WHEN p IS NOT NULL AND p >= s THEN p - s ELSE wend - s END AS t,
         CASE WHEN p IS NOT NULL AND p >= s THEN 1 ELSE 0 END AS evt
  FROM pu, mx WHERE s IS NOT NULL),
per_t AS (
  SELECT t, sum(evt) AS d, sum(1 - evt) AS c, count(*) AS dc
  FROM base GROUP BY 1),
cum AS (
  SELECT t, d, c,
         sum(dc) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_dc,
         sum(dc) OVER () AS n, dc
  FROM per_t),
steps AS (
  SELECT t, d, c, n - (cum_dc - dc) AS n_risk
  FROM cum WHERE d > 0),
u AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d < n_risk
              THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE))
                              * 1000000000.0) AS BIGINT)
              ELSE 0 END AS un
  FROM steps),
s2 AS (
  SELECT t, d, c, n_risk,
         sum(un) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum_u
  FROM u)
SELECT CAST(t AS BIGINT) AS t,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d,
       CAST(c AS BIGINT) AS c,
       CASE WHEN d = n_risk THEN 0.0
            ELSE round(exp(cum_u / 1000000000.0) + 0.0000000005, 6)
       END AS survival
FROM s2 ORDER BY t
"""

QUERIES["ev_km_survival"] = {"fn": ev_km_survival, "oracle": EV_KM_SQL}


def ev_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Fano factor over hourly arrival counts
    (operators/behavior.burstiness_fano): dispersion of the hourly
    grid INCLUDING empty hours (via the closed-form bucket count), so
    burstiness is never deflated. Exact int64 count moments; mean and
    Fano are fixed double expressions mirrored in the oracle."""
    from rearview_spark.operators.behavior import burstiness_fano

    return burstiness_fano(Tables(spark, sf_dir).events)


EV_BURST_SQL = """
WITH base AS (
  SELECT event_type AS kind,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket
  FROM events),
rng AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM base),
per_b AS (SELECT kind, bucket, count(*) AS k FROM base GROUP BY 1, 2),
m AS (
  SELECT kind, CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk
  FROM per_b GROUP BY 1)
SELECT kind,
       CAST(hi - lo + 1 AS BIGINT) AS n_buckets,
       sk AS n_events,
       CAST(sk AS DOUBLE) / CAST(hi - lo + 1 AS DOUBLE) AS mean_per_bucket,
       CASE WHEN sk > 0
            THEN (CAST(hi - lo + 1 AS DOUBLE) * CAST(skk AS DOUBLE)
                  - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                 / (CAST(hi - lo + 1 AS DOUBLE) * CAST(sk AS DOUBLE))
       END AS fano
FROM m, rng ORDER BY kind
"""

# Staged for r14 alongside the text-forensics pair (window-full rule).
PENDING_QUERIES["ev_burstiness"] = {"fn": ev_burstiness, "oracle": EV_BURST_SQL}


def ev_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO error-budget burn (operators/anomaly.slo_burn_rate):
    hourly error rate of the event stream over 1h and 6h trailing
    windows normalized by a 25% budget, paging when BOTH exceed 1 —
    the SRE alerting rule in the reference's own domain. Dense
    calendar grid, prefix-sum differences (never a rolling window),
    exact counts, mirrored single-division burns."""
    from rearview_spark.operators.anomaly import slo_burn_rate

    ev = Tables(spark, sf_dir).events
    return slo_burn_rate(ev, budget=0.25)


EV_SLO_SQL = """
WITH base AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e
  FROM events),
counts AS (SELECT bucket, count(*) AS n, sum(e) AS err FROM base GROUP BY 1),
rng AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM counts),
grid AS (SELECT unnest(generate_series(rng.lo, rng.hi)) AS bucket FROM rng),
dense AS (
  SELECT g.bucket, coalesce(c.n, 0) AS n, coalesce(c.err, 0) AS err
  FROM grid g LEFT JOIN counts c USING (bucket)),
cum AS (
  SELECT bucket, n, err,
         sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
         sum(err) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_err
  FROM dense),
s AS (
  SELECT a.bucket, a.cum_n - coalesce(b.cum_n, 0) AS n_short,
         a.cum_err - coalesce(b.cum_err, 0) AS err_short
  FROM cum a LEFT JOIN cum b ON b.bucket = a.bucket - 1
  CROSS JOIN rng WHERE a.bucket - rng.lo >= 0),
l AS (
  SELECT a.bucket, a.cum_n - coalesce(b.cum_n, 0) AS n_long,
         a.cum_err - coalesce(b.cum_err, 0) AS err_long
  FROM cum a LEFT JOIN cum b ON b.bucket = a.bucket - 6
  CROSS JOIN rng WHERE a.bucket - rng.lo >= 5),
j AS (SELECT s.bucket, n_short, err_short, n_long, err_long
      FROM s JOIN l ON s.bucket = l.bucket)
SELECT bucket,
       CAST(n_short AS BIGINT) AS n_short,
       CAST(err_short AS BIGINT) AS err_short,
       CAST(n_long AS BIGINT) AS n_long,
       CAST(err_long AS BIGINT) AS err_long,
       CASE WHEN n_short > 0
            THEN (CAST(err_short AS DOUBLE) / CAST(n_short AS DOUBLE)) / 0.25
       END AS burn_short,
       CASE WHEN n_long > 0
            THEN (CAST(err_long AS DOUBLE) / CAST(n_long AS DOUBLE)) / 0.25
       END AS burn_long,
       coalesce(CASE WHEN n_short > 0
                     THEN (CAST(err_short AS DOUBLE) / CAST(n_short AS DOUBLE)) / 0.25
                END > 1.0, false)
         AND coalesce(CASE WHEN n_long > 0
                           THEN (CAST(err_long AS DOUBLE) / CAST(n_long AS DOUBLE)) / 0.25
                      END > 1.0, false) AS page
FROM j ORDER BY bucket
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["ev_slo_burn"] = {"fn": ev_slo_burn, "oracle": EV_SLO_SQL}


def ev_funnel_by_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion split by experiment variant — the composition
    an A/B launch is actually judged on (did the treatment move the
    FUNNEL, not just one rate): the deterministic md5 50/50 user split
    (the ev_ab_ztest scheme), operators/behavior.funnel_conversion per
    variant over view -> click -> purchase, stage-joined side by side.
    Counts exact; each conversion is the funnel's single division;
    the uplift column divides the two deterministic doubles, mirrored
    op-for-op."""
    from rearview_spark.operators.behavior import funnel_conversion
    from rearview_spark.operators.dedup import md5_bucket

    ev = Tables(spark, sf_dir).events
    grp = (md5_bucket(F.col("user_id"), "ab-exp") % 2).cast("int")
    tagged = ev.withColumn("_grp", grp)
    steps = ("view", "click", "purchase")
    f0 = funnel_conversion(tagged.filter(F.col("_grp") == 0), steps).select(
        "stage",
        "step",
        F.col("n_users").alias("n_control"),
        F.col("conversion").alias("conv_control"),
    )
    f1 = funnel_conversion(tagged.filter(F.col("_grp") == 1), steps).select(
        "stage",
        F.col("n_users").alias("n_treatment"),
        F.col("conversion").alias("conv_treatment"),
    )
    return (
        f0.join(f1, "stage")
        .select(
            "stage",
            "step",
            "n_control",
            "conv_control",
            "n_treatment",
            "conv_treatment",
            (F.col("conv_treatment") / F.col("conv_control")).alias("uplift"),
        )
        .orderBy("stage")
    )


EV_FUNNEL_VARIANT_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events),
g AS (
  SELECT user_id,
         CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR) || ':ab-exp'), 1, 15)) AS BIGINT)
              % 10000 % 2 AS INT) AS grp
  FROM u),
e AS (
  SELECT ev.user_id, g.grp, ev.event_type, ev.ts
  FROM events ev JOIN g ON ev.user_id = g.user_id),
s1 AS (
  SELECT user_id, grp, min(ts) AS t
  FROM e WHERE event_type = 'view' GROUP BY 1, 2),
s2 AS (
  SELECT e.user_id, s1.grp, min(e.ts) AS t
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1, 2),
s3 AS (
  SELECT e.user_id, s2.grp, min(e.ts) AS t
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1, 2),
staged AS (
  SELECT 1 AS stage, 'view' AS step, grp, user_id FROM s1
  UNION ALL SELECT 2, 'click', grp, user_id FROM s2
  UNION ALL SELECT 3, 'purchase', grp, user_id FROM s3),
counts AS (
  SELECT stage, step, grp, count(*) AS n FROM staged GROUP BY 1, 2, 3),
base AS (
  SELECT grp, n AS n1 FROM counts WHERE stage = 1),
c AS (
  SELECT counts.stage, counts.step, counts.grp,
         CAST(counts.n AS BIGINT) AS n,
         counts.n * 1.0 / base.n1 AS conversion
  FROM counts JOIN base ON counts.grp = base.grp)
SELECT a.stage AS stage, a.step AS step,
       a.n AS n_control, a.conversion AS conv_control,
       b.n AS n_treatment, b.conversion AS conv_treatment,
       b.conversion / a.conversion AS uplift
FROM c a JOIN c b ON a.stage = b.stage AND a.grp = 0 AND b.grp = 1
ORDER BY a.stage
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["ev_funnel_by_variant"] = {
    "fn": ev_funnel_by_variant,
    "oracle": EV_FUNNEL_VARIANT_SQL,
}


def ev_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KS drift (operators/anomaly.ks_two_sample_by):
    the WHICH-slice-drifted drilldown of the retired ev_ks_drift gate's
    ungrouped statistic, same half-vs-half
    split and exact integer numerators, one row per event type."""
    from rearview_spark.operators.anomaly import ks_two_sample_by

    ev = Tables(spark, sf_dir).events
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.col("ts").cast("long").alias("t"),
        F.col("value").alias("v"),
    )
    rng = v.agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    grp = v.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "v",
        (F.col("t") > F.expr("(lo + hi) div 2")).cast("int").alias("grp"),
    )
    return ks_two_sample_by(grp, "v", "grp", "event_type")


EV_KS_BY_SQL = """
WITH v AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, value AS v
  FROM events WHERE value IS NOT NULL),
rng AS (SELECT min(t) AS lo, max(t) AS hi FROM v),
g AS (
  SELECT v.event_type AS key, v.v,
         CASE WHEN v.t > (rng.lo + rng.hi) // 2 THEN 1 ELSE 0 END AS grp
  FROM v, rng),
per_v AS (
  SELECT key, v, sum(1 - grp) AS ca, sum(grp) AS cb FROM g GROUP BY 1, 2),
cum AS (
  SELECT key, v,
         sum(ca) OVER (PARTITION BY key ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum_a,
         sum(cb) OVER (PARTITION BY key ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum_b,
         sum(ca) OVER (PARTITION BY key) AS n_a,
         sum(cb) OVER (PARTITION BY key) AS n_b
  FROM per_v),
d AS (
  SELECT key, v, n_a, n_b,
         abs(cum_a * n_b - cum_b * n_a) AS dn
  FROM cum)
SELECT key,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(max(dn) AS BIGINT) AS d_num,
       CASE WHEN max(n_a) > 0 AND max(n_b) > 0
            THEN CAST(max(dn) AS DOUBLE)
                 / (CAST(max(n_a) AS DOUBLE) * CAST(max(n_b) AS DOUBLE))
       END AS d_stat,
       (SELECT min(v) FROM d d2
        WHERE d2.key = d.key AND d2.dn = (SELECT max(dn) FROM d d3
                                          WHERE d3.key = d.key)) AS at_value
FROM d GROUP BY key ORDER BY key
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["ev_ks_drift_by_type"] = {
    "fn": ev_ks_drift_by_type,
    "oracle": EV_KS_BY_SQL,
}


def ev_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness (operators/behavior.stickiness_dau_wau):
    exact trailing-week distinct actives via the constant-factor
    contribution explode (never a sliding distinct window), dense
    calendar grid, full windows only. The exact companion to the
    HLL sliding-distinct gate."""
    from rearview_spark.operators.behavior import stickiness_dau_wau

    return stickiness_dau_wau(Tables(spark, sf_dir).events)


EV_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
contrib AS (
  SELECT DISTINCT u, day + d.d AS day
  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS d) d),
wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY 1),
rng AS (SELECT min(day) AS lo, max(day) AS hi FROM dau),
grid AS (
  SELECT unnest(generate_series(rng.lo + 6, rng.hi)) AS day FROM rng)
SELECT g.day AS day,
       CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
       CAST(coalesce(wau.wau, 0) AS BIGINT) AS wau,
       CASE WHEN coalesce(wau.wau, 0) > 0
            THEN CAST(coalesce(dau.dau, 0) AS DOUBLE)
                 / CAST(coalesce(wau.wau, 0) AS DOUBLE)
       END AS stickiness
FROM grid g
LEFT JOIN dau ON g.day = dau.day
LEFT JOIN wau ON g.day = wau.day
ORDER BY g.day
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["ev_stickiness"] = {
    "fn": ev_stickiness,
    "oracle": EV_STICKINESS_SQL,
}

# r14 flip (VERDICT_r13 next-round #1): every staged gate registers —
# the window arithmetic is 16 first-ever checks + 34 stale rotations.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def ev_retention_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention RATE triangle over the events table
    (operators/behavior.cohort_retention): users cohort by first
    active epoch-week; each (cohort, offset) cell carries the cohort
    size and the retention rate (ONE division of exact distinct
    counts). Complements the long-registered ev_cohort_retention gate
    (the raw count triangle over date_trunc weeks): this one is the
    rate read a dashboard plots, on integer epoch-week buckets with
    the negative-epoch guard, through the reusable operator rather
    than inline plan code."""
    from rearview_spark.operators.behavior import cohort_retention

    return cohort_retention(Tables(spark, sf_dir).events)


EV_RETENTION_RATES_SQL = """
WITH ub AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS bucket
  FROM events),
coh AS (SELECT u, min(bucket) AS cohort_bucket FROM ub GROUP BY u),
sizes AS (
  SELECT cohort_bucket, count(*) AS cohort_size FROM coh GROUP BY 1),
cells AS (
  SELECT c.cohort_bucket, ub.bucket - c.cohort_bucket AS week_offset
  FROM ub JOIN coh c USING (u)),
cnt AS (
  SELECT cohort_bucket, week_offset, count(*) AS n_active
  FROM cells GROUP BY 1, 2)
SELECT cnt.cohort_bucket, cnt.week_offset,
       CAST(sizes.cohort_size AS BIGINT) AS cohort_size,
       CAST(cnt.n_active AS BIGINT) AS n_active,
       CAST(cnt.n_active AS DOUBLE) / CAST(sizes.cohort_size AS DOUBLE)
         AS retention
FROM cnt JOIN sizes USING (cohort_bucket)
ORDER BY 1, 2
"""

PENDING_QUERIES["ev_retention_rates"] = {
    "fn": ev_retention_rates,
    "oracle": EV_RETENTION_RATES_SQL,
}


def ev_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-concentration deciles by user
    (operators/behavior.pareto_share): how much of total event traffic
    the heaviest user deciles produce — the hot-key budget read."""
    from rearview_spark.operators.behavior import pareto_share

    return pareto_share(Tables(spark, sf_dir).events, key_col="user_id")


EV_PARETO_SQL = """
WITH pk AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
r AS (
  SELECT k, cnt,
         row_number() OVER (ORDER BY cnt DESC, k ASC) AS rn,
         count(*) OVER () AS nk
  FROM pk),
b AS (
  SELECT ((rn - 1) * 10) // nk AS bucket,
         count(*) AS n_keys, sum(cnt) AS n_rows
  FROM r GROUP BY 1),
c AS (
  SELECT bucket, n_keys, n_rows,
         sum(n_keys) OVER (ORDER BY bucket) AS cum_keys,
         sum(n_rows) OVER (ORDER BY bucket) AS cum_rows,
         sum(n_rows) OVER () AS tot
  FROM b)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(cum_keys AS BIGINT) AS cum_keys,
       CAST(cum_rows AS BIGINT) AS cum_rows,
       CAST(cum_rows AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
FROM c ORDER BY bucket
"""

PENDING_QUERIES["ev_pareto_share"] = {
    "fn": ev_pareto_share,
    "oracle": EV_PARETO_SQL,
}


def ev_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival gap statistics
    (operators/behavior.interarrival_summary): median/p90/max/mean
    seconds between one user's consecutive events of a kind."""
    from rearview_spark.operators.behavior import interarrival_summary

    return interarrival_summary(Tables(spark, sf_dir).events)


EV_INTERARRIVAL_SQL = """
WITH b AS (
  SELECT user_id AS u, event_type AS kind,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events),
g AS (
  SELECT kind,
         t - lag(t) OVER (PARTITION BY u, kind ORDER BY t) AS gap
  FROM b),
g2 AS (SELECT kind, gap FROM g WHERE gap IS NOT NULL),
r AS (
  SELECT kind, gap,
         row_number() OVER (PARTITION BY kind ORDER BY gap) AS rn,
         count(*) OVER (PARTITION BY kind) AS n
  FROM g2)
SELECT kind,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS mean_gap_s,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT)
         AS p50_gap_s,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS BIGINT)
         AS p90_gap_s,
       CAST(max(gap) AS BIGINT) AS max_gap_s
FROM r GROUP BY kind ORDER BY kind
"""

PENDING_QUERIES["ev_interarrival"] = {
    "fn": ev_interarrival,
    "oracle": EV_INTERARRIVAL_SQL,
}


def ev_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active-user mix
    (operators/behavior.new_vs_returning): per epoch-day, exact counts
    of first-ever-seen vs returning users and the new-user share."""
    from rearview_spark.operators.behavior import new_vs_returning

    return new_vs_returning(Tables(spark, sf_dir).events)


EV_NEW_RET_SQL = """
WITH ub AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS bucket
  FROM events),
first AS (SELECT u, min(bucket) AS f FROM ub GROUP BY u),
m AS (
  SELECT ub.bucket,
         sum(CASE WHEN ub.bucket = first.f THEN 1 ELSE 0 END) AS n_new,
         sum(CASE WHEN ub.bucket > first.f THEN 1 ELSE 0 END) AS n_returning,
         count(*) AS n_active
  FROM ub JOIN first USING (u) GROUP BY 1)
SELECT bucket,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_returning AS BIGINT) AS n_returning,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(n_new AS DOUBLE) / CAST(n_active AS DOUBLE) AS new_share
FROM m ORDER BY bucket
"""

PENDING_QUERIES["ev_new_vs_returning"] = {
    "fn": ev_new_vs_returning,
    "oracle": EV_NEW_RET_SQL,
}


MARKOV_ITERS = 8
MARKOV_SCALE = 10**6


def ev_markov_steady(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov steady-state occupancy of the per-user event chain
    (operators/behavior.markov_steady_state): 8 exact-integer
    fixed-point steps over the transition-count matrix, replayed by
    the oracle as chained CTEs with the identical floor-division
    recurrence (the pagerank/PCA oracle discipline)."""
    from rearview_spark.operators.behavior import markov_steady_state

    return markov_steady_state(
        Tables(spark, sf_dir).events,
        iterations=MARKOV_ITERS,
        scale=MARKOV_SCALE,
    )


def _markov_sql() -> str:
    ctes = [
        """seq AS (
  SELECT user_id, event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst_type
  FROM events)""",
        """c AS (
  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2)""",
        "t AS (SELECT src_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)",
        """ty AS (
  SELECT src_type AS ty FROM c UNION SELECT dst_type FROM c)""",
        f"v0 AS (SELECT ty AS t, CAST({MARKOV_SCALE} AS BIGINT) AS v FROM ty)",
    ]
    for i in range(1, MARKOV_ITERS + 1):
        ctes.append(
            f"""v{i} AS (
  SELECT ty.ty AS t, CAST(COALESCE(x.v, 0) AS BIGINT) AS v
  FROM ty LEFT JOIN (
    SELECT c.dst_type AS t, sum((p.v * c.n) // tt.tot) AS v
    FROM c
    JOIN v{i - 1} p ON p.t = c.src_type
    JOIN t tt ON tt.src_type = c.src_type
    GROUP BY 1) x ON x.t = ty.ty)"""
        )
    last = f"v{MARKOV_ITERS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
tot AS (SELECT CAST(sum(v) AS BIGINT) AS s FROM {last})
SELECT {last}.t AS event_type,
       {last}.v AS weight_fp,
       CASE WHEN tot.s > 0
            THEN CAST({last}.v AS DOUBLE) / CAST(tot.s AS DOUBLE)
       END AS share
FROM {last}, tot
ORDER BY event_type"""
    )


PENDING_QUERIES["ev_markov_steady"] = {
    "fn": ev_markov_steady,
    "oracle": _markov_sql(),
}


# r15 FLIP (VERDICT_r14 next-round #1): the r14-staged wave registers —
# every gate below was pre-verified at sf0.001 + sf0.01 + sf0.1 through
# tests/test_pending_gates.py, so this is the known-green one-line move.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}

def ev_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-concentration Gini over per-user event counts
    (operators/behavior.gini_concentration) — the scalar companion to
    the ev_pareto_share decile curve; the number a capacity dashboard
    alerts on when hot-key concentration drifts."""
    from rearview_spark.operators.behavior import gini_concentration

    return gini_concentration(Tables(spark, sf_dir).events, key_col="user_id")


EV_GINI_SQL = """
WITH pk AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
r AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt ASC, k ASC) AS rn
  FROM pk),
m AS (
  SELECT count(*) AS n, sum(cnt) AS sx,
         sum((rn * cnt) // 2147483648) AS shi,
         sum((rn * cnt) % 2147483648) AS slo
  FROM r)
SELECT CAST(n AS BIGINT) AS n_keys, CAST(sx AS BIGINT) AS n_rows,
       CASE WHEN n >= 2 THEN round(
         (2.0 * (CAST(shi AS DOUBLE) * 2147483648.0 + CAST(slo AS DOUBLE))
          - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) + 0.0000000005, 6)
       END AS gini
FROM m
"""

# Staged (r15 wave — r16 budget; the r15 window is fully committed to
# the 15 r14 flips + 35 rotations).
PENDING_QUERIES["ev_gini_concentration"] = {
    "fn": ev_gini_concentration,
    "oracle": EV_GINI_SQL,
}

def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort LTV-per-user curve
    (operators/behavior.cohort_value_curve): cohort_retention's money
    sibling — exact integer-cents value sums per (cohort, offset)
    cell, cumulative per cohort, one division by cohort size."""
    from rearview_spark.operators.behavior import cohort_value_curve

    return cohort_value_curve(Tables(spark, sf_dir).events)


EV_COHORT_LTV_SQL = """
WITH base AS (
  SELECT user_id AS u,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS bucket,
         coalesce(CAST(round(value * 100.0) AS BIGINT), 0) AS cents
  FROM events),
coh AS (SELECT u, min(bucket) AS cohort_bucket FROM base GROUP BY u),
sizes AS (
  SELECT cohort_bucket, count(*) AS cohort_size FROM coh GROUP BY 1),
cells AS (
  SELECT c.cohort_bucket, b.bucket - c.cohort_bucket AS week_offset,
         sum(b.cents) AS value_cents
  FROM base b JOIN coh c USING (u) GROUP BY 1, 2),
cum AS (
  SELECT cohort_bucket, week_offset, value_cents,
         sum(value_cents) OVER (
           PARTITION BY cohort_bucket ORDER BY week_offset) AS cum_cents
  FROM cells)
SELECT cum.cohort_bucket, cum.week_offset,
       CAST(sizes.cohort_size AS BIGINT) AS cohort_size,
       CAST(cum.value_cents AS BIGINT) AS value_cents,
       CAST(cum.cum_cents AS BIGINT) AS cum_value_cents,
       CAST(cum.cum_cents AS DOUBLE)
         / (100.0 * CAST(sizes.cohort_size AS DOUBLE)) AS ltv_per_user
FROM cum JOIN sizes USING (cohort_bucket)
ORDER BY 1, 2
"""

# Staged (r15 wave — r16 budget).
PENDING_QUERIES["ev_cohort_ltv"] = {
    "fn": ev_cohort_ltv,
    "oracle": EV_COHORT_LTV_SQL,
}

# r16 flip: the r15-staged wave registers (window = 7 flips + 34 r10 +
# 9 r11 rotations, pinned by VERDICT_r15 next-round #3).
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def ev_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-column outlier audit over the events fact
    (operators/profiling.numeric_outlier_audit): rank-explicit exact
    median + MAD per column FROM VALUE COUNTS (the ks_from_counts
    collapse — the window partitions hold each column's distinct-value
    domain, never row-scale data) and the count of cells failing
    ``|0.6745 * (x - med)| > 3.5 * MAD`` — the mean/stdev-blind
    data-quality sweep a min/max profile cannot express. ``value``
    (heavy-tailed — hundreds of cells fire at sf0.01) and ``user_id``
    (uniform ids — zero fire) audit side by side, pinning both the
    firing and the quiet behavior. The only division is
    n_outliers / n_rows of exact int64s; the comparison stays in
    unrounded product form (the ts_anomaly_mad contract, widened to
    columns)."""
    from rearview_spark.operators.profiling import numeric_outlier_audit

    ev = Tables(spark, sf_dir).events
    return numeric_outlier_audit(ev, ["value", "user_id"])


EV_OUTLIER_SQL = """
WITH u AS (
  SELECT 'value' AS col_name, CAST(value AS DOUBLE) AS value FROM events
  UNION ALL SELECT 'user_id', CAST(user_id AS DOUBLE) FROM events
),
nn AS (
  SELECT col_name, count(*) AS n_cells,
         coalesce(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END), 0) AS n_nulls
  FROM u GROUP BY 1
),
counts AS (
  SELECT col_name, value, count(*) AS cnt FROM u
  WHERE value IS NOT NULL GROUP BY 1, 2
),
c1 AS (
  SELECT col_name, value, cnt,
         sum(cnt) OVER (PARTITION BY col_name ORDER BY value
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY col_name) AS n
  FROM counts
),
med AS (
  SELECT col_name, sum(value * hits) / sum(hits) AS med FROM (
    SELECT col_name, value,
           (CASE WHEN (n + 1) // 2 BETWEEN cum - cnt + 1 AND cum THEN 1 ELSE 0 END)
         + (CASE WHEN n // 2 + 1 BETWEEN cum - cnt + 1 AND cum THEN 1 ELSE 0 END) AS hits
    FROM c1
  ) WHERE hits > 0 GROUP BY col_name
),
devc AS (
  SELECT c.col_name, abs(c.value - m.med) AS dev, sum(c.cnt) AS cnt
  FROM counts c JOIN med m USING (col_name)
  GROUP BY 1, 2
),
c2 AS (
  SELECT col_name, dev, cnt,
         sum(cnt) OVER (PARTITION BY col_name ORDER BY dev
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY col_name) AS n
  FROM devc
),
mad AS (
  SELECT col_name, sum(dev * hits) / sum(hits) AS mad FROM (
    SELECT col_name, dev,
           (CASE WHEN (n + 1) // 2 BETWEEN cum - cnt + 1 AND cum THEN 1 ELSE 0 END)
         + (CASE WHEN n // 2 + 1 BETWEEN cum - cnt + 1 AND cum THEN 1 ELSE 0 END) AS hits
    FROM c2
  ) WHERE hits > 0 GROUP BY col_name
),
agg AS (
  SELECT c.col_name, sum(c.cnt) AS n_rows, max(m.med) AS med, max(d.mad) AS mad,
         coalesce(sum(CASE WHEN d.mad > 0
                            AND abs(0.6745 * (c.value - m.med)) > 3.5 * d.mad
                      THEN c.cnt ELSE 0 END), 0) AS n_outliers
  FROM counts c JOIN med m USING (col_name) JOIN mad d USING (col_name)
  GROUP BY c.col_name
)
SELECT nn.col_name,
       CAST(coalesce(a.n_rows, 0) AS BIGINT) AS n_rows,
       CAST(nn.n_nulls AS BIGINT) AS n_nulls,
       a.med, a.mad,
       CAST(coalesce(a.n_outliers, 0) AS BIGINT) AS n_outliers,
       CASE WHEN a.n_rows > 0
            THEN CAST(a.n_outliers AS DOUBLE) / CAST(a.n_rows AS DOUBLE)
       END AS outlier_rate
FROM nn LEFT JOIN agg a USING (col_name)
ORDER BY col_name
"""

# Staged (r16 wave — r17 budget; pre-verified by
# tests/test_pending_gates.py at three scales before the flip).
PENDING_QUERIES["ev_outlier_audit"] = {
    "fn": ev_outlier_audit,
    "oracle": EV_OUTLIER_SQL,
}
