"""User-behavior analytics over event streams (SURVEY.md §2.3 Prov-A
event analytics family): funnel conversion, event-transition matrices,
multi-touch attribution, top paths, active-time / peak-concurrency
sweep lines, burstiness, DAU/WAU stickiness, cohort retention,
new-vs-returning mix (batch + the set-union streaming recurrence),
Pareto volume concentration, and inter-arrival gap statistics — the
product-analytics layer over the same events table the sessionization
gates read.

All pure DataFrame compositions: windows are always partitioned (by
user, user+kind, or a collapsed domain — never corpus-wide), global
cumulatives go through the range-partitioned ``global_running_sum``
primitives, and corpus-scale frames collapse to bounded domains
(user-day, key, bucket) before anything wide happens. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: tuple[str, ...],
    horizon: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    strict: bool = False,
) -> DataFrame:
    """Ordered-funnel conversion: how many users perform ``steps`` in
    order, each step at-or-after the previous one's first qualifying
    time, optionally all within ``horizon`` of the user's FIRST step
    (e.g. view -> click -> purchase inside 7 days).

    Semantics (the deterministic "first qualifying event" funnel): a
    user's stage-1 time is their earliest ``steps[0]`` event; stage i's
    time is their earliest ``steps[i]`` event at-or-after stage i-1's
    time (and <= stage-1 time + horizon when given). Equal timestamps
    count — a click logged in the same microsecond as the view
    satisfies "after". ``strict=True`` switches every stage comparison
    to strictly-after (``>``) — the semantics the retired
    ``ev_conversion_funnel`` gate pinned (r16 retirement: the gate's
    only delta from the still-gated ``ev_funnel_stages`` is this one
    comparison operator, now an option with a hand test instead of a
    second driver slot).

    Scale shape: stage i is a semi-join-shaped aggregate — events of
    type ``steps[i]`` joined to the (user, t_{i-1}, deadline) frame on
    the user key, min-aggregated back to one row per user. Every join
    and aggregate shuffles on the SAME key, so the exchange is reused
    across stages; per-stage frames shrink monotonically. The final
    stage counts run in ONE job over the union of the K user frames
    (no per-stage driver counts). Returns
    ``(stage, step, n_users, conversion)`` with conversion relative to
    stage 1, a double division of exact longs.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel_conversion: need >= 2 steps, got {steps!r}")
    first = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    if horizon is not None:
        first = first.withColumn("_dl", F.col("_t") + F.expr(f"INTERVAL {horizon}"))
    stage_frames = [first]
    cur = first
    for st in steps[1:]:
        nxt = events.filter(F.col(type_col) == st).select(
            user_col, F.col(ts_col).alias("_ts")
        )
        cond = (
            F.col("_ts") > F.col("_t") if strict else F.col("_ts") >= F.col("_t")
        )
        if horizon is not None:
            cond = cond & (F.col("_ts") <= F.col("_dl"))
        aggs = [F.min("_ts").alias("_t")]
        if horizon is not None:
            # the deadline is fixed at stage 1 and constant per user —
            # min() just carries it through the aggregate
            aggs.append(F.min("_dl").alias("_dl"))
        cur = nxt.join(cur, user_col).filter(cond).groupBy(user_col).agg(*aggs)
        stage_frames.append(cur)
    staged = None
    for i, (st, frame) in enumerate(zip(steps, stage_frames), start=1):
        part = frame.select(
            F.lit(i).alias("stage"), F.lit(st).alias("step"), F.col(user_col)
        )
        staged = part if staged is None else staged.unionByName(part)
    counts = staged.groupBy("stage", "step").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    base = counts.filter(F.col("stage") == 1).select(
        F.col("n_users").alias("_n1")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "stage",
        "step",
        "n_users",
        (F.col("n_users") * F.lit(1.0) / F.col("_n1")).alias("conversion"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    for each ordered pair of consecutive events (by ``ts_col``, tie
    broken on ``id_col`` so the sequence — and therefore the matrix —
    is deterministic), count src -> dst and the row-conditional
    probability P(dst | src).

    Scale shape: ONE user-partitioned window (lead over the per-user
    ordering — partitioned, never global), then a (src, dst) hash
    aggregate with map-side partials; row totals are a second tiny
    aggregate over the |types|^2-row matrix, broadcast back for the
    probability column. Returns ``(src_type, dst_type, n_transitions,
    p)`` with p = n * 1.0 / row_total (double division of exact
    longs)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("src_type"),
            F.lead(type_col).over(w).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
    )
    counts = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("src_type").agg(
        F.sum("n_transitions").alias("_tot")
    )
    return counts.join(F.broadcast(totals), "src_type").select(
        "src_type",
        "dst_type",
        "n_transitions",
        (F.col("n_transitions") * F.lit(1.0) / F.col("_tot")).alias("p"),
    )


def multi_touch_attribution(
    events: DataFrame,
    window_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    touch_type: str = "click",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Multi-touch attribution with linear recency decay: each
    conversion's value is split across ALL the user's touch events in
    the preceding ``window_seconds``, weighted toward the most recent — the
    fractional-credit refinement of the last-touch interval join
    (streaming/standing.stream_stream_purchase_attribution gives every
    qualifying click full credit; here credit sums to exactly one
    conversion value).

    Weights are INTEGER seconds-of-recency-remaining, ``w = W - dt + 1``
    (dt = conversion ts - touch ts in whole seconds, W =
    window_seconds): same-instant touches get W+1, window-edge touches get 1,
    and the +1 keeps every qualifying touch's weight positive so a
    conversion's weight total can never be zero. Credit =
    ``value * w / total_w`` — one double multiply-divide over identical
    integers on both engines, no libm (an exponential-decay weight
    would ride pow(), which rounds differently across engines).

    Scale shape: one user-keyed interval join (the attribution family's
    shape — at stream scale the watermark bounds touch state), a
    per-conversion integer weight total via a window partitioned by the
    conversion id (never global), and a scan-time credit projection.
    Returns one row per (conversion, touch) pair:
    ``(conversion_id, conversion_ts, user, touch_id, touch_ts, w,
    credit)``."""
    from pyspark.sql import Window as W

    touches = events.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
    )
    convs = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conversion_id"),
        F.col(ts_col).alias("conversion_ts"),
        F.col(value_col).alias("_value"),
    )
    W_ = int(window_seconds)
    joined = convs.join(touches, "_u").filter(
        (F.col("touch_ts") <= F.col("conversion_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conversion_ts") - F.expr(f"INTERVAL {W_} SECONDS")
        )
    )
    # ts.cast(long) == duck floor(epoch(ts)) — the sessionization gates'
    # proven cross-engine second-truncation idiom
    dt = F.col("conversion_ts").cast("long") - F.col("touch_ts").cast("long")
    weighted = joined.withColumn("w", (F.lit(W_) - dt + F.lit(1)).cast("long"))
    tot = W.partitionBy("conversion_id")
    return weighted.withColumn("_tw", F.sum("w").over(tot)).select(
        "conversion_id",
        "conversion_ts",
        F.col("_u").alias(user_col),
        "touch_id",
        "touch_ts",
        "w",
        (F.col("_value") * F.col("w") / F.col("_tw")).alias("credit"),
    )


def top_paths(
    events: DataFrame,
    length: int = 3,
    k: int = 25,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    sep: str = " > ",
) -> DataFrame:
    """Top-``k`` most frequent length-``length`` event paths (sliding
    n-grams over each user's chronological event sequence) — the
    "common journeys" read that generalizes the first-order transition
    matrix to longer windows of behavior.

    Ordering is deterministic: the per-user sequence sorts on
    ``(ts, event_id)`` exactly as :func:`event_transitions`. Paths are
    built with ``length - 1`` leads over ONE user-partitioned window
    (Catalyst collapses same-spec Window nodes — one shuffle), counted
    with a map-side-combined hash aggregate whose key domain is at most
    |event types|^length, and ranked via the distributed
    ``orderBy().limit(k)`` top-k (TakeOrderedAndProject) + bounded
    row_number from operators/_util.ranked_topk — no unbounded global
    window anywhere.

    Returns ``(path, n_paths, rank)`` with ties broken toward the
    lexicographically smallest path.
    """
    if length < 2:
        raise ValueError(f"top_paths: need length >= 2, got {length}")
    from rearview_spark.operators._util import ranked_topk

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    seq = events.select(F.concat_ws(sep, *steps).alias("path"), steps[-1].alias("_last"))
    counts = (
        seq.filter(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    return ranked_topk(counts, [F.desc("n_paths"), F.asc("path")], k)


def interval_union_time(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Total covered duration of (possibly overlapping) intervals per
    key — the billing/utilization primitive ("active seconds", machine
    uptime, concurrent-session coverage) that a naive SUM(end - start)
    double-counts whenever intervals overlap.

    Gaps-and-islands in integer epoch seconds: order each key's
    intervals by start, carry the running max end with ONE
    key-partitioned window (never global), start a new island where an
    interval begins after everything seen so far ended, cumulative-sum
    the island flags into island ids (second frame over the SAME
    window spec — Catalyst collapses them), then one hash aggregate
    per island (coverage = max end - min start, exact bigints) and one
    per key. All integer arithmetic — aggregation order immune.

    Returns ``(key, n_islands, covered_seconds)``.
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    )
    w = Window.partitionBy("k").orderBy("s", "e")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(prev_max_end, F.lit(-(1 << 62))), 1
        ).otherwise(0),
    )
    with_island = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = with_island.groupBy("k", "island").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return islands.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len").alias("covered_seconds"),
    ).select(F.col("k").alias(key_col), "n_islands", "covered_seconds")


def peak_concurrency(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    id_col: str = "event_id",
):
    """Maximum number of simultaneously open intervals and the earliest
    instant it is reached — max concurrent sessions / connections, the
    capacity-planning read over activity windows.

    Sweep-line over +1/-1 boundary deltas with a GLOBAL ordered running
    sum from operators/_util.global_running_sum (range-partitioned
    partial cumsums + broadcast prefix totals — never the single-task
    ``Window.orderBy``). Intervals are half-open ``[start, end)``: an
    end and a start at the same instant order the end FIRST
    (delta -1 < +1 in the sort), so back-to-back sessions never
    double-count. ``id_col`` completes the strict total order; rows
    tied on (t, delta) are interchangeable — the peak and its earliest
    instant are invariant to their order even though intermediate
    running values are not.

    Returns a one-row frame ``(peak_concurrency, at_s)`` — exact
    integers (min_by over the (-concurrency, t) struct picks the
    earliest instant of the highest level deterministically).
    """
    from rearview_spark.operators._util import global_running_sum

    deltas = intervals.select(
        F.col(start_col).cast("long").alias("t"),
        F.lit(1).alias("d"),
        F.col(id_col).alias("tie"),
    ).unionAll(
        intervals.select(
            F.col(end_col).cast("long").alias("t"),
            F.lit(-1).alias("d"),
            F.col(id_col).alias("tie"),
        )
    )
    r = global_running_sum(deltas, ["t", "d", "tie"], "d", out_col="conc")
    return r.agg(
        F.max("conc").alias("peak_concurrency"),
        F.expr("min_by(t, struct(-conc, t))").alias("at_s"),
    )


def concurrency_deltas(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per-timestamp NET boundary deltas ``(t, d)`` of half-open
    ``[start, end)`` intervals — the ADDITION-MERGEABLE summary of a
    sweep line (the same mergeability contract as the sketch / PSI
    occupancy tables): deltas from two interval sets combine by summing
    ``d`` per ``t``, so micro-batched accumulation is bit-identical to
    one pass over the union.

    Collapsing each instant to its net delta preserves peak semantics
    exactly: processing an instant's -1s before its +1s (the half-open
    rule peak_concurrency sorts by) makes the fine-grained running
    value dip then climb WITHIN the instant, so local maxima occur only
    at instant boundaries — the max (and its earliest instant) over
    net-delta prefix sums equals the max over the fine-grained sweep
    (argued in :func:`peak_from_deltas`, replay-pinned in
    tests/test_streaming.py).

    One map-side-combined hash aggregate; output size = |distinct
    boundary instants|, already the minimal sweep state.
    """
    both = intervals.select(
        F.col(start_col).cast("long").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        intervals.select(
            F.col(end_col).cast("long").alias("t"), F.lit(-1).alias("d")
        )
    )
    return both.groupBy("t").agg(F.sum("d").alias("d"))


def peak_from_deltas(deltas: DataFrame) -> DataFrame:
    """``(peak_concurrency, at_s)`` from a net-delta table — identical
    result whether the deltas came from one :func:`concurrency_deltas`
    pass or a streaming addition-merge (:func:`concurrency_foreach_batch`).

    Prefix sums over ``t`` via the distributed global running sum
    (never a single-task window); ``t`` is unique after the net-delta
    aggregate, so it alone is the strict total order. Equality with the
    fine-grained sweep: within one instant the -1s-first trajectory is
    monotone down then up, so any fine-grained value >= both adjacent
    instant-boundary values is itself an instant-boundary value —
    maxima and their earliest instants coincide.

    Rows with net delta 0 (an end and a start at the same instant)
    still ride through — they can't host a NEW maximum (value unchanged
    from the previous instant), and min_by ties keep the earliest t.
    """
    from rearview_spark.operators._util import global_running_sum

    r = global_running_sum(deltas, ["t"], "d", out_col="conc")
    return r.agg(
        F.max("conc").alias("peak_concurrency"),
        F.expr("min_by(t, struct(-conc, t))").alias("at_s"),
    )


def concurrency_foreach_batch(
    spark,
    state_dir: str,
    start_col: str = "start",
    end_col: str = "end",
):
    """Sweep-line occupancy as a ``foreachBatch`` recurrence — the
    CM/HLL/PSI batch-dir contract from operators/sketch.py: each
    micro-batch's net boundary deltas ADD into the previous persisted
    state under ``batch=<id>`` (a retried batch re-merges from its
    predecessor, never double-counts). Because deltas merge by
    addition, the streamed state is bit-identical to one
    :func:`concurrency_deltas` pass over the union — the peak read off
    it shares the batch gate's FULL value oracle (micro-batching is a
    delivery choice, not a semantics change).

    State size = |distinct boundary instants| rows of two bigints —
    epoch-second activity windows bound it at seconds-per-retention
    rows regardless of event volume; coalesce(1) keeps each state
    generation a single file (the sketch-store convention)."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = concurrency_deltas(batch_df, start_col, end_col)
        prev = _latest_batch_dir(spark, state_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionByName(spark.read.parquet(prev))
        merged = cur.groupBy("t").agg(F.sum("d").alias("d"))
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def burstiness_fano(
    df: DataFrame,
    ts_col: str = "ts",
    kind_col: str = "event_type",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-kind burstiness via the Fano factor — the dispersion of the
    per-bucket arrival counts, ``var(k) / mean(k)``: a Poisson-regular
    stream reads ~1, retry storms / thundering herds read >> 1, rate-
    limited or heartbeat traffic << 1. The capacity-planning companion
    to peak_concurrency (peak says how high; Fano says how lumpy).

    The bucket grid is the FULL closed range ``[min_bucket,
    max_bucket]`` of the whole frame — empty buckets count as zeros
    (dropping them would deflate variance exactly where burstiness
    lives), entering through the closed-form bucket count ``H`` rather
    than materialized zero rows.

    Exactness: per-bucket counts are exact int64, so Σk and Σk² are
    exact order-immune moments; mean and Fano are fixed double
    expressions over those exact operands (mirrored op-for-op in the
    oracle) — Fano = (H·Σk² − (Σk)²) / (H·Σk), one expression tree, no
    intermediate rounding. Doubles are used for the H·Σk² products (at
    deployment scale they exceed int64; the moments themselves stay
    exact).

    Scale shape: one hash collapse to (kind, bucket) — the only
    corpus-sized stage — then a kind-domain re-aggregation and a
    broadcast one-row range join. Returns one row per kind:
    ``(kind, n_buckets, n_events, mean_per_bucket, fano)``; Fano NULL
    for a kind with no events.
    """
    if not isinstance(bucket_seconds, int) or bucket_seconds < 1:
        raise ValueError(
            "burstiness_fano: bucket_seconds must be a positive int "
            f"(got {bucket_seconds!r})"
        )
    b = F.expr(
        f"CAST(ts_long div {bucket_seconds} AS BIGINT)"
    )
    # pre-1970 timestamps would split Spark's truncating `div` from the
    # oracle's floor `//` — sentinel noise, so fail loudly (the
    # slo_burn_rate / stickiness_dau_wau guard)
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("burstiness_fano: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    base = df.select(
        F.col(kind_col).alias("kind"),
        t_checked.alias("ts_long"),
    ).withColumn("bucket", b)
    rng = base.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    per_bucket = base.groupBy("kind", "bucket").agg(
        F.count(F.lit(1)).alias("k")
    )
    moments = per_bucket.groupBy("kind").agg(
        F.sum("k").cast("long").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("skk"),
    )
    h = (F.col("_hi") - F.col("_lo") + F.lit(1)).cast("double")
    fano = F.when(
        F.col("sk") > 0,
        (
            h * F.col("skk").cast("double")
            - F.col("sk").cast("double") * F.col("sk").cast("double")
        )
        / (h * F.col("sk").cast("double")),
    )
    return (
        moments.crossJoin(F.broadcast(rng))
        .select(
            "kind",
            (F.col("_hi") - F.col("_lo") + F.lit(1))
            .cast("long")
            .alias("n_buckets"),
            F.col("sk").alias("n_events"),
            (F.col("sk").cast("double") / h).alias("mean_per_bucket"),
            fano.alias("fano"),
        )
        .orderBy("kind")
    )


def stickiness_dau_wau(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """DAU/WAU stickiness — the canonical product-engagement ratio
    (what fraction of the trailing week's actives showed up today):
    per day, exact distinct daily actives over exact distinct
    trailing-``window_days`` actives.

    The trailing distinct is NOT prefix-summable (users repeat), so it
    is computed exactly by the contribution explode: each distinct
    (user, day) row contributes that user to the ``window_days`` days
    it keeps them in the window, and a second distinct collapses
    multi-day users — both stages are user-day-domain sized, never
    event-volume sized, and the explode factor is the constant window
    length. Empty days materialize as zeros through a dense calendar
    grid (one F.sequence — the slo_burn_rate form); only days with a
    FULL trailing window emit (the mean_shift edge rule). Negative
    epochs are rejected at execution (truncating div vs floor — the
    slo_burn_rate guard).

    Returns ``(day, dau, wau, stickiness)`` ascending — day is the
    epoch-day number; stickiness is ONE division of exact int64, NULL
    when the window saw nobody.
    """
    if not isinstance(window_days, int) or window_days < 1:
        raise ValueError(
            f"stickiness_dau_wau: window_days must be >= 1 (got {window_days!r})"
        )
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("stickiness_dau_wau: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    ud = (
        df.select(
            F.col(user_col).alias("u"), t_checked.alias("_t")
        )
        .select("u", F.expr("_t div 86400").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (
        ud.select(
            "u",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(window_days - 1))
            ).alias("day"),
        )
        .distinct()
    )
    wau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    rng = dau.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = rng.select(
        F.explode(
            F.sequence(F.col("lo") + F.lit(window_days - 1), F.col("hi"))
        ).alias("day")
    )
    return (
        grid.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
            F.when(
                F.coalesce("wau", F.lit(0)) > 0,
                F.coalesce("dau", F.lit(0)).cast("double")
                / F.coalesce("wau", F.lit(0)).cast("double"),
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_seconds: int = 604800,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle — the canonical growth-accounting
    read (what fraction of the users acquired in week W were still
    active k weeks later): users cohort by their FIRST active bucket,
    and each (cohort, offset) cell counts distinct cohort members
    active in bucket ``cohort + offset``.

    Exactness: buckets are integer ``div`` of the epoch second (the
    negative-epoch guard of the slo_burn/stickiness siblings — a
    pre-1970 sentinel fails loudly rather than splitting Spark's
    truncating div from the oracle's floor); membership counts are
    exact int64 over (user, bucket) DISTINCT activity; retention is
    ONE division per cell. Offset 0 is emitted too (always 1.0 by
    construction — its presence lets a dashboard consume the triangle
    without special-casing the diagonal).

    Scale shape: one corpus collapse to the distinct (user, bucket)
    domain, a user-domain min-aggregate for the cohort assignment, one
    user-keyed equi-join sharing that collapse's partitioning, then a
    (cohort, offset)-domain hash aggregate and a cohort-domain
    broadcast-size join — nothing event-volume sized past the first
    distinct. ``max_offset`` (when given) prunes the triangle BEFORE
    the cell aggregate, not after.

    Returns ``(cohort_bucket, week_offset, cohort_size, n_active,
    retention)`` ascending by (cohort_bucket, week_offset).
    """
    if not isinstance(bucket_seconds, int) or bucket_seconds < 1:
        raise ValueError(
            "cohort_retention: bucket_seconds must be a positive int "
            f"(got {bucket_seconds!r})"
        )
    if max_offset is not None and (
        not isinstance(max_offset, int) or max_offset < 0
    ):
        raise ValueError(
            f"cohort_retention: max_offset must be >= 0 (got {max_offset!r})"
        )
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cohort_retention: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    ub = (
        df.select(F.col(user_col).alias("u"), t_checked.alias("_t"))
        .select("u", F.expr(f"_t div {bucket_seconds}").alias("bucket"))
        .distinct()
    )
    return retention_from_user_buckets(ub, max_offset=max_offset)


def cohort_value_curve(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    bucket_seconds: int = 604800,
    cents: int = 100,
) -> DataFrame:
    """Cohort LTV curve — :func:`cohort_retention`'s money sibling
    (not "did week-W users come back" but "how much value have they
    produced by offset k"): users cohort by first active bucket, each
    (cohort, offset) cell sums the cohort's value in that bucket, and
    the cumulative sum divided by cohort size is the
    lifetime-value-per-user curve a payback decision reads.

    Exactness: values quantize to integer ``cents`` units at the scan
    (the exact_sum discipline — ``round(value * cents)`` as int64, a
    NULL value contributes 0 via per-row coalesce so an all-NULL cell
    reads 0, not NULL), every sum and prefix sum is exact int64, and
    the published per-user LTV is ONE division of exact integers
    (``cum_cents / (cents * cohort_size)``) mirrored op-for-op.
    Negative epochs fail loudly (the slo_burn/stickiness guard).

    Scale shape (r16): ONE corpus scan collapsing to the (u, bucket)
    integer-cents domain (map-side partials — exact, sums are
    associative), then :func:`ltv_from_user_value_buckets` over that
    bounded frame: a user-domain min-aggregate, one user-keyed
    equi-join on the COLLAPSED frame (user-activity-domain, not event
    volume — the r15 plan joined raw rows and was linear in the scan
    twice over), a (cohort, offset)-domain hash aggregate, a
    PER-COHORT prefix window (partition = one cohort's offsets —
    calendar-bounded, never a single global task), and a
    cohort-domain broadcast join. int64 envelope: |sum value| *
    cents per cell must fit 2^63 (~9e16 dollars at cents=100 — not
    binding). Returns ``(cohort_bucket, week_offset, cohort_size,
    value_cents, cum_value_cents, ltv_per_user)`` ascending.
    """
    if not isinstance(bucket_seconds, int) or bucket_seconds < 1:
        raise ValueError(
            "cohort_value_curve: bucket_seconds must be a positive int "
            f"(got {bucket_seconds!r})"
        )
    if not isinstance(cents, int) or cents < 1:
        raise ValueError(
            f"cohort_value_curve: cents must be a positive int (got {cents!r})"
        )
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cohort_value_curve: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    base = df.select(
        F.col(user_col).alias("u"),
        t_checked.alias("_t"),
        F.coalesce(
            F.round(F.col(value_col).cast("double") * cents).cast("long"),
            F.lit(0),
        ).alias("cents"),
    ).select("u", F.expr(f"_t div {bucket_seconds}").alias("bucket"), "cents")
    # Pre-collapse to the (u, bucket) value domain BEFORE the cohort
    # join (r16, VERDICT_r15 next-round #6 refactor): integer-cents
    # sums are associative, so summing per (u, bucket) first is exact —
    # and it shrinks the join input from event volume to the
    # user-activity domain (map-side partials absorb the scan, the
    # strictly better plan at 100 TB). This collapsed frame is ALSO
    # the streaming ADD-merge state (user_value_foreach_batch), so the
    # batch operator and stream_cohort_ltv share one post-collapse
    # code path — and therefore one oracle (the
    # retention_from_user_buckets discipline).
    uvb = base.groupBy("u", "bucket").agg(
        F.sum("cents").cast("long").alias("cents")
    )
    return ltv_from_user_value_buckets(uvb, cents=cents)


def ltv_from_user_value_buckets(uvb: DataFrame, cents: int = 100) -> DataFrame:
    """The cohort-LTV curve read off an already-collapsed ``(u, bucket,
    cents)`` frame — :func:`cohort_value_curve`'s post-collapse half,
    split out (r16, VERDICT_r15 next-round #6) so the streaming
    integer-cents ADD-merge state (:func:`user_value_foreach_batch`,
    whose merged state IS this frame) and the batch operator share one
    code path and therefore one oracle. Input must carry at most one
    row per (u, bucket); a duplicated pair would double-count its
    cell's value (the retention_from_user_buckets contract, summed
    instead of distinct).

    Scale shape (the batch docstring's tail): the frame is
    checkpointed ONCE here — it feeds the cohort min-aggregate AND the
    cell join, and without the lineage cut the upstream collapse
    re-executes per consumer — then a user-domain min-aggregate, one
    user-keyed equi-join on the COLLAPSED frame, a (cohort,
    offset)-domain hash aggregate, a per-cohort prefix window
    (calendar-bounded partitions, never a single global task), and a
    cohort-domain broadcast join."""
    uvb = uvb.localCheckpoint(eager=True)
    cohorts = uvb.groupBy("u").agg(F.min("bucket").alias("cohort_bucket"))
    sizes = cohorts.groupBy("cohort_bucket").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        uvb.join(cohorts, "u")
        .groupBy(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("week_offset"),
        )
        .agg(F.sum("cents").cast("long").alias("value_cents"))
    )
    w = (
        Window.partitionBy("cohort_bucket")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn(
        "cum_value_cents", F.sum("value_cents").over(w).cast("long")
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_bucket")
        .select(
            "cohort_bucket",
            "week_offset",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            "value_cents",
            "cum_value_cents",
            (
                F.col("cum_value_cents").cast("double")
                / (F.lit(float(cents)) * F.col("cohort_size").cast("double"))
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_bucket", "week_offset")
    )


def retention_from_user_buckets(
    ub: DataFrame,
    max_offset: int | None = None,
) -> DataFrame:
    """The retention-triangle read off an already-DISTINCT ``(u,
    bucket)`` activity frame — :func:`cohort_retention`'s post-collapse
    half, split out (r15, VERDICT_r14 next-round #6) so the streaming
    set-union state (:func:`user_activity_foreach_batch`, whose merged
    state IS this frame — :func:`mix_from_user_buckets`'s sibling read)
    and the batch operator share one code path and therefore one
    oracle. Input must be distinct; a duplicated (u, bucket) row would
    double-count its cell.

    Scale shape (the batch docstring's tail, unchanged): the frame is
    checkpointed ONCE here — it feeds the cohort min-aggregate AND the
    cell join, and without the lineage cut the upstream scan + distinct
    re-executes per consumer (3 scans observed in the r14 self-audit);
    then a user-domain min-aggregate, one user-keyed equi-join, a
    (cohort, offset)-domain hash aggregate, and a cohort-domain
    broadcast join — nothing event-volume sized past the input."""
    ub = ub.localCheckpoint(eager=True)
    cohorts = ub.groupBy("u").agg(F.min("bucket").alias("cohort_bucket"))
    sizes = cohorts.groupBy("cohort_bucket").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = ub.join(cohorts, "u").select(
        "cohort_bucket",
        (F.col("bucket") - F.col("cohort_bucket")).alias("week_offset"),
    )
    if max_offset is not None:
        cells = cells.filter(F.col("week_offset") <= max_offset)
    counts = cells.groupBy("cohort_bucket", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_bucket")
        .select(
            "cohort_bucket",
            "week_offset",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("n_active").cast("long").alias("n_active"),
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
        .orderBy("cohort_bucket", "week_offset")
    )


def pareto_share(
    df: DataFrame,
    key_col: str = "user_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Volume-concentration (Pareto/Lorenz) curve by contributor — the
    "what share of traffic do the top 10% of users produce" read that
    decides whether per-user state needs a hot-key tier: keys rank by
    their exact row count DESCENDING, split into ``n_buckets``
    equal-population buckets, and each bucket reports its cumulative
    share of total rows.

    Exactness: per-key counts and the bucket cut ``((rn - 1) *
    n_buckets) div n_keys`` are exact integer arithmetic (the
    cumulative_gains / equi-depth discipline — deterministic through
    ties via the key-ascending tiebreak); cumulative sums run through
    ``global_running_sums`` partials; share is ONE division of exact
    int64 per bucket row.

    Scale shape: one corpus collapse to the key domain, a
    key-domain ranked pass (global_row_number — range-partitioned,
    never a single-task window), a bucket-domain (``n_buckets`` rows)
    aggregate, then prefix sums over that bounded frame. Returns
    ``(bucket, n_keys, n_rows, cum_keys, cum_rows, cum_share)``
    ascending by bucket (bucket 0 = heaviest keys).
    """
    from rearview_spark.operators._util import (
        global_row_number,
        global_running_sums,
    )

    if not isinstance(n_buckets, int) or n_buckets < 1:
        raise ValueError(
            f"pareto_share: n_buckets must be >= 1 (got {n_buckets!r})"
        )
    per_key = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # asc_nulls_last: Spark's plain ASC sorts NULLs FIRST while the
    # DuckDB oracle's `k ASC` sorts them LAST — a NULL key would rank
    # (hence bucket) differently cross-engine without the explicit
    # ordering (ADVICE r14; latent — the gate's user_id is non-null)
    ranked, n_keys = global_row_number(
        per_key, [F.col("cnt").desc(), F.col("k").asc_nulls_last()], out_col="_rn"
    )
    if n_keys == 0:
        return df.sparkSession.createDataFrame(
            [],
            "bucket long, n_keys long, n_rows long, cum_keys long, "
            "cum_rows long, cum_share double",
        )
    per_bucket = ranked.groupBy(
        F.expr(f"((_rn - 1) * {n_buckets}) div {n_keys}").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )
    cum = global_running_sums(
        per_bucket, ["bucket"], ["n_keys", "n_rows"], ["cum_keys", "cum_rows"]
    )
    total = cum.agg(F.sum("n_rows").cast("long").alias("_tot"))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.col("n_keys").cast("long").alias("n_keys"),
            "n_rows",
            "cum_keys",
            "cum_rows",
            (F.col("cum_rows").cast("double") / F.col("_tot").cast("double")).alias(
                "cum_share"
            ),
        )
        .orderBy("bucket")
    )


def gini_concentration(
    df: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Gini coefficient of per-key volume — :func:`pareto_share`'s
    one-number companion (the decile curve says WHERE the concentration
    sits; the Gini is the scalar a capacity dashboard tracks over time
    and alerts on): keys rank by exact row count ASCENDING and

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    over ranks i = 1..n. 0 = perfectly even traffic, ->1 = one key is
    all of it.

    Exactness: counts and ranks are exact int64 through
    ``global_row_number`` (count-asc, key-asc tiebreak — a strict
    total order, NULL keys last to match the oracle's ASC default);
    each per-row product ``i * x_i`` — which
    must itself fit int64, the stated envelope: ``n_keys * max_count
    <= 2^63`` (1e9 users x 1e6 events/user = 1e15, comfortable) — is
    split into hi/lo int64 halves with the correlation_matrix
    arithmetic-shift discipline and each half summed as a plain long
    (``sum_lo <= n * 2^31`` holds to ~4e9 keys), then both engines
    assemble the same two doubles and evaluate ONE mirrored expression
    tree; the published Gini is one nudged 6dp rounding.

    Scale shape: one corpus collapse to the key domain, a key-domain
    ranked pass (range-partitioned global_row_number, never a
    single-task window), then ONE one-row aggregate. Returns a single
    row ``(n_keys, n_rows, gini)``; Gini is NULL for n < 2 keys (a
    one-key Lorenz curve has no inequality to measure).
    """
    from rearview_spark.operators._util import global_row_number

    per_key = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ranked, n_keys = global_row_number(
        per_key, [F.col("cnt").asc(), F.col("k").asc_nulls_last()], out_col="_rn"
    )
    spark = df.sparkSession
    if n_keys == 0:
        # One row, not zero: the EV_GINI_SQL oracle's ungrouped
        # aggregate always emits (n_keys=0, n_rows NULL, gini NULL) on
        # an empty corpus, and the docstring promises a single row —
        # match that shape exactly (ADVICE r15).
        return spark.createDataFrame(
            [(0, None, None)], "n_keys long, n_rows long, gini double"
        )
    B = 2**31
    prod = F.col("_rn") * F.col("cnt")
    hi = F.shiftright(prod, 31)
    lo = prod - hi * F.lit(B)
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("sx"),
        F.sum(hi).cast("long").alias("shi"),
        F.sum(lo).cast("long").alias("slo"),
    )
    from rearview_spark.plans._exact import r6

    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sw = (
        F.col("shi").cast("double") * F.lit(float(B))
        + F.col("slo").cast("double")
    )
    gini = (F.lit(2.0) * sw - (n_d + F.lit(1.0)) * sx_d) / (n_d * sx_d)
    return m.select(
        F.col("n").alias("n_keys"),
        F.col("sx").alias("n_rows"),
        F.when(F.col("n") >= 2, r6(gini)).alias("gini"),
    )


def interarrival_summary(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-kind inter-arrival-time distribution — the gap statistics
    (median / p90 / max / mean seconds between one user's consecutive
    events of a kind) that size retry backoffs, session timeouts, and
    polling intervals. The distributional companion to
    :func:`burstiness_fano` (Fano says how lumpy arrivals are; this
    says how long the quiet stretches run).

    Gap extraction is ONE window partitioned by (user, kind) — bounded
    by a single user's event history, never corpus-wide; equal
    timestamps within a partition yield the same sorted value sequence
    under any tie order, so the gap MULTISET (and everything computed
    from it) is deterministic without a tiebreak column. Percentiles
    are SQL-standard discrete picks at 1-based rank ``ceil(p * n)``,
    computed by the KS/equi-depth counts-collapse: gaps collapse to
    the (kind, gap) distinct-value domain, a kind-partitioned
    cumulative count walks that bounded domain, and each percentile is
    the minimal gap whose cumulative count reaches the all-integer
    threshold ``(p_num * n + p_den - 1) div p_den``. Mean is one
    division of the exact int64 gap sum. Negative epochs fail loudly
    (the slo_burn/stickiness guard).

    Returns ``(kind, n_gaps, mean_gap_s, p50_gap_s, p90_gap_s,
    max_gap_s)`` ordered by kind.
    """
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interarrival_summary: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    base = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("kind"),
        t_checked.alias("t"),
    )
    w = Window.partitionBy("u", "kind").orderBy("t")
    gaps = (
        base.withColumn("_prev", F.lag("t").over(w))
        .filter(F.col("_prev").isNotNull())
        .select("kind", (F.col("t") - F.col("_prev")).alias("gap"))
    )
    counts = gaps.groupBy("kind", "gap").agg(F.count(F.lit(1)).alias("c"))
    wk = Window.partitionBy("kind")
    wcum = (
        Window.partitionBy("kind")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "kind",
        "gap",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wk).alias("n"),
    )
    # ceil(p*n) thresholds in pure integers: p50 -> (n+1) div 2,
    # p90 -> (9n+9) div 10
    t50 = F.expr("(n + 1) div 2")
    t90 = F.expr("(9 * n + 9) div 10")
    return (
        cum.groupBy("kind")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            (
                F.sum(F.col("gap") * F.col("c")).cast("double")
                / F.max("n").cast("double")
            ).alias("mean_gap_s"),
            F.min(F.when(F.col("cum") >= t50, F.col("gap")))
            .cast("long")
            .alias("p50_gap_s"),
            F.min(F.when(F.col("cum") >= t90, F.col("gap")))
            .cast("long")
            .alias("p90_gap_s"),
            F.max("gap").cast("long").alias("max_gap_s"),
        )
        .orderBy("kind")
    )


def new_vs_returning(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Daily new-vs-returning user split — the growth chart every
    product dashboard opens with: per bucket, how many active users
    saw their FIRST-ever activity that bucket vs how many came back.
    The acquisition-side companion of :func:`cohort_retention` (which
    follows the cohorts forward; this reads each day's mix).

    Exactness: one distinct (user, bucket) collapse, a user-domain
    min-aggregate for first-seen, one user-keyed join sharing the
    collapse's partitioning, then a bucket-domain aggregate of two
    exact int64 counts; the new-user share is ONE division. Negative
    epochs fail loudly (the slo_burn/stickiness guard). Returns
    ``(bucket, n_new, n_returning, n_active, new_share)`` ascending —
    only buckets with activity emit (this is a per-active-day mix
    read, not a dense grid; join against a calendar upstream for
    zero-filled charts).
    """
    if not isinstance(bucket_seconds, int) or bucket_seconds < 1:
        raise ValueError(
            "new_vs_returning: bucket_seconds must be a positive int "
            f"(got {bucket_seconds!r})"
        )
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("new_vs_returning: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    ub = (
        df.select(F.col(user_col).alias("u"), t_checked.alias("_t"))
        .select("u", F.expr(f"_t div {bucket_seconds}").alias("bucket"))
        .distinct()
    )
    return mix_from_user_buckets(ub)


def mix_from_user_buckets(ub: DataFrame) -> DataFrame:
    """The new-vs-returning mix from a DISTINCT ``(u, bucket)``
    activity frame — identical arithmetic whether the frame came from
    one :func:`new_vs_returning` pass or a streamed set-union merge
    (duplicate pairs re-collapse first, so merging is a pure union —
    the ks_from_counts discipline with set union in place of count
    addition)."""
    # same checkpoint-the-collapse rationale as cohort_retention: the
    # distinct feeds both the first-seen aggregate and the mix join
    ub = ub.distinct().localCheckpoint(eager=True)
    first = ub.groupBy("u").agg(F.min("bucket").alias("_first"))
    return (
        ub.join(first, "u")
        .groupBy("bucket")
        .agg(
            F.sum((F.col("bucket") == F.col("_first")).cast("long"))
            .cast("long")
            .alias("n_new"),
            F.sum((F.col("bucket") > F.col("_first")).cast("long"))
            .cast("long")
            .alias("n_returning"),
            F.count(F.lit(1)).cast("long").alias("n_active"),
        )
        .select(
            "bucket",
            "n_new",
            "n_returning",
            "n_active",
            (F.col("n_new").cast("double") / F.col("n_active").cast("double")).alias(
                "new_share"
            ),
        )
        .orderBy("bucket")
    )


def user_activity_foreach_batch(spark, state_dir: str):
    """Distinct (user, bucket) activity as a ``foreachBatch``
    recurrence — the set-union analog of the count-merge recurrences
    (CM/HLL/PSI/KS): each micro-batch's distinct pairs UNION into the
    previous persisted state under a ``batch=<id>`` subdir, re-
    distincted on merge, so the streamed state is bit-identical to one
    distinct pass over all events regardless of batch order (set union
    is commutative AND idempotent — a retried batch is harmless twice
    over, though the below-predecessor read keeps the convention).
    The new-vs-returning mix read off the final state through
    :func:`mix_from_user_buckets` therefore shares the batch gate's
    FULL value oracle.

    State size is the distinct (user, bucket) domain — active
    user-days, the stickiness_dau_wau boundedness argument, bounded by
    users x retention-window days regardless of event volume. The
    ``coalesce(1)`` keeps the sketch-store one-file-per-generation
    convention; at deployment scale (billions of user-days) drop it
    and let the state write stay partitioned — the merge is a
    distinct, not a driver artifact. Batch frames must carry
    ``(u, bucket)``."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.select("u", "bucket").distinct()
        prev = _latest_batch_dir(spark, state_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionByName(spark.read.parquet(prev)).distinct()
        cur.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def user_value_foreach_batch(spark, state_dir: str):
    """Integer-cents ``(u, bucket) -> sum(cents)`` value state as a
    ``foreachBatch`` recurrence — the ADD-merge sibling of
    :func:`user_activity_foreach_batch` (VERDICT_r15 next-round #6):
    retention's per-user state is a SET (distinct buckets,
    union-mergeable), but LTV's is a SUM, so the merge is a re-
    aggregate — union the batch's per-(u, bucket) partial sums with
    the predecessor state and SUM per key, the CM/HLL/PSI count-merge
    contract with (u, bucket) as the key domain. Addition is
    commutative/associative, so the merged state — and the whole LTV
    curve read off it through :func:`ltv_from_user_value_buckets` —
    is bit-identical to one batch pass over the union of slices,
    regardless of batch order (exact int64 cents; no float ever
    enters the state).

    Retry contract (the batch=<id> convention): a batch reads its
    PREDECESSOR's state (``below=batch_id``) and overwrites its own
    dir, so a RETRIED batch id recomputes from the same seed and
    never double-adds — but unlike set union, addition is not
    idempotent across DIFFERENT batch ids, so each event row must
    appear in exactly one batch id (exactly what foreachBatch
    delivers: a replayed epoch re-runs under its ORIGINAL id).

    State size is the (u, bucket) activity domain — active user-weeks,
    bounded by users x calendar, regardless of event volume; each row
    is ~24 bytes of key + one int64. The ``coalesce(1)`` keeps the
    sketch-store one-file-per-generation convention; at deployment
    scale drop it and let the state write stay partitioned — the
    merge is a hash aggregate, not a driver artifact. Batch frames
    must carry ``(u, bucket, cents)`` with cents already int64
    (quantize at the scan, the cohort_value_curve discipline)."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.groupBy("u", "bucket").agg(
            F.sum("cents").cast("long").alias("cents")
        )
        prev = _latest_batch_dir(spark, state_dir, below=batch_id)
        if prev is not None:
            cur = (
                cur.unionByName(spark.read.parquet(prev))
                .groupBy("u", "bucket")
                .agg(F.sum("cents").cast("long").alias("cents"))
            )
        cur.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def markov_steady_state(
    events: DataFrame,
    iterations: int = 8,
    scale: int = 10**6,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_pairs: int = 100_000,
) -> DataFrame:
    """Long-run occupancy of the per-user event chain — the Markov
    steady-state read over :func:`event_transitions`' matrix (where
    does a user's session settle if the observed transition behavior
    holds): ``iterations`` fixed-point steps of ``w[d] = sum over s of
    (v[s] * n[s][d]) div tot[s]`` from the uniform start
    ``v[t] = scale``.

    Determinism (the top_principal_component contract, event-typed):
    the corpus collapses to the |types|^2 transition-count matrix —
    the bounded offline-artifact class, collected driver-side — and
    the iteration is EXACT Python-integer arithmetic (floor division
    every term), so an oracle replays the identical recurrence in SQL
    with plain ``//`` (all quantities non-negative). The published
    share is ONE division of exact integers per type. int64 envelope
    for the replaying engine: ``scale * max pair count`` — at the
    default, exact to ~9e12 transitions on one (src, dst) pair.

    Types with no OUTGOING transitions leak their mass (an absorbing
    tail-of-log artifact, not a modeling choice) — their steady weight
    decays toward the mass they RECEIVE per step; shares always
    renormalize over the surviving total. Scale shape: one
    user-partitioned lead window + one (src, dst) hash aggregate (the
    event_transitions plan verbatim); everything after is
    types-domain driver arithmetic.

    Cardinality guard (VERDICT r14 "What's wrong" #2, the select_glob
    cap discipline): the driver-side dict is |pairs| <= |types|^2
    entries, sound ONLY for bounded type domains. A bounded probe
    (``limit(max_pairs + 1).count()`` on the checkpointed pair
    aggregate — never the raw corpus) raises loudly past ``max_pairs``
    (default 1e5 ≈ a 316-type domain) BEFORE any collect, so pointing
    ``type_col`` at a high-cardinality column (user ids, URLs) fails
    with a named error instead of a silent driver OOM. Returns
    ``(event_type, weight_fp, share)`` ordered by type.
    """
    if not isinstance(iterations, int) or iterations < 1:
        raise ValueError(
            f"markov_steady_state: iterations must be >= 1 (got {iterations!r})"
        )
    if not isinstance(scale, int) or scale < 1:
        raise ValueError(
            f"markov_steady_state: scale must be a positive int (got {scale!r})"
        )
    if not isinstance(max_pairs, int) or max_pairs < 1:
        raise ValueError(
            f"markov_steady_state: max_pairs must be >= 1 (got {max_pairs!r})"
        )
    counts = event_transitions(
        events, user_col, ts_col, type_col, id_col
    ).select("src_type", "dst_type", "n_transitions")
    # checkpoint BEFORE the probe so the guard's count and the collect
    # share one corpus scan (the two-consumer ReadSchema rule)
    counts = counts.localCheckpoint(eager=True)
    n_pairs = counts.limit(max_pairs + 1).count()
    if n_pairs > max_pairs:
        raise ValueError(
            "markov_steady_state: transition-pair domain exceeds "
            f"max_pairs={max_pairs} — type_col {type_col!r} looks "
            "high-cardinality; the steady-state iteration is driver-side "
            "|types|^2 arithmetic and needs a bounded type domain "
            "(raise max_pairs only if the domain is genuinely bounded)"
        )
    rows = counts.collect()
    if not rows:
        raise ValueError("markov_steady_state: no transitions in input")
    n = {(r["src_type"], r["dst_type"]): int(r["n_transitions"]) for r in rows}
    tot: dict = {}
    for (s, _d), c in n.items():
        tot[s] = tot.get(s, 0) + c
    types = sorted({s for s, _ in n} | {d for _, d in n})
    v = {t: scale for t in types}
    for _ in range(iterations):
        w = {t: 0 for t in types}
        for (s, d), c in n.items():
            w[d] += (v[s] * c) // tot[s]
        v = w
    total = sum(v.values())
    spark = events.sparkSession
    out = spark.createDataFrame(
        [
            (
                t,
                int(v[t]),
                (float(v[t]) / float(total)) if total > 0 else None,
            )
            for t in types
        ],
        "event_type string, weight_fp long, share double",
    )
    return out.orderBy("event_type")
