"""Robust per-series anomaly detection: median / MAD (median absolute
deviation) scoring — the modified z-score of Iglewicz & Hoaglin ("How to
Detect and Handle Outliers", ASQC 1993): ``z = 0.6745 * (x - med) / MAD``,
flag when ``|z| > 3.5``.

Reference parity context: the reference's alerting runs user expressions
over fetched series (monitors/evaluate.py); a robust outlier rule is the
stock expression every monitoring shop writes first. Mean/stdev breaks
down exactly when it matters (the outlier inflates the stdev it is
measured against); median/MAD has a 50% breakdown point, so one bad hour
cannot mask itself.

Determinism contract (the oracle gate hashes doubles): the median here is
NOT an interpolated percentile — engines disagree on interpolation
arithmetic in the last ulp. Instead it is the *rank-explicit* form: order
each series by (value, ts), take the rows at ranks ``(n+1) div 2`` and
``n div 2 + 1`` (equal for odd n), and average them with one addition and
one division — written identically in the DataFrame plan and the oracle
SQL, so the bits agree. Inputs are exact-cents doubles (plans/_exact.py),
all downstream ops are single correctly-rounded IEEE operations, and the
anomaly *comparison* ``|0.6745*(x-med)| > 3.5*MAD`` therefore evaluates
identically cross-engine (no rounding anywhere before the filter).

Scale: both medians are per-series window computations — the shuffle key
is the series, never time, so a 1000-executor cluster splits series
across executors and each sort is local to one series's points (hourly
points per series are bounded: one year ≈ 8.8k rows). The whole operator
is ONE scan and ONE series-keyed Exchange feeding two window sorts —
no joins, no re-derivation of the input subtree. For billion-point
single series, swap the exact median for ``percentile_approx`` and drop
the oracle to rows-only; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Iglewicz-Hoaglin constants: 0.6745 ≈ Φ⁻¹(0.75) makes MAD consistent
#: with the stdev of a normal; 3.5 is their recommended cutoff.
MAD_SCALE = 0.6745
DEFAULT_THRESHOLD = 3.5


def _window_median(df: DataFrame, value_col: str, key_col: str, ts_col: str, out_col: str) -> DataFrame:
    """Attach the per-key exact median as a column, in rank-explicit
    window form (module docstring): rank by (value, ts), mark the rows
    at ranks ``(n+1) div 2`` and ``n div 2 + 1`` (equal for odd n), and
    average the marked values with one whole-partition window sum —
    at most two addends, so the 'sum' is a single commutative addition
    and one division. No join, no second scan of the input: the first
    formulation joined a per-key median frame back, which re-derived
    the input subtree and quadrupled the fact scan in the physical
    plan."""
    wp = Window.partitionBy(key_col)
    wo = wp.orderBy(F.col(value_col), F.col(ts_col))
    r = F.row_number().over(wo)
    n = F.count("*").over(wp)
    ranked = df.withColumn("_r", r).withColumn("_n", n)
    matched = F.when(
        (F.col("_r") == F.expr("(_n + 1) div 2"))
        | (F.col("_r") == F.expr("_n div 2 + 1")),
        F.col(value_col),
    )
    return ranked.withColumn(
        out_col, F.sum(matched).over(wp) / F.count(matched).over(wp)
    ).drop("_r", "_n")


def mad_scores(
    series: DataFrame,
    value_col: str = "value",
    key_col: str = "metric",
    ts_col: str = "ts",
) -> DataFrame:
    """Attach per-series robust location/scale: ``med`` (median of the
    value) and ``mad`` (median of |value - med|). Input is the canonical
    tall series (metric, ts, value); output adds dev/med/mad columns.

    ONE scan, one series-keyed Exchange: both medians are window
    computations over the same partitioning (two sort orders — value
    then deviation — so two Sort nodes share one shuffle).

    Null points are dropped up front — Spark's window sort is NULLS
    FIRST ascending, so null rows would occupy the lowest ranks and
    inflate ``_n`` while the marked-value average skips them (e.g.
    [null, 1, 2, 3] would yield median 1.5 instead of 2). A missing
    sample carries no information about the series' location/scale, so
    it must not shift the median rank positions either."""
    series = series.filter(F.col(value_col).isNotNull())
    with_med = _window_median(series, value_col, key_col, ts_col, "med").withColumn(
        "dev", F.abs(F.col(value_col) - F.col("med"))
    )
    return _window_median(with_med, "dev", key_col, ts_col, "mad")


def cusum_drift(
    series: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    value_col: str = "value",
    key_col: str = "metric",
    ts_col: str = "ts",
) -> DataFrame:
    """Two-sided CUSUM drift detection (Page 1954) on the robust z-score
    — the complement to :func:`mad_anomalies`: MAD flags point spikes, a
    CUSUM accumulates many small same-signed deviations so a slow drift
    (memory leak, gradual latency creep) alarms long before any single
    point would.

        z_t  = 0.6745 * (x_t - med) / MAD        (same robust scale)
        S+_t = max(0, S+_{t-1} + z_t - k)        S+_0 = 0
        S-_t = max(0, S-_{t-1} - z_t - k)        S-_0 = 0
        drift when S+ > h or S- > h              (k=0.5, h=5 standard)

    Execution: z is computed JVM-side from the window-median baseline
    (bit-identical cross-engine, module docstring); only the inherently
    sequential recurrence runs as a grouped-pandas pass per series —
    the EMA/Holt-Winters discipline, parallel across series, linear
    within one. Series with MAD = 0 are excluded (z undefined; the
    documented degenerate case). Returns every point with its z,
    cusum_pos/cusum_neg trajectory, and the drift flag — the statistic
    trail a dashboard plots, not just the alarms."""
    import pandas as pd

    # null values are dropped by mad_scores; dropping here too keeps the
    # guarantee local — a NaN z would otherwise reset both accumulators
    # (max-with-0 maps NaN to 0) and silently clear an active alarm
    scored = mad_scores(
        series.filter(F.col(value_col).isNotNull()), value_col, key_col, ts_col
    )
    z = (F.lit(MAD_SCALE) * (F.col(value_col) - F.col("med"))) / F.col("mad")
    base = (
        scored.filter(F.col("mad") > 0)
        .select(key_col, ts_col, value_col, z.alias("z"))
    )

    def _cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        # (ts, z) sort: a bare ts sort would leave same-timestamp rows in
        # shuffle arrival order, making the recurrence nondeterministic
        pdf = pdf.sort_values([ts_col, "z"]).reset_index(drop=True)
        sp = sn = 0.0
        pos, neg = [], []
        for zv in pdf["z"]:
            sp = sp + zv - k
            sp = sp if sp > 0.0 else 0.0
            sn = sn - zv - k
            sn = sn if sn > 0.0 else 0.0
            pos.append(sp)
            neg.append(sn)
        pdf["cusum_pos"] = pos
        pdf["cusum_neg"] = neg
        pdf["drift"] = (pdf["cusum_pos"] > h) | (pdf["cusum_neg"] > h)
        return pdf[
            [key_col, ts_col, value_col, "z", "cusum_pos", "cusum_neg", "drift"]
        ]

    fields = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    schema = (
        f"{key_col} {fields[key_col]}, {ts_col} {fields[ts_col]}, "
        f"{value_col} {fields[value_col]}, z double, "
        "cusum_pos double, cusum_neg double, drift boolean"
    )
    return base.groupBy(key_col).applyInPandas(_cusum, schema)


def mad_anomalies(
    series: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    value_col: str = "value",
    key_col: str = "metric",
    ts_col: str = "ts",
) -> DataFrame:
    """Rows whose modified z-score exceeds ``threshold``: returns
    (key, ts, value, robust_z). The filter compares products, not the
    quotient (``|0.6745*(x-med)| > threshold*MAD``), so it needs no
    division guard; series with MAD = 0 (at least half the points
    identical) yield no anomalies by definition — a constant series with
    one spike is the degenerate case where MAD-based scoring is
    documented to punt (use a plain ``x != med`` rule there)."""
    scored = mad_scores(series, value_col, key_col, ts_col)
    signed = F.lit(MAD_SCALE) * (F.col(value_col) - F.col("med"))
    return (
        scored.filter(
            (F.col("mad") > 0)
            & (F.abs(signed) > F.lit(threshold) * F.col("mad"))
        )
        .select(
            key_col,
            ts_col,
            value_col,
            (signed / F.col("mad")).alias("robust_z"),
        )
    )


def seasonal_mad_anomalies(
    series: DataFrame,
    threshold: float | None = DEFAULT_THRESHOLD,
    period: int = 24,
    bucket_seconds: int = 3600,
    value_col: str = "value",
    key_col: str = "metric",
    ts_col: str = "ts",
) -> DataFrame:
    """:func:`mad_anomalies` against a SEASONAL baseline — each point is
    judged by the robust location/scale of its own recurring slot
    (``slot = (epoch div bucket_seconds) % period`` — hour-of-day at
    the defaults, hour-of-week at period=168) instead of the whole
    series. The global rule flags every Monday 09:00 ramp of a weekday
    metric as an outlier forever; this one learns the ramp and flags
    only departures FROM it — the stock "seasonal baseline" monitor
    rule next to the reference's user-expression alerting.

    Same determinism contract as the module header: rank-explicit exact
    medians per (series, slot), unrounded product comparison
    ``|0.6745*(x-med)| > threshold*MAD``, zero-MAD slots punt. Negative
    epochs fail loudly (the slo_burn/stickiness guard — a truncating
    div AND a sign-carrying % would both diverge from the oracle's
    floor semantics on pre-1970 rows), and so do NULL series keys
    (concat_ws would silently drop the key and score the row in a
    slot-only group the oracle never forms). ``threshold=None`` is
    scores mode (see :func:`seasonal_mad_scores`): every mad>0 point
    keeps its robust_z, no anomaly filter. Slots with MAD = 0 (at least
    half the slot's points identical) yield no anomalies by definition.

    Scale shape: identical to :func:`mad_anomalies` with the shuffle
    key widened to (series, slot) — ONE scan, one Exchange, two window
    sorts; partitions are per-slot subsets of a series (1/period the
    points), so skew only improves. Returns
    ``(key, slot, ts, value, robust_z)``.
    """
    if not isinstance(period, int) or period < 1:
        raise ValueError(
            f"seasonal_mad_anomalies: period must be >= 1 (got {period!r})"
        )
    if not isinstance(bucket_seconds, int) or bucket_seconds < 1:
        raise ValueError(
            "seasonal_mad_anomalies: bucket_seconds must be >= 1 "
            f"(got {bucket_seconds!r})"
        )
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("seasonal_mad_anomalies: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    # integer slot: (epoch div bucket_seconds) % period, both operands
    # non-negative after the guard so truncating and floor agree
    slotted = series.withColumn("_t", t_checked).withColumn(
        "slot", F.expr(f"CAST((_t div {bucket_seconds}) % {period} AS INT)")
    ).drop("_t")
    # NULL series keys fail loudly (ADVICE r15): concat_ws silently
    # DROPS a NULL argument, so a NULL-metric row would collapse into a
    # slot-only group and get scored against strangers, while the
    # TS_SEASONAL_MAD_SQL oracle's JOIN USING (metric, slot) drops NULL
    # metrics entirely — a silent cross-engine divergence. The module's
    # discipline (negative-epoch guard above) is to raise, not guess.
    k_raw = F.col(key_col)
    k_checked = F.when(k_raw.isNotNull(), k_raw).otherwise(
        F.raise_error(
            F.lit(
                f"seasonal_mad_anomalies: NULL {key_col} — fill or filter "
                "NULL series keys before scoring"
            )
        ).cast("string")
    )
    keyed = slotted.withColumn(
        "_skey", F.concat_ws("\x1f", k_checked, F.col("slot"))
    )
    scored = mad_scores(keyed, value_col, "_skey", ts_col)
    signed = F.lit(MAD_SCALE) * (F.col(value_col) - F.col("med"))
    sel = (
        key_col,
        "slot",
        ts_col,
        value_col,
        (signed / F.col("mad")).alias("robust_z"),
    )
    if threshold is None:
        # scores mode (r16, VERDICT_r15 next-round #7): EVERY point of
        # every mad>0 slot keeps its robust_z — the frame a monitor
        # expression consumes as a metric series (the quiet points must
        # exist or an anomaly-free window would read "missing series"
        # instead of "success"). The anomalies mode below stays on the
        # unrounded PRODUCT comparison; a caller comparing published
        # robust_z against a threshold owns that (division-form)
        # contract, as the seasonal lifecycle monitor does.
        return scored.filter(F.col("mad") > 0).select(*sel)
    return (
        scored.filter(
            (F.col("mad") > 0)
            & (F.abs(signed) > F.lit(threshold) * F.col("mad"))
        )
        .select(*sel)
    )


def seasonal_mad_scores(
    series: DataFrame,
    period: int = 24,
    bucket_seconds: int = 3600,
    value_col: str = "value",
    key_col: str = "metric",
    ts_col: str = "ts",
) -> DataFrame:
    """:func:`seasonal_mad_anomalies` in scores mode (threshold=None):
    the full robust-z series over every mad>0 slot, anomalous or not —
    what a monitor expression (``a.abs().max() > 3.5``) consumes as a
    metric series end-to-end (VERDICT_r15 next-round #7; the seasonal
    sibling of the batch half of stream_anomaly_alerts). Same plan
    shape, guards, and determinism contract as the anomalies mode —
    the only delta is the absent threshold filter."""
    return seasonal_mad_anomalies(
        series,
        threshold=None,
        period=period,
        bucket_seconds=bucket_seconds,
        value_col=value_col,
        key_col=key_col,
        ts_col=ts_col,
    )


def mean_shift_changepoints(
    ts: DataFrame,
    window: int = 12,
    z: float = 2.0,
    metric_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Changepoint sweep via the two-sample sliding mean-shift score: at
    every grid point, compare the mean of the ``window`` points ENDING
    just before it against the mean of the ``window`` points starting
    at it, normalized by the pooled standard deviation —
    ``z = (post_mean - pre_mean) / sqrt((var_pre + var_post) / 2)``.
    Points where ``|z|`` exceeds the threshold mark level shifts: the
    offline DETECTION sweep, complementary to the sequential CUSUM
    accumulator above (CUSUM answers "has this stream drifted yet";
    this answers "where did the level move" over history).

    Only full two-sided windows score (count == window on both sides);
    edges return no verdict rather than a diluted one.

    Scale shape: two frame specs over ONE per-metric ordered window
    spec — Catalyst collapses them into a single WindowExec partitioned
    by metric (never global), one shuffle. All arithmetic on the frame
    aggregates is a fixed expression tree ending in one division —
    the same nudged-rounding contract every float gate uses applies
    downstream.

    Returns ``(metric, ts, pre_avg, post_avg, shift_z, is_shift)`` with
    ``shift_z`` null where the pooled deviation is zero (two flat
    windows — no scale to judge a shift against).
    """
    from pyspark.sql import Window

    wpre = (
        Window.partitionBy(metric_col)
        .orderBy(ts_col)
        .rowsBetween(-window, -1)
    )
    wpost = (
        Window.partitionBy(metric_col)
        .orderBy(ts_col)
        .rowsBetween(0, window - 1)
    )
    v = F.col(value_col)
    scored = ts.select(
        metric_col,
        ts_col,
        F.count(v).over(wpre).alias("_pre_n"),
        F.count(v).over(wpost).alias("_post_n"),
        F.avg(v).over(wpre).alias("pre_avg"),
        F.avg(v).over(wpost).alias("post_avg"),
        F.var_pop(v).over(wpre).alias("_pre_var"),
        F.var_pop(v).over(wpost).alias("_post_var"),
    ).filter((F.col("_pre_n") == window) & (F.col("_post_n") == window))
    pooled = F.sqrt((F.col("_pre_var") + F.col("_post_var")) / F.lit(2.0))
    score = (F.col("post_avg") - F.col("pre_avg")) / F.nullif(
        pooled, F.lit(0.0)
    )
    return scored.select(
        metric_col,
        ts_col,
        "pre_avg",
        "post_avg",
        score.alias("shift_z"),
        F.coalesce(F.abs(score) > F.lit(z), F.lit(False)).alias("is_shift"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    bins: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """Population stability index between the first and second half of
    the frame's time range — THE ML-monitoring drift score: bin the
    baseline period into ``bins`` discrete-percentile buckets, compare
    the current period's occupancy, and sum
    ``(q_i - p_i) * ln(q_i / p_i)`` (add-one smoothed, so empty bins
    never blow up). PSI < 0.1 reads "stable", 0.1-0.25 "shifting",
    > 0.25 "drifted".

    Cross-engine determinism (the source_kl_divergence discipline):
    bin edges are EXACT data values (percentile_disc ≡ DuckDB
    quantile_disc — no interpolation arithmetic), collected once as
    bounded literals (pq_fit class) into a CASE-chain bin assignment —
    the customer_value_deciles broadcast-boundary pattern, zero global
    sort; each summand's divide/log/multiply sequence is mirrored
    token-for-token in the oracle and quantized to 1e-9 units, so both
    engines sum identical int64s in any order. Driver scalars: the
    period midpoint (min/max ts) and the ``bins - 1`` edges.

    Returns one row ``(n_base, n_cur, psi)``.
    """
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.col(ts_col).cast("long").alias("t"), F.col(value_col).alias("v")
    )
    rng = v.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).collect()[0]
    if rng["lo"] is None:
        raise ValueError("psi_drift: empty input")
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
    return psi_from_occupancy(
        psi_occupancy(base, edge_vals, "c_base"),
        psi_occupancy(cur, edge_vals, "c_cur"),
        bins=bins,
        scale=scale,
    )


def psi_bin_expr(edge_vals: list, value_col: str = "v"):
    """CASE-chain bin assignment against literal edges (shared by the
    batch and streaming PSI forms)."""
    e = F.when(F.col(value_col) <= F.lit(edge_vals[0]), F.lit(0))
    for k, b in enumerate(edge_vals[1:], start=1):
        e = e.when(F.col(value_col) <= F.lit(b), F.lit(k))
    return e.otherwise(F.lit(len(edge_vals)))


def psi_occupancy(period: DataFrame, edge_vals: list, out: str) -> DataFrame:
    """Per-bin counts ``(bin, out)`` for one period — the mergeable
    summary (counts combine by ADDITION, so micro-batched builds are
    bit-identical to one pass; the CM-sketch property)."""
    return (
        period.select(psi_bin_expr(edge_vals).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(out))
    )


def psi_from_occupancy(
    base_occ: DataFrame,
    cur_occ: DataFrame,
    bins: int,
    scale: int = 10**9,
) -> DataFrame:
    """The PSI summary row from two occupancy tables — identical
    arithmetic whether the current occupancy came from one pass or a
    streaming merge."""
    both = base_occ.join(cur_occ, "bin", "full_outer").select(
        "bin",
        F.coalesce("c_base", F.lit(0)).alias("c_base"),
        F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
    )
    totals = both.agg(
        F.sum("c_base").alias("n_base"), F.sum("c_cur").alias("n_cur")
    ).collect()[0]
    nb, nc = int(totals["n_base"] or 0), int(totals["n_cur"] or 0)
    p = (F.col("c_base") + F.lit(1)) / F.lit(float(nb + bins))
    q = (F.col("c_cur") + F.lit(1)) / F.lit(float(nc + bins))
    units = F.round((q - p) * F.log(q / p) * F.lit(float(scale))).cast("long")
    return both.agg(F.sum(units).alias("_u")).select(
        F.lit(nb).cast("long").alias("n_base"),
        F.lit(nc).cast("long").alias("n_cur"),
        (F.col("_u") / F.lit(float(scale))).alias("psi"),
    )


def psi_foreach_batch(spark, state_dir: str, edge_vals: list):
    """PSI occupancy as a ``foreachBatch`` recurrence — the CM/HLL
    contract from operators/sketch.py: each micro-batch's per-bin
    counts ADD into the previous persisted state, written to a
    ``batch=<id>`` subdir (a retried batch re-merges from its
    predecessor, so a crash between write and commit never
    double-counts). Because counts merge by addition, the streamed
    state is bit-identical to one batch pass over the union — the PSI
    read off it needs no weaker oracle. Batch frames must carry the
    value column as ``v``."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = psi_occupancy(batch_df, edge_vals, "c_cur")
        prev = _latest_batch_dir(spark, state_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionByName(spark.read.parquet(prev))
        merged = cur.groupBy("bin").agg(F.sum("c_cur").alias("c_cur"))
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the rows
    with ``group_col`` = 0 (baseline) and = 1 (current):

        D = max over x of | F_a(x) - F_b(x) |

    computed ENTIRELY in integers — per distinct value the two
    empirical CDFs are cumulative counts, and

        D * n_a * n_b = max | cum_a(x) * n_b - cum_b(x) * n_a |

    so the max runs over exact int64 cross-products and the only float
    is ONE final division (the roc_auc/OLS discipline — no rounding
    contract needed). Complements :func:`psi_drift`: PSI scores binned
    occupancy shift (smoothed, parametric in the bin count); KS is the
    bin-free sup-norm distance the classic distribution-drift test
    uses, sensitive to the single worst CDF gap.

    ``group_col`` must be 0/1 (validated at execution — the
    evaluation-family guard). Integer envelope: ``cum * n`` caps at
    ``n_a * n_b``, exact in int64 up to ~3e9 rows per side — beyond
    that, pre-aggregate or sample a side before testing.

    Scale shape: ONE corpus-collapsing hash aggregate to the distinct-
    value domain (map-side partials), two ascending prefix sums over
    that collapsed frame via ``global_running_sum`` (range-partitioned
    cumsums + broadcast prefix totals — never a single-task window),
    a broadcast one-row totals join, one summary aggregate. No window
    over the raw data, nothing corpus-sized past the first aggregate.

    Returns one row ``(n_a, n_b, d_num, d_stat, at_value)`` —
    ``d_num`` is the exact integer ``D * n_a * n_b`` an oracle asserts
    without floats; ``at_value`` is the SMALLEST value achieving the
    max (deterministic under ties); ``d_stat`` is NULL when either
    side is empty (undefined rather than divide-by-zero).
    """
    return ks_from_counts(ks_value_counts(df, value_col, group_col))


def ks_value_counts(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Per-distinct-value group counts ``(v, ca, cb)`` — the mergeable
    KS summary: counts combine by ADDITION, so micro-batched builds
    (or a union of separately-counted sides) are bit-identical to one
    pass (the CM/HLL/PSI-occupancy property). ``group_col`` must be
    0/1, validated at execution (operators/_util.binary_flag_guard).

    NULL values of ``value_col`` are EXCLUDED here (a NULL carries no
    CDF position: it would form a phantom step that Spark and DuckDB
    would additionally order on opposite ends — the exact divergence
    calibration_bins documents), so the empirical CDFs are over the
    non-NULL domain and ``n_a``/``n_b`` count non-NULL rows only."""
    from rearview_spark.operators._util import binary_flag_guard

    grp = binary_flag_guard(group_col, "ks_value_counts")
    return df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(value_col).alias("v")
    ).agg(
        F.sum(F.lit(1) - grp).alias("ca"),
        F.sum(grp).alias("cb"),
    )


def ks_from_counts(per_v: DataFrame) -> DataFrame:
    """The KS summary row from a ``(v, ca, cb)`` counts frame —
    identical arithmetic whether the counts came from one
    :func:`ks_value_counts` pass or a streaming/union merge (duplicate
    ``v`` rows are re-collapsed first, so merging is a pure union)."""
    from rearview_spark.operators._util import global_running_sums

    per_v = per_v.groupBy("v").agg(
        F.sum("ca").alias("ca"), F.sum("cb").alias("cb")
    )
    cum = global_running_sums(
        per_v, ["v"], ["ca", "cb"], ["cum_a", "cum_b"]
    )
    # totals from the (checkpointed, distinct-value-sized) cum frame —
    # aggregating per_v here would RE-EXECUTE the corpus-collapsing
    # count plan from the raw input a second time
    totals = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    diffs = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("dn"),
    )
    agg = diffs.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("dn").alias("d_num"),
        F.expr("min_by(v, struct(-dn, v))").alias("at_value"),
    )
    return agg.select(
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        F.coalesce("d_num", F.lit(0)).cast("long").alias("d_num"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.col("d_num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        ).alias("d_stat"),
        "at_value",
    )


def ks_foreach_batch(spark, state_dir: str):
    """KS current-side value counts as a ``foreachBatch`` recurrence —
    the psi_foreach_batch/CM/HLL contract verbatim: each micro-batch's
    per-value counts ADD into the previous persisted state, written to
    a ``batch=<id>`` subdir (a retried batch re-merges from its
    predecessor, never double-counts). Because counts merge by
    addition, the streamed state is bit-identical to one batch pass
    over the union, so the KS read off it shares the batch gate's FULL
    value oracle. Batch frames must carry the value column as ``v``.

    State size is the distinct-VALUE domain of the current side, not
    its row count — same boundedness argument as the PSI bins, wider
    domain; for truly unbounded continuous domains quantize ``v``
    upstream (the operator itself never needs to)."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.groupBy("v").agg(F.count(F.lit(1)).alias("c_cur"))
        prev = _latest_batch_dir(spark, state_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionByName(spark.read.parquet(prev))
        merged = cur.groupBy("v").agg(F.sum("c_cur").alias("c_cur"))
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def ks_by_foreach_batch(spark, state_dir: str):
    """Per-segment KS current-side value counts as a ``foreachBatch``
    recurrence — :func:`ks_foreach_batch` with the segment key folded
    into the state key (VERDICT_r13 next-round #6): each micro-batch's
    per-(key, value) counts ADD into the previous persisted state under
    a ``batch=<id>`` subdir (a retried batch re-merges from its
    predecessor, never double-counts). Counts merge by addition, so
    the streamed state is bit-identical to one batch pass over the
    union and the per-segment KS read off it shares the batch gate's
    FULL value oracle. Batch frames must carry ``(key, v)``.

    State size is the union of per-segment distinct-VALUE domains —
    the :func:`ks_foreach_batch` boundedness argument summed over
    segments; quantize ``v`` upstream for unbounded continuous
    domains (the segment key itself is categorical by construction)."""
    from rearview_spark.operators.sketch import _latest_batch_dir

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.groupBy("key", "v").agg(
            F.count(F.lit(1)).alias("c_cur")
        )
        prev = _latest_batch_dir(spark, state_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionByName(spark.read.parquet(prev))
        merged = cur.groupBy("key", "v").agg(F.sum("c_cur").alias("c_cur"))
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def slo_burn_rate(
    df: DataFrame,
    ts_col: str = "ts",
    kind_col: str = "event_type",
    error_kind: str = "error",
    bucket_seconds: int = 3600,
    short_windows: int = 1,
    long_windows: int = 6,
    budget: float = 0.01,
) -> DataFrame:
    """Multi-window SLO error-budget burn rate — the SRE alerting rule
    (Beyer et al., "Site Reliability Workbook" ch. 5) the reference's
    monitor scripts approximate by hand: per time bucket, the error
    rate over a SHORT trailing window and a LONG one, each normalized
    by the budget; page when BOTH exceed 1 (short = it's happening
    now, long = it's not just a blip).

    Exactness: bucket counts are exact int64 over a DENSE bucket grid
    (missing buckets materialize as zeros via one F.sequence explode —
    grid size is calendar-bounded, not data-bounded); trailing-window
    sums are PREFIX-SUM DIFFERENCES — two global_running_sum passes +
    two equi-joins on ``bucket - w`` (never a partition-less rolling
    window); each rate/burn is a fixed double expression over exact
    integers, mirrored op-for-op in the oracle. Only FULL windows emit
    (edges return no verdict — the mean_shift_changepoints rule).

    Scale shape: one corpus collapse to the bucket grid, then
    everything runs on grid-sized frames (prefix sums, two self-joins,
    the final select). Returns per bucket:
    ``(bucket, n_short, err_short, n_long, err_long, burn_short,
    burn_long, page)`` ascending; burn is NULL where the window saw no
    traffic.
    """
    from rearview_spark.operators._util import global_running_sums

    if not isinstance(bucket_seconds, int) or bucket_seconds < 1:
        raise ValueError(
            "slo_burn_rate: bucket_seconds must be a positive int "
            f"(got {bucket_seconds!r})"
        )
    if not (0.0 < budget < 1.0):
        raise ValueError(f"slo_burn_rate: budget must be in (0, 1), got {budget!r}")
    if not (
        isinstance(short_windows, int)
        and isinstance(long_windows, int)
        and 1 <= short_windows < long_windows
    ):
        raise ValueError(
            "slo_burn_rate: need integer 1 <= short_windows < long_windows "
            f"(got {short_windows!r}, {long_windows!r})"
        )
    # pre-1970 timestamps would split Spark's truncating `div` from the
    # oracle's floor `//` (and merge two buckets around epoch 0) — in
    # this domain a negative epoch is sentinel noise, so fail loudly
    t_raw = F.col(ts_col).cast("long")
    t_checked = F.when(t_raw >= 0, t_raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit("slo_burn_rate: negative epoch timestamp "),
                F.coalesce(t_raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    base = df.select(
        t_checked.alias("_t"),
        (F.col(kind_col) == error_kind).cast("int").alias("_e"),
    ).select(
        F.expr(f"_t div {bucket_seconds}").alias("bucket"), "_e"
    )
    counts = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_e").alias("err")
    )
    rng = counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = rng.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("bucket")
    )
    dense = (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("err", F.lit(0)).alias("err"),
        )
    )
    cum = global_running_sums(
        dense, ["bucket"], ["n", "err"], ["cum_n", "cum_err"]
    )

    def trailing(w: int, n_out: str, e_out: str) -> DataFrame:
        # LEFT join + coalesce-0: bucket lo+w-1 has w fully-observed
        # buckets but its prefix row sits before the grid (cum = 0) —
        # an inner join would silently drop the FIRST valid verdict of
        # every dataset (an outage in the opening window could never
        # page). Buckets before lo+w-1 have genuinely partial windows
        # and emit nothing (the mean_shift edge rule).
        prev = cum.select(
            (F.col("bucket") + F.lit(w)).alias("bucket"),
            F.col("cum_n").alias("_pn"),
            F.col("cum_err").alias("_pe"),
        )
        return (
            cum.join(prev, "bucket", "left")
            .crossJoin(F.broadcast(rng))
            .filter(F.col("bucket") - F.col("lo") >= w - 1)
            .select(
                "bucket",
                (F.col("cum_n") - F.coalesce("_pn", F.lit(0))).alias(n_out),
                (F.col("cum_err") - F.coalesce("_pe", F.lit(0))).alias(e_out),
            )
        )

    s = trailing(short_windows, "n_short", "err_short")
    lw = trailing(long_windows, "n_long", "err_long")
    joined = s.join(lw, "bucket")

    def burn(e_col: str, n_col: str):
        return F.when(
            F.col(n_col) > 0,
            (F.col(e_col).cast("double") / F.col(n_col).cast("double"))
            / F.lit(float(budget)),
        )

    bs = burn("err_short", "n_short")
    bl = burn("err_long", "n_long")
    return joined.select(
        "bucket",
        F.col("n_short").cast("long"),
        F.col("err_short").cast("long"),
        F.col("n_long").cast("long"),
        F.col("err_long").cast("long"),
        bs.alias("burn_short"),
        bl.alias("burn_long"),
        (
            F.coalesce(bs > 1.0, F.lit(False))
            & F.coalesce(bl > 1.0, F.lit(False))
        ).alias("page"),
    ).orderBy("bucket")


def ks_two_sample_by(
    df: DataFrame, value_col: str, group_col: str, key_col: str
) -> DataFrame:
    """Per-segment two-sample KS — the drilldown of
    :func:`ks_two_sample`: one D statistic per ``key_col`` value (per
    event type, per region, per model version), answering "WHICH slice
    drifted" after the global test fires.

    Same exact-integer contract (cumulative cross-products, one final
    division per key). Execution differs from the global form on
    purpose: the prefix sums run under a WINDOW PARTITIONED BY the key
    (per-partition size = the segment's distinct-VALUE domain — the
    mad_scores per-series boundedness argument, stated because a
    single segment with an unbounded continuous domain needs upstream
    quantization), so no global range pass and no driver collect at
    all — the whole operator is two hash aggregates and one partitioned
    window over the collapsed frame.

    Returns ``(key, n_a, n_b, d_num, d_stat, at_value)`` ordered by
    key; ``d_stat`` NULL where a segment lacks one side.
    """
    return ks_by_from_counts(
        ks_by_value_counts(df, value_col, group_col, key_col)
    )


def ks_by_value_counts(
    df: DataFrame, value_col: str, group_col: str, key_col: str
) -> DataFrame:
    """Per-(segment, value) group counts ``(key, v, ca, cb)`` — the
    mergeable per-segment KS summary (the :func:`ks_value_counts`
    contract with the key folded into the grouping): counts combine by
    ADDITION, so micro-batched builds are bit-identical to one pass.
    Same 0/1 ``group_col`` guard and NULL-``value_col`` exclusion (a
    NULL carries no CDF position) as the global form."""
    from rearview_spark.operators._util import binary_flag_guard

    grp = binary_flag_guard(group_col, "ks_two_sample_by")
    return df.filter(F.col(value_col).isNotNull()).groupBy(
        F.col(key_col).alias("key"), F.col(value_col).alias("v")
    ).agg(
        F.sum(F.lit(1) - grp).alias("ca"),
        F.sum(grp).alias("cb"),
    )


def ks_by_from_counts(per_kv: DataFrame) -> DataFrame:
    """Per-segment KS summaries from a ``(key, v, ca, cb)`` counts
    frame — identical arithmetic whether the counts came from one
    :func:`ks_by_value_counts` pass or a streaming/union merge
    (duplicate ``(key, v)`` rows re-collapse first, so merging is a
    pure union — the :func:`ks_from_counts` discipline, segmented)."""
    from pyspark.sql import Window

    per_v = per_kv.groupBy("key", "v").agg(
        F.sum("ca").alias("ca"), F.sum("cb").alias("cb")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wk = Window.partitionBy("key")
    cum = per_v.select(
        "key",
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wk).alias("n_a"),
        F.sum("cb").over(wk).alias("n_b"),
    )
    diffs = cum.select(
        "key",
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("dn"),
    )
    return (
        diffs.groupBy("key")
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max("dn").cast("long").alias("d_num"),
            F.expr("min_by(v, struct(-dn, v))").alias("at_value"),
        )
        .select(
            "key",
            "n_a",
            "n_b",
            "d_num",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            ).alias("d_stat"),
            "at_value",
        )
        .orderBy("key")
    )
