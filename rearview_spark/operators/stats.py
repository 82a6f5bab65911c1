"""Statistical rigor at scale — Poisson bootstrap resampling, the
one-pass way to put an error bar on a corpus-level metric (mean order
value, mean quality score, dedup rate) when a 100 TB table cannot be
resampled row-by-row: each of R replicas weights every row by an
independent Poisson(1) draw (the large-n limit of multinomial
bootstrap weights), and the spread of the replica means IS the
sampling distribution of the estimator.

Everything is deterministic and oracle-replayable: the Poisson draw
for (row, replica) comes from the repo's md5-prefix hash reduced mod
1e9 and compared against INTEGER CDF thresholds (the literal table
below, shared verbatim with the SQL oracle) — no RNG, no float
comparisons, rerun-stable like every sampler in curation.py. Replica
means are single divisions of exact int64 sums (the roc_auc/OLS
discipline), and the CI bounds are ``percentile_disc`` picks of
actual replica means — element selection, not interpolation.

Not rearview parity; north-star pipeline scope.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rearview_spark.operators.dedup import _hash60

# Poisson(1) CDF quantized to integer parts-per-1e9, truncated at
# weight 9 (residual mass ~1.1e-6 — at most a 9-repeat of one row per
# ~10^6 (row, replica) pairs is clipped; the clip is part of the
# operator's definition and the oracle replays it). Generated from
# math.exp once at import; both engines then compare the SAME integer
# literals, so there is no cross-engine float boundary anywhere.
_POISSON1_CDF_PPB: list[int] = []
_acc = 0.0
for _k in range(9):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POISSON1_CDF_PPB.append(int(_acc * 1_000_000_000))


def poisson1_weight(id_col, replica_col, salt: str):
    """Deterministic Poisson(1) weight for (id, replica): u = md5-60bit
    of ``id:salt:replica`` mod 1e9, weight = #thresholds <= u. Column
    expression — JVM-side, no UDF."""
    u = F.pmod(
        _hash60(
            F.concat(
                id_col.cast("string"),
                F.lit(f":{salt}:"),
                replica_col.cast("string"),
            )
        ),
        F.lit(1_000_000_000),
    )
    thresholds = F.array(*[F.lit(t) for t in _POISSON1_CDF_PPB])
    return F.size(F.filter(thresholds, lambda t: u >= t)).cast("long")


def bootstrap_replica_means(
    df: DataFrame,
    id_col: str,
    value_col: str,
    replicas: int = 200,
    cents_scale: int = 100,
    salt: str = "boot",
) -> DataFrame:
    """Per-replica weighted means ``(replica, n_eff, mean)``: one pass
    — each row explodes into ``replicas`` (row, replica) pairs
    MAP-SIDE (a literal int array; the explode multiplies CPU, never
    storage), weights come from :func:`poisson1_weight`, and one hash
    aggregate keyed by the replica id (R-row key domain — the shuffle
    carries R * partitions partial rows, not the corpus) produces
    exact int64 sufficient sums. ``mean`` is ONE division of exact
    integers; ``value_col`` is quantized to ``cents_scale`` units
    first (the plans/_exact.py contract — sums are
    aggregation-order-immune).

    Replicas with zero effective weight (possible only for tiny
    frames) yield NULL means rather than a divide-by-zero.
    """
    if replicas < 1:
        raise ValueError(f"bootstrap_replica_means: replicas must be >= 1, got {replicas}")
    if cents_scale < 1:
        raise ValueError(
            f"bootstrap_replica_means: cents_scale must be >= 1, got {cents_scale}"
        )
    cents = F.round(F.col(value_col) * F.lit(float(cents_scale))).cast("long")
    exploded = df.select(
        F.col(id_col).alias("_id"),
        cents.alias("_c"),
        F.explode(F.array(*[F.lit(r) for r in range(replicas)])).alias("replica"),
    )
    w = poisson1_weight(F.col("_id"), F.col("replica"), salt)
    agg = (
        exploded.select("replica", w.alias("_w"), "_c")
        .groupBy("replica")
        .agg(
            F.sum("_w").alias("n_eff"),
            F.sum(F.col("_w") * F.col("_c")).alias("_wc"),
        )
    )
    return agg.select(
        "replica",
        F.col("n_eff").cast("long").alias("n_eff"),
        F.when(
            F.col("n_eff") > 0,
            (F.col("_wc").cast("double") / F.col("n_eff").cast("double"))
            / F.lit(float(cents_scale)),
        ).alias("mean"),
    )


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    replicas: int = 200,
    cents_scale: int = 100,
    salt: str = "boot",
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """One-row bootstrap summary ``(n_rows, n_replicas, mean_full,
    ci_lo, ci_hi)``: the point estimate is the exact full-data mean
    (one int64 division), the interval is the (lo, hi)
    ``percentile_disc`` of the replica means — discrete element picks
    over an R-row frame, deterministic because every replica mean is
    itself bit-determined. R-row final aggregate; all heavy lifting is
    the single pass in :func:`bootstrap_replica_means`.
    """
    reps = bootstrap_replica_means(
        df, id_col, value_col, replicas, cents_scale, salt
    )
    cents = F.round(F.col(value_col) * F.lit(float(cents_scale))).cast("long")
    full = df.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(cents).alias("_c")
    ).select(
        "n_rows",
        (
            (F.col("_c").cast("double") / F.col("n_rows").cast("double"))
            / F.lit(float(cents_scale))
        ).alias("mean_full"),
    )
    ci = reps.agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.expr(
            f"percentile_disc({lo}) WITHIN GROUP (ORDER BY mean)"
        ).alias("ci_lo"),
        F.expr(
            f"percentile_disc({hi}) WITHIN GROUP (ORDER BY mean)"
        ).alias("ci_hi"),
    )
    return full.crossJoin(ci).select(
        "n_rows", "n_replicas", "mean_full", "ci_lo", "ci_hi"
    )


def two_proportion_ztest(
    df: DataFrame, group_col: str, success_col: str
) -> DataFrame:
    """Two-proportion z-test between variant 0 (control) and variant 1
    (treatment): the standard A/B readout —

        z = (p1 - p0) / sqrt(p * (1 - p) * (1/n0 + 1/n1))

    with ``p`` the pooled success rate. Counts are exact int64; every
    rate is ONE division of exact integers; the z expression is a FIXED
    double tree (divisions, one sqrt — IEEE exactly-rounded operations,
    identical bits cross-engine when mirrored operation-for-operation).
    No p-value column on purpose: the normal CDF needs erf, which is
    not expressible identically in both engines — callers compare |z|
    against their critical value (1.96 for 5% two-sided).

    ``group_col`` and ``success_col`` must both be 0/1 (validated at
    execution — the evaluation-family guard). One unit per row: if the
    experiment randomizes users but the frame has events, collapse to
    per-user rows FIRST (the gate does) or the test is over-powered by
    within-user correlation.

    Scale shape: ONE hash aggregate over the whole frame to four int64
    counters (map-side partials); all arithmetic on the one-row result.

    Returns one row ``(n0, n1, conv0, conv1, rate0, rate1, diff, z)``;
    ``z`` is NULL when either variant is empty or the pooled rate is
    degenerate (0 or 1 — no variance to test against).
    """

    from rearview_spark.operators._util import binary_flag_guard

    g = binary_flag_guard(group_col, "two_proportion_ztest")
    s = binary_flag_guard(success_col, "two_proportion_ztest")
    agg = df.agg(
        F.sum(F.lit(1) - g).cast("long").alias("n0"),
        F.sum(g).cast("long").alias("n1"),
        F.sum((F.lit(1) - g) * s).cast("long").alias("conv0"),
        F.sum(g * s).cast("long").alias("conv1"),
    )
    rate0 = F.col("conv0").cast("double") / F.col("n0").cast("double")
    rate1 = F.col("conv1").cast("double") / F.col("n1").cast("double")
    pooled = (F.col("conv0") + F.col("conv1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    ok = (
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (F.col("conv0") + F.col("conv1") > 0)
        & (F.col("conv0") + F.col("conv1") < F.col("n0") + F.col("n1"))
    )
    return agg.select(
        F.coalesce("n0", F.lit(0)).cast("long").alias("n0"),
        F.coalesce("n1", F.lit(0)).cast("long").alias("n1"),
        F.coalesce("conv0", F.lit(0)).cast("long").alias("conv0"),
        F.coalesce("conv1", F.lit(0)).cast("long").alias("conv1"),
        F.when(F.col("n0") > 0, rate0).alias("rate0"),
        F.when(F.col("n1") > 0, rate1).alias("rate1"),
        F.when((F.col("n0") > 0) & (F.col("n1") > 0), rate1 - rate0).alias(
            "diff"
        ),
        F.when(ok, (rate1 - rate0) / se).alias("z"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    scale: int = 10**9,
) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring — time-to-event
    over (duration, observed) subject rows (time to first conversion,
    session lifetime, hardware time-to-failure):

        S(t) = prod over event times s <= t of (n_risk(s) - d(s)) / n_risk(s)

    where ``n_risk(s)`` counts subjects with duration >= s and ``d(s)``
    the events AT s; censored subjects (``event_col`` = 0) leave the
    risk set without stepping the curve.

    Cross-engine determinism: the product is computed in LOG space as a
    cumulative SUM of per-step ``ln((n_risk - d) / n_risk)`` terms
    quantized to 1/``scale`` units in int64 (the source_kl/NB ln
    contract — order-free integer addition), with ONE exp per output
    row at the nudged-6dp edge. ``n_risk`` and ``d`` come out exact for
    a stronger oracle assertion. A step where d == n_risk (the risk set
    dies out) yields survival exactly 0.0 — necessarily the last event
    row, special-cased around the ln singularity.

    Scale shape: one hash collapse to the distinct-duration domain,
    one global_running_sum for the at-risk prefix (range-partitioned —
    never a single-task window), one more for the log-survival prefix
    over event rows, a broadcast one-row total. Nothing subject-sized
    past the first aggregate.

    ``duration_col`` must be integral and non-negative, ``event_col``
    0/1 — both validated at execution.

    Returns ``(t, n_risk, d, c, survival)`` — one row per EVENT time
    ascending; ``c`` counts censorings at that same time (which exit
    the risk set after the step, the standard convention).
    """
    from rearview_spark.operators._util import (
        binary_flag_guard,
        global_running_sum,
    )

    dur = F.col(duration_col).cast("long")
    t_checked = F.when(dur >= 0, dur).otherwise(
        F.raise_error(
            F.concat(
                F.lit("kaplan_meier: duration must be >= 0, got "),
                F.coalesce(dur.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    ev = binary_flag_guard(event_col, "kaplan_meier")
    per_t = (
        df.select(t_checked.alias("t"), ev.alias("_e"))
        .groupBy("t")
        .agg(
            F.sum("_e").alias("d"),
            F.sum(F.lit(1) - F.col("_e")).alias("c"),
        )
        .withColumn("dc", F.col("d") + F.col("c"))
    )
    cum = global_running_sum(per_t, ["t"], "dc", out_col="cum_dc")
    # total from the (checkpointed, duration-domain-sized) cum frame —
    # aggregating per_t would re-execute the subject collapse from the
    # raw frame a second time
    total = cum.agg(F.sum("dc").cast("long").alias("_n"))
    at_risk = cum.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (F.col("_n") - (F.col("cum_dc") - F.col("dc"))).alias("n_risk"),
    )
    steps = at_risk.filter(F.col("d") > 0)
    units = F.when(
        F.col("d") < F.col("n_risk"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(float(scale))
        ).cast("long"),
    ).otherwise(F.lit(0))
    curve = global_running_sum(
        steps.withColumn("_u", units), ["t"], "_u", out_col="cum_u"
    )
    return curve.select(
        F.col("t").cast("long"),
        F.col("n_risk").cast("long"),
        F.col("d").cast("long"),
        F.col("c").cast("long"),
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.col("cum_u") / F.lit(float(scale))) + F.lit(5e-10), 6
            )
        )
        .alias("survival"),
    ).orderBy("t")
