"""Product-analytics demo — the event-behavior family end to end on the
driver's events table:

  events ─ gap sessionization ─ funnel conversion (view → click →
         purchase inside 7 days) ─ event-transition matrix ─ 7-day
         sliding distinct users from merged daily HLL sketches ─
         lag-24 autocorrelation + click→purchase cross-correlation
         over the hourly series.

Every step is the same operator a gate query drives (sessionization /
funnel / transitions / sliding-HLL / ACF all have DuckDB value oracles);
this script just strings them into the dashboard a product team would
actually read.

Usage:  python examples/product_analytics_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.behavior import event_transitions, funnel_conversion
from rearview_spark.operators.sketch import (
    HLL_M,
    hll_estimate_sparse_expr,
    hll_registers_by,
)
from rearview_spark.operators.timeseries import (
    autocorrelation,
    cross_correlation,
    summarize,
)
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables, events_as_timeseries


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    ev = Tables(spark, sf_dir).events

    # 1. Funnel: first-qualifying-event stages, 7-day deadline from the
    #    first view
    funnel = funnel_conversion(
        ev, steps=("view", "click", "purchase"), horizon="7 days"
    ).orderBy("stage")
    print("funnel:")
    for r in funnel.collect():
        print(f"  stage {r.stage} {r.step:<9} users={r.n_users:<6} "
              f"conversion={r.conversion:.3f}")

    # 2. Transition matrix: what users do next (deterministic ts,
    #    event_id ordering)
    top = (
        event_transitions(ev)
        .orderBy(F.desc("n_transitions"))
        .limit(5)
        .collect()
    )
    print("top transitions:")
    for r in top:
        print(f"  {r.src_type:>8} -> {r.dst_type:<8} n={r.n_transitions:<6} "
              f"p={r.p:.3f}")

    # 3. Weekly actives from merged daily sketches: the serving path
    #    reads <= 64 register rows per day, never raw history
    daily = hll_registers_by(
        ev.withColumn("day", F.date_trunc("day", "ts")), "user_id", ["day"], m=HLL_M
    )
    days = daily.select("day").distinct()
    merged = (
        days.alias("d")
        .join(
            daily.alias("r"),
            (F.col("r.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("r.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), "bucket")
        .agg(F.max("register").alias("register"))
        .groupBy("day")
        .agg(hll_estimate_sparse_expr(HLL_M).alias("wau_est"))
        .orderBy(F.desc("day"))
        .limit(3)
    )
    print("weekly-active estimate (last 3 days):")
    for r in merged.collect():
        print(f"  {r.day}  ~{r.wau_est:.0f} users")

    # 4. Seasonality + lead/lag: hourly series diagnostics
    hourly = summarize(events_as_timeseries(ev), "1 hour", "sum")
    acf = autocorrelation(hourly, lags=(24,)).orderBy("metric").collect()
    print("lag-24 autocorrelation (daily cycle strength):")
    for r in acf:
        print(f"  {r.metric:>8}  acf24={r.acf:+.3f}  (n={r.n_pairs})")
    ccf = (
        cross_correlation(hourly, "click", "purchase", lags=(-2, -1, 0, 1, 2))
        .orderBy("lag")
        .collect()
    )
    best = max(ccf, key=lambda r: (r.ccf is not None, r.ccf))
    print(f"click->purchase ccf peak: lag={best.lag}h r={best.ccf:+.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
