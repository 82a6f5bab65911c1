"""Growth-and-health demo — the round-14 wave end to end on the
driver's tables:

  events ─ weekly cohort-retention rate triangle ─ daily new-vs-
         returning mix (batch AND the set-union streaming recurrence) ─
         Pareto volume-concentration deciles ─ per-kind inter-arrival
         gap statistics ─ hourly-series gap audit ─ seasonal-naive
         forecast scorecard; lineitem/orders ─ Pearson correlation
         matrix ─ FK-integrity + functional-dependency audits;
         co-order part graph ─ Adamic-Adar "also bought" candidates;
         plus the Markov steady-state occupancy read and the max-merge
         metric-staleness monitor.

The round-15 wave extends the same dashboard: Gini traffic
concentration (the Pareto curve's scalar), per-source Simpson token
diversity, seasonal-slot MAD anomalies, and the retention triangle as
a standing set-union streaming query proved equal to the batch read.

Usage:  python examples/growth_health_demo.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.anomaly import seasonal_mad_anomalies
from rearview_spark.operators.behavior import (
    cohort_retention,
    gini_concentration,
    interarrival_summary,
    markov_steady_state,
    mix_from_user_buckets,
    new_vs_returning,
    pareto_share,
    retention_from_user_buckets,
    user_activity_foreach_batch,
)
from rearview_spark.operators.graph import adamic_adar, frequent_item_pairs
from rearview_spark.operators.profiling import (
    correlation_matrix,
    fd_violations,
    fk_integrity_audit,
)
from rearview_spark.operators.sketch import _latest_batch_dir
from rearview_spark.operators.text import source_simpson_diversity
from rearview_spark.operators.timeseries import (
    forecast_accuracy,
    metric_staleness,
    series_gap_audit,
    summarize,
    time_shift,
)
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables, events_as_timeseries


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    t = Tables(spark, sf_dir)

    # 1. The growth dashboard: who we acquired, who came back
    retention = cohort_retention(t.events)
    print("cohort retention cells:", retention.count())
    retention.show(8, truncate=False)

    mix = new_vs_returning(t.events)
    print("new-vs-returning days:", mix.count())

    # ...and the same mix from the set-union streaming recurrence:
    # three micro-batch slices, state = distinct (user, day)
    ub = t.events.select(
        F.col("user_id").alias("u"),
        F.expr("CAST(ts AS LONG) div 86400").alias("bucket"),
    )
    state = tempfile.mkdtemp(prefix="demo_unr_")
    try:
        proc = user_activity_foreach_batch(spark, state)
        for i in range(3):
            proc(ub.filter(F.col("bucket") % 3 == i), i)
        streamed = mix_from_user_buckets(
            spark.read.parquet(_latest_batch_dir(spark, state))
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state, ignore_errors=True)
    assert [tuple(r) for r in streamed.collect()] == [
        tuple(r) for r in mix.collect()
    ], "streamed mix must equal the batch pass"
    print("streamed mix == batch mix over", streamed.count(), "days")

    # 2. Where the volume concentrates, and how arrivals space out
    pareto_share(t.events).show(10, truncate=False)
    interarrival_summary(t.events).show(truncate=False)

    # 3. Collection health: series gaps + naive-forecast scorecard
    series = events_as_timeseries(t.events)
    series_gap_audit(series).show(truncate=False)
    hourly = summarize(series, "1 hour", "sum")
    days = hourly.select(F.date_trunc("day", "ts").alias("d")).distinct()
    d0, d1 = [r["d"] for r in days.orderBy("d").limit(2).collect()][:2]
    actual = hourly.filter(F.date_trunc("day", "ts") == d1)
    naive = time_shift(hourly.filter(F.date_trunc("day", "ts") == d0), "1 day")
    forecast_accuracy(actual, naive).show(truncate=False)

    # 4. Table trust: correlations, FK orphans, functional dependencies
    correlation_matrix(
        t.lineitem, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    ).show(truncate=False)
    fk_integrity_audit(
        [
            ("lineitem->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"),
            ("orders->customer", t.orders, "o_custkey", t.customer, "c_custkey"),
        ]
    ).show(truncate=False)
    fd_violations(t.customer, "c_nationkey", "c_mktsegment").show(truncate=False)

    # 5. "Also bought": Adamic-Adar candidates over the co-order graph
    pairs = frequent_item_pairs(
        t.lineitem, "l_orderkey", "l_partkey", min_support=2
    ).select(F.col("item_a").alias("u"), F.col("item_b").alias("v"))
    aa = adamic_adar(pairs)
    print("adamic-adar scored non-edges:", aa.count())
    aa.orderBy(F.col("score").desc(), "u", "v").show(5, truncate=False)

    # 6. Where sessions settle (Markov steady state) and which series
    #    went quiet (max-merge staleness monitor)
    markov_steady_state(t.events).show(truncate=False)
    metric_staleness(series, threshold_buckets=3).show(truncate=False)

    # 7. r15 wave: one-number concentration (Gini next to the Pareto
    #    deciles), per-source token diversity, and anomalies judged
    #    against each point's own seasonal slot
    gini_concentration(t.events).show(truncate=False)
    source_simpson_diversity(t.documents).show(truncate=False)
    seasonal_mad_anomalies(hourly, period=24).orderBy(
        "metric", "ts"
    ).show(10, truncate=False)

    # 8. The retention triangle as a standing query: the same set-union
    #    state as the mix above, weekly buckets, read through the SAME
    #    post-collapse code path as the batch operator
    state2 = tempfile.mkdtemp(prefix="demo_ret_")
    try:
        proc = user_activity_foreach_batch(spark, state2)
        wk = t.events.select(
            F.col("user_id").alias("u"),
            F.expr("CAST(ts AS LONG) div 604800").alias("bucket"),
        )
        for i in range(2):
            proc(wk.filter(F.pmod(F.col("bucket"), F.lit(2)) == i), i)
        merged = spark.read.parquet(_latest_batch_dir(spark, state2))
        streamed_ret = retention_from_user_buckets(merged).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(state2, ignore_errors=True)
    batch_ret = cohort_retention(t.events)
    assert sorted(map(tuple, streamed_ret.collect())) == sorted(
        map(tuple, batch_ret.collect())
    )
    print("streamed retention == batch retention over", batch_ret.count(), "cells")


if __name__ == "__main__":
    main(*sys.argv[1:])
