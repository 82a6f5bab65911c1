"""Experimentation & reliability tour — the readouts an A/B launch or
a model-score rollout is judged by, each from this repo's operators:

  ztest        two-proportion z over a deterministic md5 user split
  calibration  does a higher score mean a higher observed rate?
  gains        what share of positives do the top deciles capture?
  ks           the worst CDF gap between two periods (bin-free drift)
  survival     Kaplan-Meier time from signup to first purchase

Usage:  python examples/experiment_demo.py [sf_dir]   (default sf0.01)

Counts are exact int64 everywhere; every rate/statistic is a single
division (or one sqrt / one exp) of exact operands — reruns print
bit-identical output.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.dedup import md5_bucket
from rearview_spark.operators.evaluation import (
    calibration_bins,
    cumulative_gains,
)
from rearview_spark.operators.anomaly import ks_two_sample
from rearview_spark.operators.stats import kaplan_meier, two_proportion_ztest
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables


def fmt(x, spec: str = ".4f") -> str:
    """NULL-tolerant number formatting: the operators document NULL
    outputs for degenerate inputs (empty variant, degenerate pooled
    rate, no positives) — print the documented 'undefined' instead of
    crash-formatting None."""
    return "undefined" if x is None else format(x, spec)


def main(sf_dir: str) -> None:
    spark = get_spark("experiment_demo", shuffle_partitions=8)
    t = Tables(spark, sf_dir)

    # --- 1. A/B readout: did the (synthetic) treatment convert better?
    # big-ticket conversion (every user purchases SOMETHING here, so
    # plain incidence is degenerate — same definition as the gate)
    users = t.events.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 150))
            .cast("int")
        ).alias("conv")
    )
    assigned = users.select(
        (md5_bucket(F.col("user_id"), "ab-exp") % 2).cast("int").alias("grp"),
        "conv",
    )
    z = two_proportion_ztest(assigned, "grp", "conv").collect()[0]
    verdict = (
        "undefined"
        if z["z"] is None
        else ("significant" if abs(z["z"]) > 1.96 else "not significant")
    )
    print(
        f"ztest        n0={z['n0']} n1={z['n1']} "
        f"rate0={fmt(z['rate0'])} rate1={fmt(z['rate1'])} "
        f"z={fmt(z['z'], '.3f')} ({verdict} at 5%)"
    )

    # --- 2. Calibration: n_chars as an English-ness score, 10 bins
    labeled = t.documents.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.col("n_chars").alias("s"),
        "doc_id",
    )
    print("calibration  bin  n     avg_score  pos_rate")
    for r in calibration_bins(labeled, "y", "s", bins=10).collect():
        print(
            f"             {r['bin']:<4d} {r['n']:<5d} "
            f"{r['avg_score']:<10.1f} {r['pos_rate']:.3f}"
        )

    # --- 3. Gains: positives captured by the top deciles
    gains = cumulative_gains(labeled, "y", "s", "doc_id", n_bins=10)
    top3 = gains.collect()[:3]
    for r in top3:
        print(
            f"gains        decile {r['bucket']}: cum_pos={r['cum_pos']} "
            f"gain={fmt(r['gain'], '.3f')} lift={fmt(r['lift'], '.2f')}"
        )

    # --- 4. KS drift: first vs second half of the event window
    v = t.events.filter(F.col("value").isNotNull()).select(
        F.col("ts").cast("long").alias("tt"), F.col("value").alias("v")
    )
    rng = v.agg(F.min("tt").alias("lo"), F.max("tt").alias("hi"))
    grp = v.crossJoin(F.broadcast(rng)).select(
        "v", (F.col("tt") > F.expr("(lo + hi) div 2")).cast("int").alias("g")
    )
    ks = ks_two_sample(grp, "v", "g").collect()[0]
    print(
        f"ks           D={fmt(ks['d_stat'], '.5f')} "
        f"at value={fmt(ks['at_value'], '.3f')} "
        f"(n_a={ks['n_a']}, n_b={ks['n_b']})"
    )

    # --- 5. Survival: signup -> first purchase, censored at window end
    e = t.events.select(
        "user_id", "event_type", F.col("ts").cast("long").alias("tt")
    )
    pu = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("tt"))).alias("s"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("tt"))).alias("p"),
    )
    wend = e.agg(F.max("tt").alias("wend"))
    obs = F.col("p").isNotNull() & (F.col("p") >= F.col("s"))
    durs = (
        pu.filter(F.col("s").isNotNull())
        .crossJoin(F.broadcast(wend))
        .select(
            F.when(obs, F.col("p") - F.col("s"))
            .otherwise(F.col("wend") - F.col("s"))
            .alias("dur"),
            F.when(obs, F.lit(1)).otherwise(F.lit(0)).alias("evt"),
        )
    )
    curve = kaplan_meier(durs, "dur", "evt").collect()
    if curve:
        head, tail = curve[0], curve[-1]
        print(
            f"survival     {len(curve)} event times; "
            f"S({head['t']}s)={fmt(head['survival'])} ... "
            f"S({tail['t']}s)={fmt(tail['survival'])}"
        )
    else:
        print("survival     no observed conversions (all censored)")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
