"""Data-quality & reconciliation tour — the checks a pipeline runs
before trusting a new drop of data, each from this repo's operators:

  profile     one-pass column stats (nulls / NDV / ranges)
  skew        join-key skew report (Gini, hottest key, p50/p99)
  diff        snapshot reconciliation vs a mutated re-delivery
  outliers    per-column robust median/MAD outlier audit
  drift       PSI between the first and second half of the time range
  allocation  largest-remainder rebate proration (exact reconciliation)

Usage:  python examples/data_quality_demo.py [sf_dir]   (default sf0.01)

All outputs are integer-exact or single-division doubles — reruns print
bit-identical numbers.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.allocation import allocate_proportional
from rearview_spark.operators.anomaly import psi_drift
from rearview_spark.operators.joins import table_diff
from rearview_spark.operators.profiling import (
    numeric_outlier_audit,
    profile_numeric_columns,
)
from rearview_spark.operators.skew import key_skew_report
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables


def main(sf_dir: str) -> None:
    spark = get_spark("data_quality_demo")
    t = Tables(spark, sf_dir)

    print("\n== Profile: lineitem numeric measures")
    profile_numeric_columns(
        t.lineitem, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).orderBy("col_name").show(truncate=False)

    print("== Robust outlier audit: which event columns have heavy tails?")
    ev = Tables(spark, sf_dir).events
    numeric_outlier_audit(ev, ["value", "user_id"]).show()

    print("== Skew report: is l_partkey a safe join key?")
    key_skew_report(t.lineitem, "l_partkey").show()

    print("== Reconciliation: orders vs a mutated re-delivery")
    mutated = t.orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    table_diff(
        t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        mutated,
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice"],
    ).orderBy("kind").show(truncate=False)

    print("== Drift: PSI of event values, first half vs second half")
    psi_drift(t.events, "value", "ts", bins=10).show()

    print("== Allocation: 10% order rebate spread across line items")
    li = t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
    )
    rebate = li.groupBy("l_orderkey").agg(
        F.expr("sum(price_cents) div 10").alias("rebate_cents")
    )
    alloc = allocate_proportional(
        li.join(rebate, "l_orderkey"),
        "l_orderkey",
        "price_cents",
        "rebate_cents",
        "l_linenumber",
        out_col="alloc_cents",
    )
    recon = alloc.groupBy("l_orderkey").agg(
        F.first("rebate_cents").alias("rebate_cents"),
        F.sum("alloc_cents").alias("allocated"),
    )
    bad = recon.filter(F.col("allocated") != F.col("rebate_cents")).count()
    print(f"orders with alloc != rebate: {bad} (must be 0)")
    alloc.orderBy("l_orderkey", "l_linenumber").show(6)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
