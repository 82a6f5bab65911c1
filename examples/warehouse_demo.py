"""Warehouse-pattern demo — the round-10 relational additions end to end
on the driver's tables:

  events ─ SCD Type-2 status history (build + an idempotent update-batch
         merge) ─ Bloom-pruned join of events to a selective customer
         dim ─ OHLC bars + OLS trend over the hourly series ─ a-priori
         frequent co-purchase pairs over lineitem baskets ─ fuzzy
         (edit-distance) matching of supplier names.

Usage:  python examples/warehouse_demo.py [sf_dir]     (default sf0.001)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators.bloom import bloom_semi_join
from rearview_spark.operators.graph import frequent_item_pairs
from rearview_spark.operators.joins import edit_distance_join
from rearview_spark.operators.scd import scd2_from_changes, scd2_merge
from rearview_spark.operators.timeseries import linear_trend, ohlc_bars, summarize
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables, events_as_timeseries


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark()
    t = Tables(spark, sf_dir)

    # 1. SCD2: status history from the event change stream, then merge a
    #    synthetic update batch (same attrs = no-op; new key = insert)
    history = scd2_from_changes(
        t.events.select("user_id", "event_type", "ts"),
        key_col="user_id", attr_cols=["event_type"], ts_col="ts",
    )
    print("scd2 versions:", history.count())
    updates = spark.createDataFrame(
        [(999999, "vip", t.events.agg(F.max("ts")).collect()[0][0])],
        "user_id long, event_type string, eff timestamp",
    )
    merged = scd2_merge(history, updates, "user_id", ["event_type"], "eff")
    print("after merge:", merged.count(), "(one new key inserted)")

    # 2. Bloom-pruned join: high-balance customers against the event log
    dim = t.customer.filter(F.col("c_acctbal") > 7000).select("c_custkey", "c_name")
    joined = bloom_semi_join(t.events, dim, "user_id", "c_custkey")
    print("bloom-pruned join rows:", joined.count())

    # 3. Candlesticks + trend over the hourly series
    hourly = summarize(events_as_timeseries(t.events), "1 hour", "sum")
    print("ohlc bars:", ohlc_bars(hourly, "6 hours").count())
    linear_trend(hourly).show(5, truncate=False)

    # 4. Frequent co-purchase pairs (a-priori pruned)
    pairs = frequent_item_pairs(t.lineitem, "l_orderkey", "l_partkey", min_support=2)
    print("frequent item pairs:", pairs.count())

    # 5. Fuzzy supplier-name match within 2 edits
    fuzzy = edit_distance_join(
        t.supplier.select("s_suppkey", "s_name"), "s_name", "s_suppkey", max_dist=2
    )
    print("supplier fuzzy pairs:", fuzzy.count())
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
