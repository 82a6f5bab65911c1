"""SparkSession factory tuned for both local testing and cluster scale.

Local mode reads ``SPARK_GRAFT_CPUS`` (default: all cores). At cluster
scale the same builder is used with ``master`` unset (picked up from
spark-submit); the scale-relevant settings — AQE, skew-join handling,
shuffle partitions, Arrow — are identical in both modes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rearview_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Scale notes (100 TB target):
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting
      replace hand-tuned partition counts when data volume varies 1000x.
    - ``autoBroadcastJoinThreshold`` left at default (10 MB): dimension
      tables (region/nation/supplier/monitors config) broadcast
      automatically; fact-fact joins sort-merge with AQE skew handling.
    - Arrow enabled: every pandas-UDF boundary (monitor eval, EMA,
      Holt-Winters) is Arrow-batched, never row-at-a-time pickled.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Only pin a master when not running under spark-submit on a cluster.
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT_MODE"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
