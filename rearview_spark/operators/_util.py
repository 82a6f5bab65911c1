"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread a compute-heavy input across the cluster when the source has
    fewer partitions than cores.

    Small parquet inputs (a dimension-table-sized documents file) arrive as
    ONE partition, serializing per-row CPU work (md5 shingling, feature
    extraction) on a single thread. At real scale the source already has
    >= cores partitions and this is a no-op — the check is metadata-only,
    so the guard never forces a shuffle of an already-parallel 100 TB scan.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
