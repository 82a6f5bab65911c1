"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: logical-plan node names whose presence implies the input already went
#: (or will go) through an Exchange — parallelism is then at least
#: spark.sql.shuffle.partitions and the small-scan guard is moot.
_WIDE_NODES = (
    "Join",
    "Aggregate",
    "Window",
    "Repartition",  # also matches RepartitionByExpression
    "Deduplicate",
    "Distinct",
    "Intersect",
    "Except",
    "FlatMapGroupsInPandas",
)


def _has_wide_node(jplan) -> bool:
    """True when any node in the logical-plan tree is one of
    :data:`_WIDE_NODES` (prefix match covers the families:
    RepartitionByExpression, FlatMapGroupsInPandas* stateful variants,
    Join subclasses).

    Implementation: ONE Py4J round-trip (``toString`` of the tree) and
    a local anchored regex — a per-node ``nodeName()``/``children()``
    walk costs ~4 driver round-trips per node, which on the tall narrow
    Project/Filter chains this guard exists for is exactly the
    per-element Py4J hazard the sign-bit builder documents
    (similarity.py). Node names sit at line starts after tree-drawing
    prefixes; anchoring there keeps a column NAMED "Window…" from
    spuriously matching. The rename risk a future Spark brings is
    covered by pin tests per wide node
    (tests/test_pipeline_ops.py::test_ensure_parallelism_probes_only_narrow_plans),
    which fail loudly on an upgrade instead of silently re-planning."""
    import re

    plan = jplan.toString()
    return (
        re.search(r"(?m)^[\s+:>-]*(" + "|".join(_WIDE_NODES) + r")", plan)
        is not None
    )


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread a compute-heavy input across the cluster when the source has
    fewer partitions than cores.

    Small parquet inputs (a dimension-table-sized documents file) arrive as
    ONE partition, serializing per-row CPU work (md5 shingling, feature
    extraction) on a single thread. At real scale the source already has
    >= cores partitions and this is a no-op — the guard never forces a
    shuffle of an already-parallel 100 TB scan.

    Cost discipline: the partition-count probe (``df.rdd``) physically
    plans the input subtree on the driver, so it only runs for NARROW
    plans — a scan plus projections/filters, where planning is trivially
    cheap and the one-partition hazard actually lives. Any plan already
    containing a wide node (join/agg/window/repartition/…) has crossed an
    Exchange, whose parallelism is ``spark.sql.shuffle.partitions`` —
    those inputs return unchanged without being re-planned. The wide-node
    scan inspects the ANALYZED plan (computed eagerly at DataFrame
    creation, so free), never the optimized/physical one — via
    :func:`_has_wide_node`'s ONE ``toString()`` round-trip with a
    line-start-anchored regex (see its docstring for why that beats a
    per-node ``nodeName`` JVM walk, which costs ~4 Py4J calls per node;
    the anchor keeps a column NAMED "Window…" from matching, and pin
    tests cover the node-rename risk of a Spark upgrade).
    """
    if _has_wide_node(df._jdf.queryExecution().analyzed()):
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)


def hadoop_child_names(spark, dir_path: str, prefix: str) -> list[str]:
    """Names of ``dir_path``'s immediate child DIRECTORIES that start
    with ``prefix``, with the prefix stripped — via the Hadoop
    FileSystem API (works on hdfs:// / s3a://, not just local paths),
    one driver-side listStatus, never a distributed listing job.
    Empty list when the directory doesn't exist yet.

    Shared by the partition-pruned minhash store (``pfx=``-partitioned
    probe, dedup.py) and the SCD2 versioned-snapshot store
    (``v=``-versioned history, scd.py)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    path = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
            out.append(name[len(prefix):])
    return out
