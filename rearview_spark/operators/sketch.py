"""Mergeable-summary sketches over unbounded key domains: Misra-Gries
heavy hitters (two-pass exact + streaming recurrence), Count-Min point
frequencies, and HyperLogLog distinct counts.

Not rearview parity; north-star pipeline extension (the reference's
dashboards answer "which job/metric dominates" by full GROUP BY — at
100 TB a full GROUP BY over a high-cardinality key shuffles one row per
distinct key per map task, and the long tail is all of them). The
classic fix is the frequent-items sketch: a bounded summary whose
candidate set provably contains every item with frequency > n/(k+1),
then an exact recount of just those candidates.

Why this shape survives 100 TB:

- Pass 1 (candidates) is a ``mapInPandas`` over the raw scan — NO
  shuffle of fact rows at all. Each task emits at most ``k`` summary
  rows (k ~ hundreds), so the candidate union is ≤ k × tasks rows —
  KB-scale — regardless of key cardinality.
- The Misra-Gries merge bound (Agarwal et al., "Mergeable Summaries",
  PODS'12) gives the guarantee: an item dropped by every partition
  summary has per-partition frequency ≤ n_p/(k+1), hence global
  frequency ≤ Σ n_p/(k+1) = n/(k+1). Contrapositive: every TRUE heavy
  hitter survives in at least one partition → the union is a superset.
  No false negatives, ever; false positives die in the recount.
- Pass 2 recounts ONLY candidate keys: the candidate set broadcasts
  into a semi-join at the scan, the surviving stream is
  candidate-sized, and its groupBy is map-side combined on ≤ k × tasks
  distinct keys. Total cost: two scans, zero corpus-scale shuffles.
- The final predicate ``count × (k+1) > n`` is integer arithmetic —
  float-free, so the output is bit-deterministic across engines and
  independent of partitioning (the sketch only shapes the CANDIDATE
  set; the answer is exact).

The driver gate (``ev_heavy_hitters``) oracle is the plain
``GROUP BY ... HAVING count(*) * (k+1) > n`` — the semantics this
operator computes without ever grouping the full key domain.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact batch counts into a Misra-Gries summary of at most
    ``k`` counters. Mergeable-summaries rule: add, then if more than k
    counters remain, subtract the (k+1)-th largest count from all and
    drop the non-positive — the cumulative undercount stays ≤ n/(k+1).
    """
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        spill = sorted(counters.values(), reverse=True)[k]
        counters = {i: c - spill for i, c in counters.items() if c > spill}
    return counters


def mg_partition_candidates(
    df: DataFrame, col: str, k: int, item_type: str = "bigint"
) -> DataFrame:
    """Pass 1: per-partition Misra-Gries summaries — ``(item, weight)``
    with at most ``k`` rows per task, ``weight`` the (under)count lower
    bound. Arrow-batched; the per-batch exact ``value_counts`` feeds the
    k-counter merge, so Python touches pre-reduced (item, count) pairs,
    not raw rows. ``item_type`` is the Spark SQL type of ``col`` (the
    output schema must be declared up front). A NULL-item sentinel row
    carries the partition's total row count, so the caller's global n
    needs no extra scan."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            vc = pdf[col].value_counts()
            counters = _mg_merge(counters, vc.to_dict(), k)
        if n_seen:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()) + [None],
                    "weight": list(counters.values()) + [n_seen],
                }
            )

    return df.select(col).mapInPandas(
        summarize, schema=f"item {item_type}, weight bigint"
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int, item_type: str = "bigint"
) -> DataFrame:
    """Exact frequent items: every value of ``col`` with frequency
    strictly greater than n/(k+1), with its EXACT count — computed
    without ever grouping the full key domain (see module docstring for
    the two-pass scale argument). Returns ``(item, n_rows)`` where
    ``item`` keeps the source column's name."""
    # one summary frame serves both the candidate set and the global n
    # (the NULL sentinel rows); it is <= (k+1) x tasks rows, eagerly
    # checkpointed so the two consumers don't each rescan the corpus
    summaries = mg_partition_candidates(df, col, k, item_type).localCheckpoint(
        eager=True
    )
    cands = summaries.filter(F.col("item").isNotNull()).select("item").distinct()
    total = summaries.filter(F.col("item").isNull()).agg(
        F.sum("weight").alias("_n")
    )
    recount = (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("n_rows"))
    )
    return (
        recount.crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * (k + 1) > F.col("_n"))
        .select(F.col("item").alias(col), "n_rows")
    )


def heavy_hitters_foreach_batch(
    spark,
    summary_dir: str,
    col: str,
    k: int,
    item_type: str = "bigint",
):
    """Package the Misra-Gries summary as a Structured Streaming
    ``foreachBatch`` recurrence (the incremental-dedup packaging): each
    micro-batch's partition summaries merge into a persisted ≤ k+1-row
    summary table (MG summaries are mergeable — Agarwal et al.), so at
    any moment the store holds candidates guaranteed to include every
    item whose TRUE stream frequency exceeds n/(k+1), plus the exact
    stream row count in the NULL-sentinel row.

    Streaming drops pass 2 (you cannot recount an unbounded stream), so
    the store's weights are LOWER BOUNDS, not exact counts — the
    documented contract is candidates + bounds; run
    :func:`heavy_hitters` over the at-rest corpus when exact counts
    matter.

    State layout: each batch writes its merged ≤ k+1-row summary to
    ``summary_dir/batch=<id>/`` and readers take the HIGHEST batch dir
    — so a retried batch re-merges from its PREDECESSOR's state and
    overwrites only its own subdir (exactly-once semantics with no
    read-modify-write race), and a crash mid-write never damages the
    last committed summary. Old subdirs are the undo log; a compaction
    cadence can drop all but the newest. Use
    :func:`latest_stream_summary` to read the current state."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        summary = mg_partition_candidates(batch_df, col, k, item_type).collect()
        batch_counts: dict = {}
        n_batch = 0
        for r in summary:
            if r["item"] is None:
                n_batch += r["weight"]
            else:
                batch_counts[r["item"]] = batch_counts.get(r["item"], 0) + r["weight"]
        prev = _latest_batch_dir(spark, summary_dir, below=batch_id)
        prior: dict = {}
        if prev is not None:
            prior = {
                r["item"]: r["weight"] for r in spark.read.parquet(prev).collect()
            }
        n_total = prior.pop(None, 0) + n_batch
        merged = _mg_merge(prior, batch_counts, k)
        merged[None] = n_total
        spark.createDataFrame(
            [(i, w) for i, w in merged.items()],
            f"item {item_type}, weight bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{summary_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def _latest_batch_dir(spark, root: str, below: int | None = None) -> str | None:
    """Highest ``batch=<id>`` subdir under ``root`` (optionally below a
    given id — the retry path reads its predecessor). One driver-side
    Hadoop listing; None when absent/empty."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(path):
        return None
    best: tuple[int, str] | None = None
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            try:
                bid = int(name[6:])
            except ValueError:
                continue
            if below is not None and bid >= below:
                continue
            if best is None or bid > best[0]:
                best = (bid, str(st.getPath()))
    return best[1] if best else None


def cm_sketch(df: DataFrame, col: str, d: int = 4, w: int = 512) -> DataFrame:
    """Count-Min sketch counters over ``col``: ``(r, b, c)`` — for each
    of ``d`` md5 hash rows, the count of input rows landing in each of
    ``w`` buckets (Cormode & Muthukrishnan '05).

    Scale shape: the explode-by-``d`` stays inside whole-stage codegen
    (md5 + conv are JVM expressions, no Python), and the ``groupBy``'s
    map-side combine means each task ships at most ``d x w`` counter
    rows into the shuffle — the sketch is the aggregation state, so the
    network cost is O(d*w*tasks) regardless of input rows or key
    cardinality. Counters are sums, hence mergeable across partitions,
    files, or days by plain addition.

    Determinism: bucket = md5_60(key || ':cm' || r) mod w — the
    ``_hash60`` scheme every sampler shares, reproducible in DuckDB.
    """
    return (
        df.select(F.col(col).cast("string").alias("k"))
        .select("k", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"))
        .select(
            "r",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("k"), F.lit(":cm"), F.col("r").cast("string")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(w),
            ).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
    )


def cm_estimate(
    keys: DataFrame, counters: DataFrame, key_col: str, d: int = 4, w: int = 512
) -> DataFrame:
    """Point-frequency estimates from a Count-Min counter table: for
    each row of ``keys``, ``cm_est`` = min over the ``d`` hash rows of
    the counter its key hashes to (0 when the bucket is empty — only
    possible for keys absent from the sketched corpus). ``cm_est`` is a
    guaranteed OVER-estimate of the true frequency: every occurrence of
    the key increments all ``d`` of its counters, so each is
    true + (nonnegative collision mass) and the min inherits the bound.

    The counter table is at most ``d x w`` rows — always broadcast.
    """
    probes = keys.select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("_k"),
    ).select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
        F.col("_k"),
    ).select(
        key_col,
        "r",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("_k"), F.lit(":cm"), F.col("r").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(w),
        ).alias("b"),
    )
    return (
        probes.join(F.broadcast(counters), ["r", "b"], "left_outer")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_est"))
    )


HLL_M = 64
# alpha_m * m^2 * 2^50 precomputed ONCE in Python and embedded as the
# same double literal on both engines: the estimate is then a single
# float division per row, bit-identical everywhere.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(2**50)


def hll_rho_case(xcol: str) -> str:
    """SQL CASE ladder for rho(x) = leading zeros of a 40-bit value + 1,
    pure integer comparisons (no log2 float at power-of-two boundaries).
    The SAME generated text runs on Spark (F.expr) and DuckDB — the
    oracle shares this function, not a re-derivation."""
    parts = [f"WHEN {xcol} = 0 THEN 41"]
    for k in range(39, -1, -1):
        parts.append(f"WHEN {xcol} >= {2 ** k} THEN {40 - k}")
    return "CASE " + " ".join(parts) + " END"


def hll_registers(df: DataFrame, col: str, m: int = HLL_M) -> DataFrame:
    """HyperLogLog register table over ``col``: ``(bucket, register)``
    with one row per bucket 0..m-1 (Flajolet et al. '07). Bucket is
    md5_60 mod m from the first 15 md5 hex chars; rho comes from the
    NEXT 10 hex chars (a disjoint 40-bit slice, so bucket and rho are
    independent). ``register`` = max rho in the bucket, 0 when empty.

    Scale shape: ``max`` is the aggregation state — map-side combine
    ships <= m rows per task, and registers merge across any split of
    the data by plain ``max`` (the mergeable-summaries property the MG
    and CM summaries share). Everything is JVM expressions.
    """
    h = F.md5(F.concat(F.col(col).cast("string"), F.lit(":hll")))
    buckets = (
        df.select(
            F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(m)).alias(
                "bucket"
            ),
            F.conv(F.substring(h, 16, 10), 16, 10).cast("long").alias("x"),
        )
        .select("bucket", F.expr(hll_rho_case("x")).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    all_buckets = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    return all_buckets.join(buckets, "bucket", "left_outer").select(
        "bucket", F.coalesce(F.col("register"), F.lit(0)).alias("register")
    )


def hll_estimate_expr(m: int = HLL_M):
    """Aggregate Column: the raw HLL estimate from a register column —
    ``EST_NUM / sum(2^(50-register))``, the denominator an exact bigint
    sum (shift, not pow — no float accumulation), the estimate a single
    double division. Callers on the small-range branch (estimate <=
    2.5m with empty registers) should use linear counting instead —
    ``hll_estimate_py`` implements the branch; the gate column contract
    only covers the raw branch (ln() is engine-libm-dependent)."""
    denom = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - register AS INT))"))
    return F.lit(HLL_EST_NUM) / denom.cast("double")


def hll_estimate_py(registers: dict, m: int = HLL_M) -> float:
    """Driver-side reference estimator WITH the small-range correction
    (linear counting when raw <= 2.5m and empty buckets exist) — the
    full published algorithm; used by unit tests and by callers that
    need the corrected value rather than the oracle-exact raw one."""
    import math

    denom = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    raw = HLL_ALPHA * m * m / denom
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


def cm_foreach_batch(spark, summary_dir: str, col: str, d: int = 4, w: int = 512):
    """Count-Min as a ``foreachBatch`` recurrence: each micro-batch's
    d×w counter table merges into the persisted sketch by (r, b)
    ADDITION — CM counters are sums, so the streaming state is exactly
    the sketch of everything seen, not an approximation of one (unlike
    the MG recurrence's lower bounds, CM estimates from the streamed
    sketch equal estimates from a batch build over the same rows).

    State layout is the heavy_hitters_foreach_batch contract:
    ``batch=<id>`` subdirs, retries re-merge from the predecessor and
    overwrite only their own subdir. State is ≤ d×w rows regardless of
    stream length; read it with :func:`latest_stream_summary` and feed
    :func:`cm_estimate`."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = cm_sketch(batch_df, col, d=d, w=w)
        prev = _latest_batch_dir(spark, summary_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionAll(spark.read.parquet(prev))
        merged = cur.groupBy("r", "b").agg(F.sum("c").alias("c"))
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{summary_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def hll_registers_by(
    df: DataFrame, col: str, group_cols: list[str], m: int = HLL_M
) -> DataFrame:
    """Grouped HLL register tables: ``(*group_cols, bucket, register)``
    with one row per bucket PRESENT in the group (absent bucket ≡
    register 0 — estimators account for missing rows via the group's
    bucket count instead of densifying, so the frame stays ≤ m rows per
    group with no per-group all-buckets join).

    This is the partitioned form of :func:`hll_registers` — one sketch
    per day/source/tenant — and the input to sliding-window merges:
    registers from any set of groups combine by per-bucket ``max``, so
    a 7-day distinct-count reads 7×m sketch rows per window instead of
    re-scanning the raw data (the mergeable-summaries property; at
    100 TB the daily register build is the only corpus-scale pass, and
    every window/backfill after it is arithmetic over m-row tables)."""
    h = F.md5(F.concat(F.col(col).cast("string"), F.lit(":hll")))
    return (
        df.select(
            *group_cols,
            F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(m)).alias(
                "bucket"
            ),
            F.conv(F.substring(h, 16, 10), 16, 10).cast("long").alias("x"),
        )
        .select(*group_cols, "bucket", F.expr(hll_rho_case("x")).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate_sparse_expr(m: int = HLL_M):
    """Aggregate Column: the raw HLL estimate over a SPARSE register
    group (rows only for present buckets) — absent buckets contribute
    register 0, i.e. ``2^50`` each to the exact bigint denominator:
    ``EST_NUM / (sum(2^(50-register)) + (m - count(*)) * 2^50)``. Same
    cross-engine-exact arithmetic as :func:`hll_estimate_expr` (integer
    shifts, one double division at the end)."""
    present = F.sum(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - register AS INT))")
    )
    missing = (F.lit(m) - F.count(F.lit(1))).cast("long") * F.lit(1 << 50).cast(
        "long"
    )
    return F.lit(HLL_EST_NUM) / (present + missing).cast("double")


def hll_foreach_batch(spark, summary_dir: str, col: str, m: int = HLL_M):
    """HyperLogLog as a ``foreachBatch`` recurrence: per-batch register
    tables merge into the persisted state by per-bucket MAX — like CM
    (and unlike MG), the streamed state is bit-identical to a batch
    build over the union of all batches, so distinct-count estimates
    never degrade with micro-batch boundaries. Same ``batch=<id>``
    retry/crash contract; state is exactly ``m`` rows."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        cur = hll_registers(batch_df, col, m=m)
        prev = _latest_batch_dir(spark, summary_dir, below=batch_id)
        if prev is not None:
            cur = cur.unionAll(spark.read.parquet(prev))
        merged = cur.groupBy("bucket").agg(F.max("register").alias("register"))
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{summary_dir.rstrip('/')}/batch={batch_id}"
        )

    return _process


def latest_stream_summary(spark, summary_dir: str) -> DataFrame | None:
    """The current streaming MG state: ``(item, weight)`` candidates
    plus the NULL-sentinel total-row-count row, from the newest
    committed batch subdir. None before the first commit."""
    latest = _latest_batch_dir(spark, summary_dir)
    return None if latest is None else spark.read.parquet(latest)
