"""Measure the r10 minhash-store fix: per-batch probe cost against a
persisted signature store WITH materialized band keys (the new
minhash_store_rows schema) vs WITHOUT (a legacy ``(id, sig, shs)``
store, which forces incremental_minhash_dedup's re-banding fallback —
the exact per-batch O(store) projection VERDICT_r09 flagged).

Usage: python tools/store_probe_bench.py [store_rows] [batch_rows] [prefix_chars]
Builds all three store layouts (compact rows with materialized bands,
legacy rows without, partition-pruned banded) from scaled synthetic
docs, then times the per-batch probe end-to-end for each. Prints one
JSON line. Pass prefix_chars per the sizing rule on
minhash_store_pruned_rows (16^prefix_chars ≳ 12·bands·batch) — the
pruned layout is EXPECTED to lose when the batch hits most prefixes.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> int:
    store_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    prefix_chars = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    sys.path.insert(0, ".")
    from rearview_spark.operators.dedup import (
        incremental_minhash_dedup,
        incremental_minhash_dedup_pruned,
        minhash_store_pruned_rows,
        minhash_store_rows,
    )
    from rearview_spark.session import get_spark

    spark = get_spark("store_probe_bench")
    spark.range(1).count()  # warm

    # synthetic docs: distinct token streams, no dups — the probe cost is
    # what's measured, not verification volume
    def docs(n, offset=0):
        return spark.range(n).select(
            (F.col("id") + offset).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"w{k}_"),
                        (((F.col("id") + offset) * (k + 7)) % 9973).cast("string"),
                    )
                    for k in range(12)
                ],
            ).alias("text"),
        )

    rows = minhash_store_rows(docs(store_rows)).cache()
    rows.count()
    d_new = tempfile.mkdtemp(prefix="probe_new_")
    d_old = tempfile.mkdtemp(prefix="probe_old_")
    d_pruned = tempfile.mkdtemp(prefix="probe_pruned_")
    rows.write.mode("overwrite").parquet(d_new)  # materialized bands
    rows.select("doc_id", "sig", "shs").write.mode("overwrite").parquet(d_old)
    # one file per prefix dir (repartition by the partition column), so
    # pruning skips files, not just dir listings
    minhash_store_pruned_rows(rows, prefix_chars=prefix_chars).repartition(
        "pfx"
    ).write.partitionBy("pfx").mode("overwrite").parquet(d_pruned)
    rows.unpersist()

    batch = docs(batch_rows, offset=10_000_000).localCheckpoint(eager=True)

    out = {
        "store_rows": store_rows,
        "batch_rows": batch_rows,
        "prefix_chars": prefix_chars,
    }
    for label, path in (("materialized_bands_s", d_new), ("legacy_reband_s", d_old)):
        times = []
        for _ in range(3):
            store = spark.read.parquet(path)
            t0 = time.perf_counter()
            incremental_minhash_dedup(batch, store).count()
            times.append(round(time.perf_counter() - t0, 3))
        out[label] = sorted(times)[1]
        out[label + "_spread"] = times
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        incremental_minhash_dedup_pruned(
            batch, spark, d_pruned, prefix_chars=prefix_chars
        ).count()
        times.append(round(time.perf_counter() - t0, 3))
    out["pruned_probe_s"] = sorted(times)[1]
    out["pruned_probe_s_spread"] = times
    out["pruned_vs_rows_speedup"] = round(
        out["materialized_bands_s"] / out["pruned_probe_s"], 2
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
