"""Time gate queries at a scaled dataset (built by make_scaled.py) —
the measurement harness behind PLANS.md "Measured scaling".

    python tools/scale_bench.py /tmp/sf10 dedup_minhash_lsh doc_dsir_importance
    SPARK_GRAFT_SCALE_REPEATS=3 python tools/scale_bench.py ...

Prints one line per query: median of N timed runs on a warm JVM (one
untimed warmup at sf0.001 primes codegen), caches cleared between runs
so every sample pays the query's real materialization cost.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from rearview_spark.plans import all_pending, all_queries
    from rearview_spark.session import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    spark = get_spark("scale_bench")
    qs = {**all_queries(), **all_pending()}  # staged gates measurable too
    for name in names:
        fn = qs[name]["fn"]
        fn(spark, "/root/testdata/sf0.001").count()  # codegen warmup
        samples = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(samples):.2f}s "
            f"(runs {[round(s, 2) for s in samples]}, rows {n})"
        )


if __name__ == "__main__":
    main()
