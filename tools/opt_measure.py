"""Optimization-round measurement harness (guide §1).

For each headline query: time the computation against the noop sink
(isolates engine work from the count() action), capture
``explain("formatted")``, and record per-query job descriptions so the
run is attributable. Prints one JSON line per query and writes plan
files under plans/<tag>/.

Usage:
  python tools/opt_measure.py [--plans-dir plans/r16] [--tag before] \
      [--repeats 2] [query ...]

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rearview_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None, help="write explain files here")
    ap.add_argument("--tag", default="before", help="suffix: <query>_<tag>.txt")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-noop", action="store_true", help="time .count() instead")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench
    from rearview_spark.plans import all_queries

    spark = get_spark("opt_measure")
    qs = all_queries()
    names = args.queries or bench.HEADLINE
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        fn = qs[name]["fn"]
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        # plan capture (untimed)
        if args.plans_dir:
            try:
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(plan)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"query": name, "plan_error": str(e)[:200]}))
        # warm once at sf0.001 to amortize codegen compile
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        samples = []
        for _ in range(args.repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if args.no_noop:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        results[name] = samples
        print(json.dumps({"query": name, "noop_s": samples}), flush=True)
        spark.sparkContext.setJobDescription(None)

    total = sum(min(v) for v in results.values())
    print(json.dumps({"total_min_s": round(total, 3), "n": len(results)}))


if __name__ == "__main__":
    main()
