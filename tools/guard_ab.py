"""A/B the ensure_parallelism guard per query (VERDICT r16 next-round #1).

Arms alternate tightly in ONE session (guard ON = current code, guard OFF =
identity patch), min-of-N per arm, count() action matching bench.py's timed
action, clearCache before every sample. The four driver-flagged queries
(doc_chi2_tokens, doc_bm25_topk, doc_nb_language, doc_dsir_importance) are
the default set.

Usage: python tools/guard_ab.py [--pairs 5] [query ...]
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
DEFAULT = [
    "doc_chi2_tokens",
    "doc_bm25_topk",
    "doc_nb_language",
    "doc_dsir_importance",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or DEFAULT

    import rearview_spark.operators._util as U
    from rearview_spark.plans import all_queries

    spark = get_spark("guard_ab")
    qs = all_queries()
    real_guard = U.ensure_parallelism

    def identity_guard(df, *key_cols):
        return df

    def timed(fn) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0

    def loadavg() -> str:
        with open("/proc/loadavg") as f:
            return " ".join(f.read().split()[:3])

    # warmup both arms on sf0.001 so codegen compile is off the clock
    for name in names:
        fn = qs[name]["fn"]
        for guard in (real_guard, identity_guard):
            U.ensure_parallelism = guard
            fn(spark, "/root/testdata/sf0.001").count()
    U.ensure_parallelism = real_guard

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]["fn"]
        on: list[float] = []
        off: list[float] = []
        spark.sparkContext.setJobDescription(f"guard_ab: {name}")
        for _ in range(args.pairs):
            U.ensure_parallelism = real_guard
            on.append(timed(fn))
            U.ensure_parallelism = identity_guard
            off.append(timed(fn))
        U.ensure_parallelism = real_guard
        results[name] = {
            "on_min": round(min(on), 3),
            "off_min": round(min(off), 3),
            "on": [round(v, 3) for v in sorted(on)],
            "off": [round(v, 3) for v in sorted(off)],
            "off_over_on": round(min(off) / min(on), 3),
            "loadavg": loadavg(),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
