"""Print physical-plan stats (node counts + pushed filters + read schemas)
for gate queries — the evidence PLANS.md cites.

Usage:
    python tools/plan_stats.py [query ...]        # default: PLANS.md set
    python tools/plan_stats.py --all              # every gate query
"""

from __future__ import annotations

import io
import os
import re
import sys
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "ts_moving_average",
    "ts_highest_average",
    "ev_sessionization",
    "dedup_minhash_lsh",
    "monitor_run_statuses",
    "ev_asof_last_purchase",
    "ev_range_join_windows",
    "ts_rollup_cascade",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from rearview_spark.plans import all_pending, all_queries
    from rearview_spark.session import get_spark

    spark = get_spark("plan_stats")
    qs = {**all_queries(), **all_pending()}  # staged gates measurable too
    names = sys.argv[1:] or DEFAULT
    if names == ["--all"]:
        names = sorted(qs)
    for name in names:
        buf = io.StringIO()
        with redirect_stdout(buf):
            qs[name]["fn"](spark, SF_DIR).explain("formatted")
        txt = buf.getvalue()
        nodes = Counter(re.findall(r"\n\(\d+\) (\w+)", txt))
        keep = {
            k: v
            for k, v in sorted(nodes.items())
            if k in (
                "Exchange", "HashAggregate", "Window", "Sort", "Generate",
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct", "WindowGroupLimit",
            )
        }
        print(f"== {name} {keep}")
        for line in txt.splitlines():
            s = line.strip()
            if s.startswith("PushedFilters") and "[]" not in s:
                print(f"   {s[:140]}")
            if s.startswith("ReadSchema"):
                print(f"   {s[:140]}")


if __name__ == "__main__":
    main()
