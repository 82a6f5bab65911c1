"""Same-code bench A/B — the standing drift-adjudication tool
(VERDICT_r12 next-round #7): when a cross-round comparable moves >10%,
re-run the PRIOR round's exact commit on TODAY's box before blaming the
diff. Environment drift shows up as the old code reading the new
numbers; a real regression shows up as the old code still reading its
recorded numbers.

Usage:
    python tools/bench_ab.py <ref> [sf_dir]

Checks out ``<ref>`` (e.g. the commit recorded in the prior round's
bench payload) into a scratch ``git worktree`` under /tmp, runs that
tree's own ``bench.py`` there, runs the CURRENT tree's bench.py here,
and prints both JSON payloads plus the per-query and total deltas over
the SHARED query set. Runs are sequential (never two Spark JVMs at
once — the documented ~50% inflation) and in ref-first order so the
current tree gets no warm-page advantage. The scratch worktree is
removed afterwards.

Interpretation contract (PLANS.md "bench drift" sections): if
ref-at-today is within ~10% of current-at-today, the cross-round delta
is environment — cite this tool's output line in the drift note. If
ref-at-today reproduces its recorded numbers while current reads high,
bisect the diff.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_bench(tree: str, sf_dir: str) -> dict:
    """Run ``tree``'s bench.py with this process's env and parse the
    one-line JSON payload (last stdout line starting with '{')."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in bench output from {tree}")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ref = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = f"/tmp/bench_ab_{ref.replace('/', '_')}"

    subprocess.run(
        ["git", "worktree", "add", "--detach", scratch, ref],
        cwd=here,
        check=True,
    )
    try:
        ref_payload = run_bench(scratch, sf_dir)
        cur_payload = run_bench(here, sf_dir)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", scratch],
            cwd=here,
            check=False,
        )

    rq, cq = ref_payload.get("queries", {}), cur_payload.get("queries", {})
    shared = sorted(set(rq) & set(cq))
    r_tot = sum(rq[q] for q in shared)
    c_tot = sum(cq[q] for q in shared)
    print(json.dumps({"ab_ref": ref, "ref_payload": ref_payload}))
    print(json.dumps({"ab_ref": "HEAD-worktree", "cur_payload": cur_payload}))
    deltas = {
        q: round(cq[q] / rq[q], 3) for q in shared if rq[q] > 0.05
    }
    print(
        json.dumps(
            {
                "metric": "bench_ab",
                "ref": ref,
                "sf_dir": sf_dir,
                "shared_queries": len(shared),
                "ref_total_sec": round(r_tot, 3),
                "cur_total_sec": round(c_tot, 3),
                "cur_over_ref": round(c_tot / r_tot, 3) if r_tot else None,
                "per_query_cur_over_ref": deltas,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
