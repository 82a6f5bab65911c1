"""ANN recall operating points: recall@k of the compressed/pruned ANN
operators against the exact brute-force baseline, across their tuning
knobs — the table a user needs before trusting an IVF/PQ/SQ8 recipe at
scale (PLANS.md "ANN recall operating points").

    python tools/ann_recall.py /tmp/sf1            # 10x corpus (make_scaled.py)
    python tools/ann_recall.py /root/testdata/sf0.1 --k 10 --queries 20

Prints one row per operating point: operator, knob settings, recall@k,
and the scan fraction the knobs imply (nprobe/n_buckets for IVF — the
cost side of the recall trade; SQ8 scans everything but reads 1 byte
per dim).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recall_at_k(exact_rows, approx_rows) -> float:
    exact: dict = {}
    for r in exact_rows:
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx: dict = {}
    for r in approx_rows:
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(v & approx.get(q, set())) for q, v in exact.items())
    total = sum(len(v) for v in exact.values())
    return hits / total if total else 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from rearview_spark.operators import similarity as S
    from rearview_spark.session import get_spark
    from rearview_spark.sources.loader import Tables

    spark = get_spark("ann_recall")
    emb = Tables(spark, args.sf_dir).embeddings.cache()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < args.queries)
    exact = S.brute_force_topk(emb, queries, k=args.k).collect()
    print(f"corpus {n} vectors, {args.queries} queries, recall@{args.k} vs brute force")
    print(f"{'operator':<16} {'knobs':<24} {'recall':>7} {'scan frac':>10}")

    nb = args.n_buckets
    for nprobe in (1, 2, 4, 8):
        rows = S.ivf_kmeans_topk(
            emb, queries, k=args.k, n_buckets=nb, nprobe=nprobe, iters=3
        ).collect()
        r = recall_at_k(exact, rows)
        print(f"{'ivf_kmeans':<16} {f'nprobe={nprobe}/{nb}':<24} {r:>7.3f} {nprobe / nb:>10.3f}")

    for m in (4, 8):
        for nprobe in (2, 4, 8):
            rows = S.ivf_pq_topk(
                emb, queries, topk=args.k, n_buckets=nb, nprobe=nprobe,
                router_iters=3, m=m, k_codes=16, pq_iters=2,
            ).collect()
            r = recall_at_k(exact, rows)
            print(
                f"{'ivf_pq':<16} {f'nprobe={nprobe}/{nb} m={m}':<24} {r:>7.3f} {nprobe / nb:>10.3f}"
            )

    rows = S.sq8_topk(emb, queries, k=args.k).collect()
    r = recall_at_k(exact, rows)
    print(f"{'sq8':<16} {'8-bit scalar':<24} {r:>7.3f} {'1.000':>10}")
    emb.unpersist()


if __name__ == "__main__":
    main()
