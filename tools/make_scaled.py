"""Build scaled replicas of the test tables for the PLANS.md "Measured
scaling" decades.

    python tools/make_scaled.py --factor 10  --dst /tmp/sf1
    python tools/make_scaled.py --factor 100 --dst /tmp/sf10 --tables documents

Replication scheme (the round-6 method, now codified):

- dims (region/nation/customer/supplier/part/orders/lineitem) copy
  as-is — they are dimension-sized by design; scaling them would change
  join selectivity, not stress the operators under test.
- events: ``factor`` copies, event_id/user_id offset per copy, ts
  jittered by copy index seconds (keeps per-hour densities).
- embeddings: copies with vec_id offsets and a deterministic ±5%
  per-element jitter keyed on (copy, element) — exact-duplicate vectors
  would make recall benchmarks trivially easy (every copy of the true
  neighbor lands in the same IVF bucket) and would understate
  embedding-dedup loads; jittered copies are realistic near-neighbors
  (cosine ~0.995 to their base vector).
- documents: copies with doc_id offset ``copy * 1_000_000``, built so
  every doc has exactly NINE near-twins regardless of factor:
  copies are grouped in tens; within a group the ten twins share a
  group-salted text and differ by a trailing ``variantN`` token (the
  r06 worst-case near-dup load), while ACROSS groups a group-specific
  salt token is spliced in every third token, breaking enough shingles
  that cross-group pairs fall below any near-dup threshold. A naive
  100x replication would instead create 100-twin groups — a 10x harsher
  pair-verification load — and the decade ratio would measure load
  change, not scale.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
ID_STRIDE = 1_000_000


def scaled_documents(spark, src: str, factor: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src}/documents.parquet")
    copies = spark.range(factor).select(
        F.col("id").alias("_c"),
        (F.col("id") % 10).alias("_twin"),
        (F.col("id") / 10).cast("long").alias("_grp"),
    )
    out = docs.crossJoin(copies)
    toks = F.split("text", " ")
    salt = F.concat(F.lit("grpsalt"), F.col("_grp"))
    salted = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), ((F.size(toks) - 1) / 3).cast("int")),
                lambda i: F.concat(
                    F.array(salt), F.slice(toks, i * 3 + 1, 3)
                ),
            )
        ),
    )
    text = F.when(F.col("_grp") == 0, F.col("text")).otherwise(salted)
    text = F.when(
        F.col("_twin") > 0,
        F.concat(text, F.lit(" variant"), F.col("_twin")),
    ).otherwise(text)
    keep = [c for c in docs.columns if c not in ("doc_id", "text")]
    return out.select(
        (F.col("doc_id") + F.col("_c") * ID_STRIDE).alias("doc_id"),
        text.alias("text"),
        *keep,
    )


def scaled_events(spark, src: str, factor: int):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{src}/events.parquet")
    out = ev.crossJoin(spark.range(factor).select(F.col("id").alias("_c")))
    keep = [c for c in ev.columns if c not in ("event_id", "user_id", "ts")]
    return out.select(
        (F.col("event_id") + F.col("_c") * ID_STRIDE).alias("event_id"),
        (F.col("user_id") + F.col("_c") * ID_STRIDE).alias("user_id"),
        (F.col("ts") + F.make_interval(secs=F.col("_c"))).alias("ts"),
        *keep,
    )


def scaled_embeddings(spark, src: str, factor: int):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    out = emb.crossJoin(spark.range(factor).select(F.col("id").alias("_c")))
    vec_field = "embedding"
    keep = [c for c in emb.columns if c not in ("vec_id", vec_field)]
    c = F.col("_c")
    # integer-arithmetic pseudo-noise in [-0.05, 0.05), deterministic per
    # (copy, element); copy 0 passes through untouched
    jittered = F.transform(
        F.col(vec_field),
        lambda x, j: F.when(c == 0, x).otherwise(
            x
            * (
                1.0
                + (
                    F.pmod((c + 1) * (j + 7) * F.lit(2654435761), F.lit(997))
                    / 997.0
                    - 0.5
                )
                * 0.1
            ).cast("float")
        ),
    )
    return out.select(
        (F.col("vec_id") + c * ID_STRIDE).alias("vec_id"),
        jittered.alias(vec_field),
        *keep,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument(
        "--tables",
        nargs="*",
        default=["documents", "events", "embeddings"],
        help="fact tables to scale (dims always copy as-is)",
    )
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from rearview_spark.session import get_spark

    spark = get_spark("make_scaled")
    os.makedirs(args.dst, exist_ok=True)
    for t in DIMS:
        src_f = f"{args.src}/{t}.parquet"
        dst_f = f"{args.dst}/{t}.parquet"
        if os.path.exists(src_f) and not os.path.exists(dst_f):
            shutil.copy(src_f, dst_f)
    builders = {
        "documents": scaled_documents,
        "events": scaled_events,
        "embeddings": scaled_embeddings,
    }
    for t in args.tables:
        df = builders[t](spark, args.src, args.factor)
        (
            df.repartition(args.partitions)
            .write.mode("overwrite")
            .parquet(f"{args.dst}/{t}.parquet")
        )
        print(f"{t}: wrote factor={args.factor} to {args.dst}/{t}.parquet")


if __name__ == "__main__":
    main()
