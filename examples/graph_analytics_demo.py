"""Link-analysis tour over the purchasing network — every graph
operator in one pass, on the two graphs the gates use:

  bipartite customer <-> supplier (from lineitem x orders):
    PageRank            who sits at the center of the network
    personalized PR     proximity to the BUILDING customer segment
    HITS                discerning buyers vs endorsed sellers (directed)
  thresholded part co-order graph (co-ordered in >= 2 orders):
    label propagation   purchasing-neighborhood communities
    k-core              the cohesive interior (k = 3)
    BFS hops            distance from the Brand#4 parts
    triangles           cohesion counts
    association rules   support / confidence / lift for recommendations

Usage:  python examples/graph_analytics_demo.py [sf_dir]   (default sf0.01)

Everything is integer fixed-point or exact counts — rerunning prints
bit-identical numbers (the property the DuckDB gate oracles rely on).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rearview_spark.operators import graph as G
from rearview_spark.session import get_spark
from rearview_spark.sources.loader import Tables


def main(sf_dir: str) -> None:
    spark = get_spark("graph_analytics_demo")
    t = Tables(spark, sf_dir)

    # --- bipartite purchase graph -------------------------------------
    pairs = (
        t.lineitem.join(t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    sym = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    pr = G.pagerank(sym, iterations=5)
    print("\n== PageRank: top 5 suppliers by centrality")
    pr.filter(F.col("node") % 2 == 1).select(
        F.expr("node div 2").alias("suppkey"), "rank"
    ).orderBy(F.desc("rank")).show(5)

    seeds = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 2).alias("node")
    )
    ppr = G.personalized_pagerank(sym, seeds, iterations=5)
    print("== Personalized PageRank: suppliers closest to the BUILDING segment")
    ppr.filter(F.col("node") % 2 == 1).select(
        F.expr("node div 2").alias("suppkey"), "rank"
    ).orderBy(F.desc("rank")).show(5)

    directed = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    hits = G.hits(directed, iterations=5)
    print("== HITS: top sellers by authority / buyers by hubness")
    hits.orderBy(F.desc("auth_fp")).select(
        F.expr("node div 2").alias("suppkey"), "auth"
    ).show(3)
    hits.orderBy(F.desc("hub_fp")).select(
        F.expr("node div 2").alias("custkey"), "hub"
    ).show(3)

    # --- thresholded co-order part graph ------------------------------
    co = G.frequent_item_pairs(
        t.lineitem, "l_orderkey", "l_partkey", min_support=2
    ).select("item_a", "item_b")
    edges = co.select(F.col("item_a").alias("src"), F.col("item_b").alias("dst")).unionAll(
        co.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )

    lab = G.label_propagation(edges, iterations=4)
    print("== Label propagation: largest purchasing-neighborhood communities")
    lab.groupBy("label").count().orderBy(F.desc("count"), "label").show(5)

    core = G.k_core(edges, k=3, max_rounds=12)
    print(f"== 3-core: {core.count()} parts in the cohesive interior")

    seeds_p = t.part.filter(F.col("p_brand") == "Brand#4").select(
        F.col("p_partkey").alias("node")
    )
    hops = G.bfs_hops(edges, seeds_p, max_hops=6)
    print("== BFS: hop-distance histogram from the Brand#4 parts")
    hops.groupBy("hops").count().orderBy("hops").show()

    tri = G.triangle_counts(
        co.select(F.col("item_a").alias("u"), F.col("item_b").alias("v"))
    )
    print("== Triangles: most-embedded parts")
    tri.orderBy(F.desc("n_triangles"), "node").show(5)

    cc = G.clustering_coefficient(
        co.select(F.col("item_a").alias("u"), F.col("item_b").alias("v"))
    )
    print("== Clustering coefficient: community cores vs broker hubs")
    cc.filter(F.col("degree") >= 3).orderBy(
        F.desc("clustering"), "node"
    ).show(5)

    mod = G.modularity(edges, lab)
    q = mod.agg(
        (F.sum("dq_num") / (F.first("m2") * F.first("m2")).cast("double")).alias("q")
    ).collect()[0]["q"]
    print(f"== Modularity of the LPA partition: Q = {q:.4f}")
    mod.orderBy(F.desc("dq_num"), "label").select(
        "label", "n_nodes", "intra2", "deg_sum", "dq_num"
    ).show(5)

    rules = G.association_rules(t.lineitem, "l_orderkey", "l_partkey", min_support=3)
    print("== Association rules: highest-lift recommendations")
    rules.orderBy(F.desc("lift"), "antecedent", "consequent").select(
        "antecedent", "consequent", "pair_support", "confidence", "lift"
    ).show(5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
