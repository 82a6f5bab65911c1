"""Graph analytics over relationship edges derived from the relational
tables: fixed-point PageRank and degree-ordered triangle counting.

Not rearview parity; north-star pipeline extensions (the reference's
dashboards rank jobs/metrics by direct aggregates — entity-importance
ranking over a *relationship* graph, e.g. "which suppliers sit at the
center of the purchasing network", is the graph-shaped version of the
same question, and triangle density is the classic cohesion signal for
community/abuse detection over interaction logs).

Determinism contract (the reason both operators are gate-able with a
value-level DuckDB oracle): PageRank here is INTEGER fixed-point — ranks
are maintained as ``floor(rank * SCALE)`` bigints and every per-edge
contribution is ``(num * r) div (den * outdeg)`` in bigint arithmetic,
so partial-aggregation order cannot perturb a single bit (integer sums
commute exactly; float sums do not). One float appears in the output:
``rank = rank_fp / SCALE``, a single division per row, identical IEEE
result in any engine. Triangle counts are pure integers.

Why these shapes survive 100 TB:

- PageRank state is O(nodes) per iteration; the edge list is built
  once, co-partitioned by ``src`` and locally checkpointed, so every
  iteration is one partition-local join (edges x ranks on the SAME key)
  plus one shuffle-agg keyed by ``dst`` whose map-side combine reduces
  to one row per (task, dst). Nothing corpus-sized moves twice.
- Fixed-point also kills the classic distributed-PageRank drift bug:
  float ranks diverge across runs when AQE re-splits partial sums;
  integer ranks cannot.
- Triangle counting orients each undirected edge from its
  lower-(degree, id) endpoint to its higher one. Every wedge join then
  fans out from a node's *forward* adjacency only, which is O(sqrt(m))
  per node on any graph (the standard arboricity bound) instead of
  O(max_degree) — the difference between a skew-immune join and a hot
  key that never finishes at scale. The closing edge lookup is a
  semi-join against the oriented edge list itself.

Reference parity note: the reference has no graph layer (its Ruby app
delegates all analytics to Graphite — /root/reference/README.md:6);
this module is part of the large-scale-pipeline scope described in
SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Integer fixed-point PageRank over a directed edge list
    ``(src bigint, dst bigint)``.

    Every node must appear as a ``src`` at least once (callers using an
    undirected relationship emit both directions, which guarantees it);
    nodes that receive no contributions in an iteration still get the
    teleport base via the right-outer node join.

    Recurrence (all bigint):

        r0(v)     = scale div n
        r_{t+1}(v) = (den-num)*scale div (den*n)
                     + sum over in-edges (u,v) of
                       (num * r_t(u)) div (den * outdeg(u))

    Returns ``(node, rank_fp, rank)`` — ``rank_fp`` the bigint
    fixed-point rank, ``rank`` its single-division double projection.

    Driver-side scalars: one ``count()`` for n (node count — the same
    "scalar aggregate" class as the PQ codebook fits). The edge list is
    repartitioned by ``src`` and locally checkpointed ONCE; at real
    scale swap ``localCheckpoint`` for a reliable checkpoint dir.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = (
        edges.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    nodes = ew.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_fp"),
            F.lit(0.0).alias("rank"),
        )
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    for _ in range(iterations):
        contrib = ew.join(ranks, ew["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping_num} * r) div ({damping_den} * outdeg)").alias("c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("s"))
            .join(nodes, "node", "right_outer")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_fp"),
        (F.col("r") / F.lit(float(scale))).alias("rank"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Personalized PageRank: the teleport mass restarts at ``seeds``
    (a frame with a ``node`` column) instead of uniformly — rank becomes
    proximity TO the seed set, the classic recommendation / related-
    entity primitive ("suppliers close to this customer segment").

    Same integer fixed-point contract as :func:`pagerank` (bigint
    recurrence, aggregation-order-immune, oracle-replayable):

        r0(v)      = scale div s            if v is an in-graph seed, else 0
        r_{t+1}(v) = [v seed] * (den-num)*scale div (den*s)
                     + sum over in-edges (u,v) of
                       (num * r_t(u)) div (den * outdeg(u))

    with s = |seeds present in the graph| (off-graph seeds are ignored
    on BOTH engines — proximity to a node with no edges is undefined).
    Unlike uniform PageRank the mass is not conserved toward 1 — rank
    decays with distance from the seeds, which is the point. Same scale
    shape as :func:`pagerank`: edge list repartitioned + checkpointed
    once, per-iteration broadcast-sized rank join + right-outer to the
    node frame, driver-side scalar for s."""
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = edges.join(deg, "src").repartition("src").localCheckpoint(eager=True)
    sflag = seeds.select("node").distinct().withColumn("_seed", F.lit(1))
    nodes = (
        ew.select(F.col("src").alias("node"))
        .distinct()
        .join(sflag, "node", "left")
        .select("node", F.coalesce(F.col("_seed"), F.lit(0)).alias("_seed"))
        .localCheckpoint(eager=True)
    )
    s = nodes.agg(F.sum("_seed")).collect()[0][0] or 0
    if s == 0:
        raise ValueError("personalized_pagerank: no seed appears in the graph")
    base = ((damping_den - damping_num) * scale) // (damping_den * s)
    ranks = nodes.select(
        "node",
        F.when(F.col("_seed") == 1, F.lit(scale // s))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for _ in range(iterations):
        contrib = ew.join(ranks, ew["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr(f"({damping_num} * r) div ({damping_den} * outdeg)").alias("c"),
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("su"))
            .join(nodes, "node", "right_outer")
            .select(
                "node",
                (
                    F.when(F.col("_seed") == 1, F.lit(base)).otherwise(F.lit(0))
                    + F.coalesce(F.col("su"), F.lit(0))
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_fp"),
        (F.col("r") / F.lit(float(scale))).alias("rank"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED edge
    list given as canonical pairs ``(u bigint, v bigint)`` with
    ``u < v``, pre-deduplicated (callers build it with
    least/greatest + distinct).

    Orients each edge from its lower-(degree, id) endpoint ``a`` to the
    higher one, joins forward adjacencies ``(a,b) x (a,c)`` with
    ``b`` before ``c`` in the same order to enumerate each wedge once,
    and closes the wedge against the oriented edge list — so every
    triangle is found exactly once, regardless of degree skew (see
    module docstring for the arboricity bound).

    Returns ``(node, n_triangles)`` for nodes in at least one triangle.
    """
    # total (degree, id) order: rank = degree * 2^32 + id (ids are
    # table keys, far below 2^32; documented caller contract)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .select(
            "node", (F.col("d") * F.lit(2**32) + F.col("node")).alias("rank")
        )
    )
    ru = deg.select(F.col("node").alias("u"), F.col("rank").alias("rank_u"))
    rv = deg.select(F.col("node").alias("v"), F.col("rank").alias("rank_v"))
    oriented = (
        edges.join(ru, "u")
        .join(rv, "v")
        .select(
            F.when(F.col("rank_u") < F.col("rank_v"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("a"),
            F.when(F.col("rank_u") < F.col("rank_v"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("b"),
            F.greatest("rank_u", "rank_v").alias("rank_b"),
        )
    ).localCheckpoint(eager=True)
    e1 = oriented.select("a", "b", "rank_b")
    e2 = oriented.select(
        F.col("a").alias("a2"), F.col("b").alias("c"), F.col("rank_b").alias("rank_c")
    )
    wedges = e1.join(e2, (e1["a"] == e2["a2"]) & (e1["rank_b"] < e2["rank_c"])).select(
        "a", "b", "c"
    )
    closing = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tris = wedges.join(closing, ["b", "c"], "left_semi")
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket frequent pairs with a-priori pruning (Agrawal &
    Srikant VLDB'94): pairs of items co-occurring in at least
    ``min_support`` baskets — the co-occurrence EDGE LIST the
    recommendation / co-purchase graph is built from (and the input
    :func:`pagerank` / :func:`triangle_counts` consume).

    The a-priori property carries the scale story: a pair can only be
    frequent if BOTH items are (support is anti-monotone), so items
    below ``min_support`` are dropped BEFORE the basket self-join —
    the join's blow-up is quadratic in basket size, and pruning
    removes the long tail of one-off items from every basket first.
    Plan: distinct (basket, item) → item-support hash agg →
    broadcast-semi prune → self-join on basket → pair hash agg with an
    integer HAVING. All counts are integers — no float drift anywhere.
    """
    b = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    freq = (
        b.groupBy("it")
        .agg(F.count("*").alias("item_support"))
        .filter(F.col("item_support") >= min_support)
        .select("it")
    )
    pruned = b.join(freq, "it", "left_semi")
    a = pruned.select(F.col("bk"), F.col("it").alias("item_a"))
    c = pruned.select(F.col("bk"), F.col("it").alias("item_b"))
    return (
        a.join(c, "bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
