"""Gate queries for the graph-analytics operators (operators/graph.py)
over relationship edges derived from the TPC-H-ish tables, each with a
value-level DuckDB oracle.

The PageRank oracle unrolls the integer fixed-point recurrence as
chained CTEs (the Holt-Winters / Lloyd-iteration oracle discipline) —
because the operator's arithmetic is all-bigint, hash-level agreement is
exact, not approximate. Triangle counts are compared via the canonical
id-ordered enumeration; the operator's degree-ordered orientation finds
the identical triangle set (orientation only changes the join schedule,
never the answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.operators import graph as G
from rearview_spark.sources.loader import Tables

QUERIES: dict[str, dict] = {}

PR_ITERS = 5
PR_SCALE = G.PAGERANK_SCALE


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer<->supplier purchasing network: nodes
    are customers (2k) and suppliers (2k+1) linked by any lineitem, run
    as a symmetric directed graph (both directions per relationship, so
    no dangling mass). 5 fixed-point iterations; see operators/graph.py
    for the integer determinism contract."""
    t = Tables(spark, sf_dir)
    pairs = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    pr = G.pagerank(edges, iterations=PR_ITERS)
    return pr.select(
        F.when(pr["node"] % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node div 2").alias("entity_key"),
        "rank_fp",
        "rank",
    ).orderBy("kind", "entity_key")


def _pagerank_sql() -> str:
    base = f"(15 * CAST({PR_SCALE} AS BIGINT)) // (100 * n)"
    ctes = [
        f"""pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        """edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL SELECT s AS src, c AS dst FROM pairs)""",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM deg)",
        f"r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) // n AS r FROM deg, nn)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT deg.src AS node,
         (SELECT {base} FROM nn) + COALESCE(c.s, 0) AS r
  FROM deg LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM((85 * p.r) // (100 * dd.outdeg)) AS BIGINT) AS s
    FROM edges e JOIN r{i - 1} p ON e.src = p.node JOIN deg dd ON e.src = dd.src
    GROUP BY e.dst) c ON deg.src = c.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_key,
       r AS rank_fp,
       r / {float(PR_SCALE)} AS rank
FROM r{PR_ITERS}
ORDER BY kind, entity_key"""
    )


QUERIES["graph_pagerank"] = {"fn": graph_pagerank, "oracle": _pagerank_sql()}


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-order graph (parts
    linked when some order contains both): the classic cohesion count,
    computed with the degree-ordered wedge join."""
    li = Tables(spark, sf_dir).lineitem
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("ob"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (a["l_orderkey"] == b["ob"]) & (a["pa"] < b["pb"]))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct()
    )
    tc = G.triangle_counts(pairs)
    return tc.select(F.col("node").alias("p_partkey"), "n_triangles").orderBy(
        "p_partkey"
    )


GRAPH_TRIANGLES_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT node AS p_partkey, count(*) AS n_triangles
FROM corners GROUP BY node ORDER BY p_partkey
"""

QUERIES["graph_triangles"] = {"fn": graph_triangles, "oracle": GRAPH_TRIANGLES_SQL}


def graph_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-priori frequent co-purchase pairs over lineitem baskets
    (graph.frequent_item_pairs): support-2 pairs of parts co-occurring
    in orders. Pure integer counts; the oracle is the unpruned
    formulation, so the hash match proves the a-priori prune dropped
    nothing (anti-monotonicity made concrete)."""
    from rearview_spark.operators.graph import frequent_item_pairs

    li = Tables(spark, sf_dir).lineitem
    return frequent_item_pairs(
        li, basket_col="l_orderkey", item_col="l_partkey", min_support=2
    ).orderBy("item_a", "item_b")


GRAPH_PAIRS_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem)
SELECT a.it AS item_a, c.it AS item_b, count(*) AS pair_support
FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY item_a, item_b
"""

QUERIES["graph_item_pairs"] = {"fn": graph_item_pairs, "oracle": GRAPH_PAIRS_SQL}


# --- co-purchase components (staged r10, register r11) ------------------------
# r10's driver window closed at its 50-row ceiling; staged like
# ts_rollup_refresh — tests/test_pending_gates.py already oracle-checks it.

def graph_copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph: the support-2
    frequent pairs become edges, dedup.connected_components (iterative
    min-label propagation — no single-query SQL form) labels them, and
    the gate emits the per-component summary. The oracle rebuilds the
    pairs brute-force and recurses transitive closure — DuckDB
    recursion checks Spark iteration (the dedup_duplicate_groups
    precedent, on a different graph)."""
    from rearview_spark.operators.dedup import connected_components
    from rearview_spark.operators.graph import frequent_item_pairs

    pairs = frequent_item_pairs(
        Tables(spark, sf_dir).lineitem, "l_orderkey", "l_partkey", min_support=2
    ).select(
        F.col("item_a").alias("id_a"), F.col("item_b").alias("id_b")
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.min("id").alias("min_item"),
            F.max("id").alias("max_item"),
        )
        .orderBy("component")
    )


GRAPH_COMPONENTS_SQL = """
WITH RECURSIVE b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
pairs AS (
  SELECT a.it AS id_a, c.it AS id_b
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src
),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS n_members, min(id) AS min_item, max(id) AS max_item
FROM comp GROUP BY component ORDER BY component
"""


# Registered r11 (was staged r10 at the window ceiling; oracle-green via
# tests/test_pending_gates.py throughout).
QUERIES["graph_copurchase_components"] = {
    "fn": graph_copurchase_components,
    "oracle": GRAPH_COMPONENTS_SQL,
}

def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the customer<->supplier purchasing
    network (operators/graph.personalized_pagerank), teleporting to the
    BUILDING-segment customers: rank = proximity to that segment, the
    "suppliers serving this market" recommendation read. Same integer
    fixed-point contract and network as graph_pagerank; the oracle
    replays the seeded recurrence iteration by iteration."""
    t = Tables(spark, sf_dir)
    pairs = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 2).alias("node")
    )
    pr = G.personalized_pagerank(edges, seeds, iterations=PR_ITERS)
    return pr.select(
        F.when(pr["node"] % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node div 2").alias("entity_key"),
        "rank_fp",
        "rank",
    ).orderBy("kind", "entity_key")


def _ppr_sql() -> str:
    base = f"(15 * CAST({PR_SCALE} AS BIGINT)) // (100 * s)"
    ctes = [
        f"""pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        """edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL SELECT s AS src, c AS dst FROM pairs)""",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        """seeds AS (
  SELECT DISTINCT c_custkey * 2 AS node FROM customer
  WHERE c_mktsegment = 'BUILDING')""",
        """sd AS (
  SELECT deg.src AS node,
         CASE WHEN se.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
  FROM deg LEFT JOIN seeds se ON deg.src = se.node)""",
        "ns AS (SELECT CAST(SUM(is_seed) AS BIGINT) AS s FROM sd)",
        f"""r0 AS (
  SELECT node,
         CASE WHEN is_seed = 1 THEN CAST({PR_SCALE} AS BIGINT) // s ELSE 0 END AS r
  FROM sd, ns)""",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT sd.node,
         CASE WHEN sd.is_seed = 1 THEN (SELECT {base} FROM ns) ELSE 0 END
           + COALESCE(c.s2, 0) AS r
  FROM sd LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM((85 * p.r) // (100 * dd.outdeg)) AS BIGINT) AS s2
    FROM edges e JOIN r{i - 1} p ON e.src = p.node JOIN deg dd ON e.src = dd.src
    GROUP BY e.dst) c ON sd.node = c.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_key,
       CAST(r AS BIGINT) AS rank_fp,
       r / {float(PR_SCALE)} AS rank
FROM r{PR_ITERS}
ORDER BY kind, entity_key"""
    )


LPA_ITERS = 4
KCORE_K = 3
KCORE_ROUNDS = 12

# Shared fixture for the r12 community/cohesion gates: the THRESHOLDED
# co-order part graph (parts co-ordered in >= 2 distinct orders) — the
# same edge set graph_copurchase_components clusters, sparse enough
# (median degree 3 at sf0.01) that communities and cores are
# non-trivial, where the raw co-order graph (min degree 42) is one
# dense blob.
_COORDER_EDGES_CTE = """b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
pairs AS (
  SELECT a.it AS u, c.it AS v
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
  SELECT u AS src, v AS dst FROM pairs
  UNION ALL
  SELECT v, u FROM pairs
)"""


def _coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Tables(spark, sf_dir).lineitem
    pairs = G.frequent_item_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    ).select("item_a", "item_b")
    return pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round label-propagation communities over the thresholded
    co-order part graph (operators/graph.label_propagation): which
    parts cluster into the same purchasing neighborhood. Deterministic
    plurality/tie-break recurrence, so the oracle replays it with
    chained CTEs exactly like the PageRank gates."""
    lab = G.label_propagation(_coorder_edges(spark, sf_dir), iterations=LPA_ITERS)
    sizes = lab.groupBy("label").agg(F.count("*").alias("community_size"))
    return (
        lab.join(sizes, "label")
        .select(
            F.col("node").alias("p_partkey"),
            F.col("label").alias("community"),
            "community_size",
        )
        .orderBy("p_partkey")
    )


def _lpa_sql() -> str:
    ctes = [
        _COORDER_EDGES_CTE,
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)",
    ]
    for i in range(1, LPA_ITERS + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, p.label AS label, count(*) AS cnt,
           row_number() OVER (
             PARTITION BY e.dst ORDER BY count(*) DESC, p.label ASC) AS rn
    FROM edges e JOIN l{i - 1} p ON e.src = p.node
    GROUP BY e.dst, p.label) t
  WHERE rn = 1)"""
        )
    ctes.append(
        f"sizes AS (SELECT label, count(*) AS community_size "
        f"FROM l{LPA_ITERS} GROUP BY label)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT l.node AS p_partkey, l.label AS community, s.community_size
FROM l{LPA_ITERS} l JOIN sizes s ON l.label = s.label
ORDER BY p_partkey"""
    )


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core (k = KCORE_K) of the thresholded co-order part graph
    (operators/graph.k_core): the cohesive interior after peeling away
    parts with fewer than k strong co-order partners. Monotone
    integer peel, so the fixed-round oracle replay is exact whether or
    not the operator early-exits at the fixed point."""
    core = G.k_core(
        _coorder_edges(spark, sf_dir), k=KCORE_K, max_rounds=KCORE_ROUNDS
    )
    return core.select(
        F.col("node").alias("p_partkey"), "core_degree"
    ).orderBy("p_partkey")


def _kcore_sql() -> str:
    # Each round references the previous round exactly ONCE (degrees via
    # two window counts over the same frame, not semi-joins): DuckDB
    # inlines non-materialized CTEs per reference, so a
    # triple-referencing round unrolled 12 deep re-expands the base scan
    # 3^12 times — single-reference keeps the expansion linear.
    ctes = [_COORDER_EDGES_CTE, "k0 AS (SELECT src, dst FROM edges)"]
    for i in range(1, KCORE_ROUNDS + 1):
        ctes.append(
            f"""k{i} AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           count(*) OVER (PARTITION BY src) AS dsrc,
           count(*) OVER (PARTITION BY dst) AS ddst
    FROM k{i - 1}) t
  WHERE dsrc >= {KCORE_K} AND ddst >= {KCORE_K})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT src AS p_partkey, count(*) AS core_degree
FROM k{KCORE_ROUNDS}
GROUP BY src
ORDER BY p_partkey"""
    )


def graph_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over order baskets
    (operators/graph.association_rules): for each frequent co-ordered
    part pair, both rule directions with exact integer supports and
    single-division confidence / lift — the ranking signal a
    recommender reads off the co-purchase graph."""
    li = Tables(spark, sf_dir).lineitem
    rules = G.association_rules(li, "l_orderkey", "l_partkey", min_support=3)
    return rules.orderBy("antecedent", "consequent")


GRAPH_ASSOC_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
n AS (SELECT count(DISTINCT bk) AS n_baskets FROM b),
isup AS (SELECT it, count(*) AS sup FROM b GROUP BY it),
pairs AS (
  SELECT a.it AS item_a, c.it AS item_b, count(*) AS pair_support
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2 HAVING count(*) >= 3
),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, pair_support FROM pairs
  UNION ALL
  SELECT item_b, item_a, pair_support FROM pairs
)
SELECT d.antecedent, d.consequent, d.pair_support,
       sa.sup AS ant_support, sc.sup AS con_support,
       CAST(d.pair_support AS DOUBLE) / sa.sup AS confidence,
       CAST(d.pair_support * n.n_baskets AS DOUBLE) / (sa.sup * sc.sup) AS lift
FROM directed d
JOIN isup sa ON d.antecedent = sa.it
JOIN isup sc ON d.consequent = sc.it
CROSS JOIN n
ORDER BY d.antecedent, d.consequent
"""


# Staged for later registration (window arithmetic in plans/__init__.py:
# r13 takes the two earlier staged gates, r14 the behavior trio + RFM,
# later rounds the rest; all oracle-green via tests/test_pending_gates.py).
PENDING_QUERIES: dict[str, dict] = {
    "graph_ppr": {"fn": graph_ppr, "oracle": _ppr_sql()},
    "graph_label_propagation": {"fn": graph_label_propagation, "oracle": _lpa_sql()},
    "graph_kcore": {"fn": graph_kcore, "oracle": _kcore_sql()},
    "graph_assoc_rules": {"fn": graph_assoc_rules, "oracle": GRAPH_ASSOC_SQL},
}


BFS_MAX_HOPS = 6


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS distance (operators/graph.bfs_hops) over the
    thresholded co-order part graph from the Brand#4 parts: how many
    strong co-order steps away every reachable part sits from the
    promoted brand — the landmark-distance graph feature. The oracle is
    a recursive CTE enumerating all (node, depth<=H) reachings and
    taking the min depth, which equals the fixed-round min-propagation
    exactly."""
    t = Tables(spark, sf_dir)
    seeds = t.part.filter(F.col("p_brand") == "Brand#4").select(
        F.col("p_partkey").alias("node")
    )
    dist = G.bfs_hops(
        _coorder_edges(spark, sf_dir), seeds, max_hops=BFS_MAX_HOPS
    )
    return dist.select(F.col("node").alias("p_partkey"), "hops").orderBy(
        "p_partkey"
    )


GRAPH_BFS_SQL = f"""
WITH RECURSIVE {_COORDER_EDGES_CTE},
nodes AS (SELECT DISTINCT src AS node FROM edges),
seeds AS (
  SELECT n.node FROM nodes n
  JOIN part p ON n.node = p.p_partkey
  WHERE p.p_brand = 'Brand#4'
),
reach(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges e ON r.node = e.src
  WHERE r.d < {BFS_MAX_HOPS}
)
SELECT node AS p_partkey, CAST(min(d) AS BIGINT) AS hops
FROM reach
GROUP BY node
ORDER BY p_partkey
"""

PENDING_QUERIES["graph_bfs_hops"] = {
    "fn": graph_bfs_hops,
    "oracle": GRAPH_BFS_SQL,
}


HITS_ITERS = 5
HITS_SCALE = G.HITS_SCALE


def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (operators/graph.hits) over the DIRECTED
    customer -> supplier purchase graph: customers score as hubs
    (discerning buyers), suppliers as authorities (endorsed sellers) —
    the dual ranking the symmetric PageRank gate cannot express. The
    oracle replays the max-norm integer recurrence iteration by
    iteration."""
    t = Tables(spark, sf_dir)
    edges = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    out = G.hits(edges, iterations=HITS_ITERS)
    return out.select(
        F.when(out["node"] % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node div 2").alias("entity_key"),
        "hub_fp",
        "hub",
        "auth_fp",
        "auth",
    ).orderBy("kind", "entity_key")


def _hits_sql() -> str:
    ctes = [
        """edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        "srcs AS (SELECT DISTINCT src AS node FROM edges)",
        "dsts AS (SELECT DISTINCT dst AS node FROM edges)",
        f"h0 AS (SELECT node, CAST({HITS_SCALE} AS BIGINT) AS h FROM srcs)",
    ]
    for i in range(1, HITS_ITERS + 1):
        ctes.append(
            f"""ar{i} AS (
  SELECT e.dst AS node, SUM(p.h) AS a
  FROM edges e JOIN h{i - 1} p ON e.src = p.node GROUP BY e.dst)"""
        )
        ctes.append(
            f"""a{i} AS (
  SELECT node, (a * {HITS_SCALE}) // max(a) OVER () AS a FROM ar{i})"""
        )
        ctes.append(
            f"""hr{i} AS (
  SELECT e.src AS node, SUM(p.a) AS h
  FROM edges e JOIN a{i} p ON e.dst = p.node GROUP BY e.src)"""
        )
        ctes.append(
            f"""h{i} AS (
  SELECT node, (h * {HITS_SCALE}) // max(h) OVER () AS h FROM hr{i})"""
        )
    last = HITS_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN n.node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       n.node // 2 AS entity_key,
       CAST(COALESCE(h.h, 0) AS BIGINT) AS hub_fp,
       COALESCE(h.h, 0) / {float(HITS_SCALE)} AS hub,
       CAST(COALESCE(a.a, 0) AS BIGINT) AS auth_fp,
       COALESCE(a.a, 0) / {float(HITS_SCALE)} AS auth
FROM (SELECT node FROM srcs UNION SELECT node FROM dsts) n
LEFT JOIN h{last} h ON n.node = h.node
LEFT JOIN a{last} a ON n.node = a.node
ORDER BY kind, entity_key"""
    )


PENDING_QUERIES["graph_hits"] = {"fn": graph_hits, "oracle": _hits_sql()}

# r13 registration (VERDICT_r12 next-round #1): the staged backlog flips
# live in one move. Never-driver-checked names front-load automatically via
# group (c) in plans/all_queries(), so each gets a first driver row this
# round; the window's remaining slots rotate the stalest green cohort.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-order part graph
    (operators/graph.degree_histogram): the hub/power-law forensics
    read taken before any per-node iteration — the histogram tail IS
    the skew a PageRank/LPA run will face. Exact counts, two hash
    collapses past the edge-scale distinct."""
    from rearview_spark.operators.graph import degree_histogram

    return degree_histogram(_coorder_edges(spark, sf_dir))


GRAPH_DEGREE_SQL = f"""
WITH {_COORDER_EDGES_CTE},
deg AS (
  SELECT src, count(*) AS degree
  FROM (SELECT DISTINCT src, dst FROM edges) GROUP BY 1)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1 ORDER BY 1
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["graph_degree_hist"] = {
    "fn": graph_degree_hist,
    "oracle": GRAPH_DEGREE_SQL,
}

# r14 flip (VERDICT_r13 next-round #1): every staged gate registers —
# the window arithmetic is 16 first-ever checks + 34 stale rotations.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link-prediction scores over the thresholded
    co-order part graph (operators/graph.adamic_adar): which NOT-yet-
    co-ordered part pairs share the most (inverse-log-degree-weighted)
    purchasing neighborhoods — the "customers also bought" candidate
    generator on the same edge set the LPA/k-core gates cluster."""
    li = Tables(spark, sf_dir).lineitem
    pairs = G.frequent_item_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    ).select(F.col("item_a").alias("u"), F.col("item_b").alias("v"))
    return G.adamic_adar(pairs)


GRAPH_AA_SQL = f"""
WITH {_COORDER_EDGES_CTE},
adj AS (SELECT u AS w, v AS x FROM pairs UNION ALL SELECT v, u FROM pairs),
deg AS (SELECT w, count(*) AS d FROM adj GROUP BY w),
ctr AS (
  SELECT w, CAST(round(1000000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS uu
  FROM deg WHERE d >= 2),
p2 AS (
  SELECT a1.x AS u, a2.x AS v, c.uu
  FROM adj a1
  JOIN ctr c ON a1.w = c.w
  JOIN adj a2 ON a2.w = a1.w AND a1.x < a2.x),
s AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(uu) AS BIGINT) AS units
  FROM p2 GROUP BY 1, 2),
ne AS (
  SELECT s.u, s.v, s.n_common, s.units
  FROM s LEFT JOIN pairs p ON s.u = p.u AND s.v = p.v
  WHERE p.u IS NULL)
SELECT u, v, n_common,
       round(units / 1000000000.0 + 0.0000000005, 6) AS score
FROM ne ORDER BY u, v
"""

# Staged (r14 growth budget; flips in r15).
PENDING_QUERIES["graph_adamic_adar"] = {
    "fn": graph_adamic_adar,
    "oracle": GRAPH_AA_SQL,
}


# r15 FLIP (VERDICT_r14 next-round #1): the r14-staged wave registers —
# every gate below was pre-verified at sf0.001 + sf0.01 + sf0.1 through
# tests/test_pending_gates.py, so this is the known-green one-line move.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}

def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient over the co-order graph
    (operators/graph.clustering_coefficient): 2*tri / (deg*(deg-1)),
    the community-core vs broker-hub read next to graph_triangles and
    graph_degree_hist."""
    from rearview_spark.operators.graph import clustering_coefficient

    li = Tables(spark, sf_dir).lineitem
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select(
        F.col("l_orderkey").alias("ob"), F.col("l_partkey").alias("pb")
    )
    pairs = (
        a.join(b, (a["l_orderkey"] == b["ob"]) & (a["pa"] < b["pb"]))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .distinct()
    )
    out = clustering_coefficient(pairs)
    return out.select(
        F.col("node").alias("p_partkey"), "degree", "n_triangles", "clustering"
    ).orderBy("p_partkey")


GRAPH_CLUSTERING_SQL = """
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
  GROUP BY node),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.u = e1.v
  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
tcnt AS (SELECT node, count(*) AS n_tri FROM corners GROUP BY node)
SELECT d.node AS p_partkey,
       CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
         2.0 * CAST(coalesce(t.n_tri, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE) END AS clustering
FROM deg d LEFT JOIN tcnt t ON t.node = d.node
ORDER BY p_partkey
"""

# Staged (r15 wave — r16 budget).
PENDING_QUERIES["graph_clustering_coeff"] = {
    "fn": graph_clustering_coeff,
    "oracle": GRAPH_CLUSTERING_SQL,
}

# r16 flip: the r15-staged wave registers (window = 7 flips + 34 r10 +
# 9 r11 rotations, pinned by VERDICT_r15 next-round #3).
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA partition over the thresholded
    co-order part graph (operators/graph.modularity over
    label_propagation at LPA_ITERS): the quality audit a community run
    is judged by before its output drives sampling or dedup decisions.
    Per community: exact int64 node count, directed intra-edge count,
    degree sum, and contribution numerator ``dq_num = m2*intra2 -
    deg_sum^2``; ``dq`` is ONE division of exact integers by ``m2^2``
    (nudged 6dp both sides). Q is the sum of dq over rows — left as
    rows so the frame stays integer-exact."""
    edges = _coorder_edges(spark, sf_dir).localCheckpoint(eager=True)
    lab = G.label_propagation(edges, iterations=LPA_ITERS)
    out = G.modularity(edges, lab)
    return out.select(
        F.col("label").alias("community"),
        "n_nodes",
        "intra2",
        "deg_sum",
        "dq_num",
        "m2",
        F.round(
            F.col("dq_num")
            / (F.col("m2") * F.col("m2")).cast("double")
            + F.lit(5e-10),
            6,
        ).alias("dq"),
    ).orderBy("community")


def _modularity_sql() -> str:
    ctes = [
        _COORDER_EDGES_CTE,
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)",
    ]
    for i in range(1, LPA_ITERS + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, p.label AS label, count(*) AS cnt,
           row_number() OVER (
             PARTITION BY e.dst ORDER BY count(*) DESC, p.label ASC) AS rn
    FROM edges e JOIN l{i - 1} p ON e.src = p.node
    GROUP BY e.dst, p.label) t
  WHERE rn = 1)"""
        )
    ctes.append(
        "m2t AS (SELECT count(*) AS m2 FROM edges)"
    )
    ctes.append(
        f"""degl AS (
  SELECT l.label, count(*) AS n_nodes, sum(d.d) AS deg_sum
  FROM (SELECT src, count(*) AS d FROM edges GROUP BY src) d
  JOIN l{LPA_ITERS} l ON d.src = l.node
  GROUP BY l.label)"""
    )
    ctes.append(
        f"""intra AS (
  SELECT a.label, count(*) AS intra2
  FROM edges e
  JOIN l{LPA_ITERS} a ON e.src = a.node
  JOIN l{LPA_ITERS} b ON e.dst = b.node
  WHERE a.label = b.label
  GROUP BY a.label)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT d.label AS community,
       CAST(d.n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(i.intra2, 0) AS BIGINT) AS intra2,
       CAST(d.deg_sum AS BIGINT) AS deg_sum,
       CAST(m2t.m2 * coalesce(i.intra2, 0) - d.deg_sum * d.deg_sum AS BIGINT) AS dq_num,
       CAST(m2t.m2 AS BIGINT) AS m2,
       round(CAST(m2t.m2 * coalesce(i.intra2, 0) - d.deg_sum * d.deg_sum AS DOUBLE)
             / CAST(m2t.m2 * m2t.m2 AS DOUBLE) + 0.0000000005, 6) AS dq
FROM degl d LEFT JOIN intra i ON d.label = i.label, m2t
ORDER BY community"""
    )


# Staged (r16 wave — r17 budget; pre-verified by
# tests/test_pending_gates.py at three scales before the flip).
PENDING_QUERIES["graph_modularity"] = {
    "fn": graph_modularity,
    "oracle": _modularity_sql(),
}


SSSP_ROUNDS = 6


def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source weighted shortest paths
    (operators/graph.shortest_paths) over the co-order part graph from
    the Brand#4 parts, with the integer closeness cost
    ``w = ceil(10 / pair_support)`` (strongly co-purchased pairs are
    cheap to cross, threshold pairs cost 5) — "how close is every part
    to the promoted set when tie strength matters", the weighted
    companion to graph_bfs_hops. Bounded Bellman-Ford (SSSP_ROUNDS
    relaxation rounds = max path length); pure int64 min/plus, so the
    oracle unrolls the recurrence as chained MATERIALIZED CTEs (the
    k-core discipline — materialization keeps the doubly-referenced
    round frames from exponential re-inlining)."""
    li = Tables(spark, sf_dir).lineitem
    pairs = G.frequent_item_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    )
    w = ((F.lit(10) + F.col("pair_support") - 1) / F.col("pair_support")).cast(
        "long"
    )
    wedges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst"), w.alias("w")
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("src"), F.col("item_a").alias("dst"), w.alias("w")
        )
    )
    seeds = Tables(spark, sf_dir).part.filter(
        F.col("p_brand") == "Brand#4"
    ).select(F.col("p_partkey").alias("node"))
    dist = G.shortest_paths(wedges, seeds, rounds=SSSP_ROUNDS)
    return dist.select(F.col("node").alias("p_partkey"), "dist").orderBy(
        "p_partkey"
    )


def _sssp_sql() -> str:
    ctes = [
        """b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
wpairs AS (
  SELECT a.it AS u, c.it AS v, count(*) AS s
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2 HAVING count(*) >= 2
),
wedges AS MATERIALIZED (
  SELECT u AS src, v AS dst, (10 + s - 1) // s AS w FROM wpairs
  UNION ALL
  SELECT v, u, (10 + s - 1) // s FROM wpairs
),
seeds AS (
  SELECT DISTINCT e.src AS node FROM wedges e
  JOIN part p ON e.src = p.p_partkey
  WHERE p.p_brand = 'Brand#4'
),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds)"""
    ]
    for i in range(1, SSSP_ROUNDS + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT node, min(d) AS dist FROM (
    SELECT node, dist AS d FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.w AS d
    FROM wedges e JOIN d{i - 1} p ON e.src = p.node
  ) GROUP BY node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node AS p_partkey, CAST(dist AS BIGINT) AS dist
FROM d{SSSP_ROUNDS}
ORDER BY p_partkey"""
    )


# Staged (r16 wave — r17 budget; pre-verified by
# tests/test_pending_gates.py at three scales before the flip).
PENDING_QUERIES["graph_shortest_paths"] = {
    "fn": graph_shortest_paths,
    "oracle": _sssp_sql(),
}
