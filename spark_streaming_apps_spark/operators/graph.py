"""Graph analytics over the relational fixtures, DataFrame-native.

Complements `dedup.dedup_clusters` (connected components by min-label
propagation) with weighted PageRank — the importance measure a corpus
pipeline uses for domain/source ranking. No graph library: the graph IS a
DataFrame of weighted edges, an iteration IS a join + aggregate, which is
exactly how it scales (each iteration shuffles on dst — 25 nation nodes
here, but the same plan is the textbook one at a billion edges; ranks are
broadcast when small).

Graph: trade flow between nations — an edge (customer nation → supplier
nation) per lineitem, weighted by occurrence count
(customer ⋈ orders ⋈ lineitem ⋈ supplier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_DAMPING = 0.85
PR_ITERS = 3


def _edges(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
           supplier: DataFrame) -> DataFrame:
    """Weighted nation→nation edges. Dimension joins broadcast."""
    return (lineitem.select("l_orderkey", "l_suppkey")
            .join(orders.select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy(F.col("c_nationkey").alias("src"),
                     F.col("s_nationkey").alias("dst"))
            .agg(F.count(F.lit(1)).alias("w")))


def pagerank_nations(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """Weighted PageRank, PR_ITERS fixed iterations from the uniform
    start — fixed depth keeps it oracle-checkable (the DuckDB twin unrolls
    the same iterations as CTEs). Dangling mass is handled by the
    (1-d)/N teleport only, matching the oracle exactly; ranks rounded to
    6 dp at the end."""
    from .dedup import _memo, _materialize
    raw = _edges(customer, orders, lineitem, supplier)
    edges = _memo(raw, "pagerank_edges", lambda: _materialize(raw))
    nodes = _memo(raw, "pagerank_nodes", lambda: _materialize(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()))
    n = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    norm = _memo(raw, "pagerank_norm", lambda: _materialize(
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (norm.join(F.broadcast(ranks),
                             norm.src == ranks.node)
                   .groupBy("dst").agg(F.sum(F.col("p") * F.col("r")).alias("inflow")))
        ranks = (nodes.join(contrib, nodes.node == contrib.dst, "left")
                 .select("node",
                         (F.lit((1 - PR_DAMPING) / n)
                          + PR_DAMPING * F.coalesce("inflow", F.lit(0.0))).alias("r")))
    return ranks.select("node", F.round("r", 6).alias("rank"))


def pagerank_oracle_sql() -> str:
    its = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        its.append(f"""
r{i} AS (
  SELECT n.node,
         (1 - {PR_DAMPING}) / (SELECT cnt FROM nn)
         + {PR_DAMPING} * COALESCE(SUM(p.p * pr.r), 0) AS r
  FROM nodes n
  LEFT JOIN norm p ON p.dst = n.node
  LEFT JOIN {prev} pr ON pr.node = p.src
  GROUP BY n.node)""")
        prev = f"r{i}"
    chain = ",".join(its)
    return f"""
WITH edges AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY 1, 2),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
nn AS (SELECT COUNT(*) AS cnt FROM nodes),
outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
norm AS (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.outw AS p
         FROM edges e JOIN outw o ON e.src = o.src),
r0 AS (SELECT node, 1.0 / (SELECT cnt FROM nn) AS r FROM nodes),{chain}
SELECT node, round(r, 6) AS rank FROM {prev}
"""


# ----------------------------------------------------------- triangle count

def triangle_count(embeddings: DataFrame) -> DataFrame:
    """Triangles of the mutual k-NN graph — the structural-density probe a
    semantic-curation pipeline runs over its neighbor graph (triangle-rich
    regions = tight semantic clusters; reference has no graph ops — this is
    engine-beyond-reference, like `pagerank_nations`).

    Edge set: undirected (a < b) pairs where BOTH directed top-{KNN_K}
    edges exist in `similarity.knn_graph` (mutual-kNN, the symmetric
    neighbor graph SemDeDup-style pipelines consume). Enumeration is the
    textbook oriented-join: every edge is stored once as (a < b), and a
    triangle {a<b<c} is counted exactly once by
    e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c).

    100-TB shape: the k-NN graph bounds every vertex degree by k, so the
    edge relation is O(n·k), each join key (a vertex id) matches ≤ k rows
    per side, and the oriented join can NEVER go quadratic — the skew
    hazard of triangle counting on power-law graphs is structurally absent
    here. All three joins are keyed equi-joins (shuffle or AQE-broadcast);
    no cartesian anywhere.
    """
    from .dedup import _materialize, _memo
    from .similarity import knn_graph

    def build_edges() -> DataFrame:
        g = knn_graph(embeddings).select("vec_id", "nbr_id")
        rev = g.select(F.col("nbr_id").alias("vec_id"),
                       F.col("vec_id").alias("nbr_id"))
        # mutual + oriented: keep each undirected edge once, as (a < b)
        return _materialize(
            g.join(rev, ["vec_id", "nbr_id"])
            .filter(F.col("vec_id") < F.col("nbr_id"))
            .select(F.col("vec_id").alias("a"), F.col("nbr_id").alias("b")))

    # materialized + memoized: the triangle join references the edge set
    # three times — without the barrier each alias replays the whole
    # knn candidate/fetch/window pipeline (plan audit: 23 exchanges -> 5)
    edges = _memo(embeddings, "mutual_knn_edges", build_edges)
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    return (e1.join(e2, "b")
            .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
            .select("a", "b", "c"))


def triangle_count_oracle_sql() -> str:
    from .similarity import knn_graph_oracle_sql
    knn = knn_graph_oracle_sql().strip().rstrip()
    return f"""
WITH knn AS ({knn}),
g AS (SELECT vec_id, nbr_id FROM knn),
edges AS (SELECT a.vec_id AS a, a.nbr_id AS b
          FROM g a JOIN g r ON a.vec_id = r.nbr_id AND a.nbr_id = r.vec_id
          WHERE a.vec_id < a.nbr_id)
SELECT e1.a, e1.b, e2.b AS c
FROM edges e1
JOIN edges e2 ON e1.b = e2.a
JOIN edges e3 ON e1.a = e3.a AND e2.b = e3.b
"""


BFS_SOURCE = 0
BFS_MAX_HOPS = 4


def bfs_hops(embeddings: DataFrame, source: int = BFS_SOURCE,
             max_hops: int = BFS_MAX_HOPS) -> DataFrame:
    """BFS hop distance from a source over the mutual k-NN graph —
    shortest paths as iterated frontier joins (the semantic-neighborhood
    expansion a curation pipeline runs from a seed document: everything
    within h hops of a flagged item). Per hop: ONE keyed join of the
    current frontier against the edge list plus an anti-join against the
    visited set — no vertex is ever re-expanded, so total work is
    O(edges within the horizon), and k-bounded degree (the knn graph)
    caps each frontier's growth at frontier·k. The driver loop holds
    only hop COUNTERS (bounded by max_hops), never vertex data.

    Output: (vec_id, hops) for every vertex within {BFS_MAX_HOPS} hops,
    hops = the MINIMUM path length (BFS invariant — first touch wins).
    Oracle: DuckDB recursive CTE taking min(hops) per reachable node."""
    from .dedup import _materialize, _memo
    from .similarity import knn_graph

    def build_edges() -> DataFrame:
        g = knn_graph(embeddings).select("vec_id", "nbr_id")
        rev = g.select(F.col("nbr_id").alias("vec_id"),
                       F.col("vec_id").alias("nbr_id"))
        # mutual, kept DIRECTED both ways (BFS expands along either)
        return _materialize(
            g.join(rev, ["vec_id", "nbr_id"])
            .select(F.col("vec_id").alias("src"),
                    F.col("nbr_id").alias("dst")))

    edges = _memo(embeddings, "mutual_knn_directed", build_edges)
    spark = embeddings.sparkSession
    # Iterative frontier expansion REQUIRES lineage truncation, not just
    # caching: each hop's plan references the previous hop's, so with
    # lazy persist the logical plan doubles per hop and evaluation cost
    # grows exponentially (measured: 110 s for 4 hops via persist,
    # 12 s with eager localCheckpoint — flat per-hop cost). This is the
    # standard iterative-graph trade-off (GraphX checkpoints the same
    # way): an executor loss re-runs from the last checkpoint instead of
    # the full lineage; on a cluster, point `spark.sparkContext.
    # setCheckpointDir` at reliable storage and use checkpoint() for the
    # fault-tolerant variant. The edge list itself stays a lineage-
    # keeping persist (recomputable from the parquet scan).
    visited = spark.createDataFrame(
        [(source, 0)], "vec_id long, hops int").localCheckpoint(eager=True)
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(edges,
                             frontier.vec_id == edges.src)
               .select(F.col("dst").alias("vec_id")).distinct()
               .join(visited, "vec_id", "left_anti")
               .select("vec_id", F.lit(h).alias("hops"))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bfs_hops_oracle_sql(source: int = BFS_SOURCE,
                        max_hops: int = BFS_MAX_HOPS) -> str:
    from .similarity import knn_graph_oracle_sql
    knn = knn_graph_oracle_sql().strip()
    return f"""
WITH RECURSIVE knn AS MATERIALIZED ({knn}),
g AS (SELECT vec_id, nbr_id FROM knn),
edges AS (SELECT a.vec_id AS src, a.nbr_id AS dst
          FROM g a JOIN g r ON a.vec_id = r.nbr_id
                           AND a.nbr_id = r.vec_id),
walk(vec_id, hops) AS (
  SELECT CAST({source} AS BIGINT), 0
  UNION
  SELECT e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.vec_id
  WHERE w.hops < {max_hops})
SELECT vec_id, CAST(min(hops) AS INT) AS hops
FROM walk GROUP BY vec_id
"""
