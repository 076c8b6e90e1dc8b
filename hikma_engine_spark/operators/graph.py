"""Distributed graph algorithms over (src, dst) edge DataFrames.

- connected_components: iterative min-label propagation to fixpoint
  (the scale generalization of the reference's driver-side DFS/BFS:
  computeTransitiveDepth src/modules/ast-parser.ts:440-449 and
  findCallChain src/utils/in-memory-graph.ts:236-266). No GraphFrames
  dependency; lineage cut per iteration with localCheckpoint.
- k_hop / neighbors: join-based traversal (SURVEY.md §3.3 mapping).

Skew note: hot labels (giant components) funnel through groupBy(min)
— Spark's map-side partial aggregation absorbs the hot key (each task
emits one partial min per label), so no explicit salting is needed for
min(); AQE handles residual join skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_local(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find (path compression); component = min member."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach larger-string root under smaller → min-label result
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Undirected CC. Returns (node, component) with component = min node
    id (lexicographic) in the component. Deterministic.

    Two physical strategies, same result:
    - ≤ ``driver_threshold`` edges: collect + union-find on the driver
      (an iterative join loop on a dozen-row graph is pure scheduler
      overhead). This covers per-corpus entity-alias graphs comfortably.
    - larger: distributed iterative min-label propagation with lineage
      cut per round — the 100 TB path (hot entities are absorbed by
      map-side partial min aggregation).
    """
    spark = edges.sparkSession
    small = edges.limit(driver_threshold + 1).count() <= driver_threshold
    if small:
        pairs = [
            (r[0], r[1])
            for r in edges.select(src, dst).collect()
            if r[0] is not None and r[1] is not None and r[0] != r[1]
        ]
        mapping = _union_find_local(pairs)
        if not mapping:
            return spark.createDataFrame([], "node string, component string")
        return spark.createDataFrame(
            sorted(mapping.items()), ["node", "component"]
        )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # size the iteration's shuffle width to the data: tiny graphs on a
    # 32-way shuffle are pure task overhead; big graphs keep full width
    n_edges = sym.count()
    default_par = spark.sparkContext.defaultParallelism
    npart = max(1, min(default_par, n_edges // 20_000 + 1))
    sym = sym.repartition(npart, "v")
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition(npart, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels.node == neigh.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def neighbors(
    edges: DataFrame, node_ids: DataFrame | list[str], direction: str = "out",
    edge_type: str | None = None,
) -> DataFrame:
    """1-hop traversal (reference: getFunctionCalls/getFunctionCallers,
    src/utils/in-memory-graph.ts:210-231)."""
    spark = edges.sparkSession
    if isinstance(node_ids, list):
        node_ids = spark.createDataFrame([(n,) for n in node_ids], ["id"])
    e = edges if edge_type is None else edges.filter(F.col("edge_type") == edge_type)
    key, out = ("src", "dst") if direction == "out" else ("dst", "src")
    return (
        e.join(F.broadcast(node_ids), e[key] == node_ids.id)
        .select(F.col(key).alias("from"), F.col(out).alias("to"), "edge_type")
    )


def k_hop(
    edges: DataFrame, start_ids: list[str], k: int = 3, edge_type: str | None = None
) -> DataFrame:
    """BFS to depth k with a visited-set anti-join per round (reference:
    findCallChain BFS with maxDepth, src/utils/in-memory-graph.ts:236-266).
    Returns (id, depth) of reached nodes."""
    spark = edges.sparkSession
    e = edges if edge_type is None else edges.filter(F.col("edge_type") == edge_type)
    e = e.select("src", "dst")
    frontier = spark.createDataFrame([(n, 0) for n in start_ids], ["id", "depth"])
    visited = frontier
    for depth in range(1, k + 1):
        nxt = (
            e.join(frontier.hint("broadcast"), e.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
