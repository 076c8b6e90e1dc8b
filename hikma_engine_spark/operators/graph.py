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


def _keyed_checkpoint(df: DataFrame, key: str) -> DataFrame:
    """Materialize an iteration-invariant adjacency pre-partitioned by
    its per-round join key (round-6 opt., the pagerank repartition
    idiom generalized): rounds then re-shuffle only the O(V) state
    dim, never the O(E) adjacency. The repartition deliberately gives
    NO explicit partition count, so AQE sizes it from the actual
    shuffle bytes (coalescePartitions with parallelismFirst): a tiny
    graph collapses to one partition — a fixed cores-wide split
    measured SLOWER than the shuffle it saved on 10k-edge kNN graphs
    (32 task launches per stage per round) — while a large one fans
    out across the cores. One shuffle, one materialization, no count
    probe."""
    return df.repartition(F.col(key)).localCheckpoint(eager=True)


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


class ConvergenceError(RuntimeError):
    """Distributed CC exhausted its round budget without reaching the
    fixpoint — raising beats silently returning split components."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Undirected CC. Returns (node, component) with component = min node
    id (lexicographic) in the component. Deterministic.

    Two physical strategies, same result:
    - ≤ ``driver_threshold`` edges: collect + union-find on the driver
      (an iterative join loop on a dozen-row graph is pure scheduler
      overhead). This covers per-corpus entity-alias graphs comfortably.
    - larger: alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et
      al., "Connected Components in MapReduce and Beyond", SoCC'14) —
      convergence is logarithmic in component size, unlike plain
      min-label propagation whose round count is the graph DIAMETER
      (a 10⁶-node chain would silently split under any fixed budget).
      Hot nodes are absorbed by map-side partial min aggregation;
      lineage cut per round with localCheckpoint.

    Raises ConvergenceError if the fixpoint is not reached in
    ``max_iter`` rounds (per round-1 advice: never return split
    components silently).
    """
    spark = edges.sparkSession
    small = (
        driver_threshold > 0
        and edges.limit(driver_threshold + 1).count() <= driver_threshold
    )
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
    # undirected edge set, one row per unordered pair
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # size the iteration's shuffle width to the data: tiny graphs on a
    # 32-way shuffle are pure task overhead; big graphs keep full width
    n_edges = e.count()
    default_par = spark.sparkContext.defaultParallelism
    npart = max(1, min(default_par, n_edges // 20_000 + 1))

    for _ in range(max_iter):
        # LARGE-STAR: for every node u, attach u's strictly-larger
        # neighbors to m(u) = min(N(u) ∪ {u})
        adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m_large = adj.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        large = (
            adj.join(m_large, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("child"), F.col("m").alias("parent"))
            .filter(F.col("child") != F.col("parent"))
            .distinct()
        )
        # SMALL-STAR: each child's parents all re-attach to the minimum
        # parent (large-star output is already child > parent directed)
        m_small = large.groupBy("child").agg(F.min("parent").alias("m"))
        joined = large.join(m_small, "child")
        new_e = (
            joined.select(F.col("child").alias("a"), F.col("m").alias("b"))
            .unionByName(
                joined.select(F.col("parent").alias("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            # restore the unordered-pair invariant a < b
            .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            .distinct()
            .repartition(npart, "a")
            .localCheckpoint(eager=True)
        )
        # fixpoint: the edge set is stable (counts first — cheap — then
        # an exact symmetric-difference probe; same-size sets need only
        # one direction of exceptAll)
        new_cnt = new_e.count()
        stable = (
            new_cnt == n_edges and new_e.exceptAll(e).limit(1).count() == 0
        )
        e = new_e
        n_edges = new_cnt
        if stable:
            # converged e is a star set under the a < b invariant:
            # a = root (component minimum), b = child
            labels = e.select(
                F.col("b").alias("node"), F.col("a").alias("component")
            ).unionByName(
                e.select(F.col("a").alias("node"), F.col("a").alias("component"))
            )
            # a node can transiently be both a root and a child of the
            # true root; groupBy-min resolves to the component minimum
            return labels.groupBy("node").agg(F.min("component").alias("component"))
    raise ConvergenceError(
        f"connected_components did not converge in {max_iter} "
        "large-star/small-star rounds"
    )


def incremental_connected_components(
    comp_map: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **cc_kwargs,
) -> DataFrame:
    """Incremental CC: merge a PERSISTED canonical map with a batch of
    new edges — the daily-ingest path of entity canonicalization. A
    10^12-edge historical graph is canonicalized ONCE; each new batch
    must not re-run CC over it (the same economics as
    ``dedup.dedup_index``: the corpus is never re-read, only its
    index/map rows).

    ``comp_map``: (node, component) with component = MIN member id —
    exactly ``connected_components``' output convention, which is what
    makes contraction LOSSLESS: every old component is internally
    connected, so it collapses to its component id (itself a member
    node, the min); the merged component's new label = min over member
    nodes = min over (old component ids ∪ unmapped new node ids) =
    what CC over the contracted graph returns. No approximation, no
    second pass.

    Cost: two broadcast-able (or map-side, if the map is bucketed by
    node) equi-joins to rewrite the batch onto component ids, then CC
    over the CONTRACTED graph — O(|batch|) edges plus one node per
    touched old component — and one join to re-point old members.
    Returns the updated (node, component) covering old ∪ new nodes.
    Equality with a from-scratch CC over (old ∪ new) edges is pinned
    by ``test_operators.test_incremental_cc_equals_full`` and by the
    ``g_cc_incremental`` oracle entry (the twin closes over ALL
    edges).
    """
    e = new_edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    cm_s = comp_map.select(F.col("node").alias("s"), F.col("component").alias("cs"))
    cm_d = comp_map.select(F.col("node").alias("d"), F.col("component").alias("cd"))
    contracted = (
        e.join(cm_s, "s", "left")
        .join(cm_d, "d", "left")
        .select(
            F.coalesce("cs", F.col("s")).alias("src"),
            F.coalesce("cd", F.col("d")).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    delta = connected_components(contracted, **cc_kwargs)
    repoint = delta.select(
        F.col("node").alias("component"), F.col("component").alias("newc")
    )
    old_updated = comp_map.join(repoint, "component", "left").select(
        "node", F.coalesce("newc", F.col("component")).alias("component")
    )
    # contracted-graph nodes are old component ids (present in the map:
    # the min member maps to itself) or brand-new nodes — the anti-join
    # keeps exactly the latter
    new_nodes = delta.join(comp_map.select("node"), "node", "left_anti")
    return old_updated.unionByName(new_nodes)


def _transitive_depth_driver(pairs: list[tuple[str, str]]) -> dict:
    """Driver-side twin: memoized DFS longest path (same spec)."""
    out_edges: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for s, t in pairs:
        out_edges.setdefault(s, []).append(t)
        nodes.add(s)
        nodes.add(t)
    memo: dict[str, int] = {}
    on_stack: set[str] = set()

    def depth(n: str) -> int:
        if n in memo:
            return memo[n]
        if n in on_stack:
            raise ConvergenceError(
                "transitive_depth: cycle detected — longest-path depth "
                "is only defined on a DAG"
            )
        on_stack.add(n)
        d = 0
        for m in out_edges.get(n, ()):  # noqa: B007
            d = max(d, depth(m) + 1)
        on_stack.discard(n)
        memo[n] = d
        return d

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, len(nodes) + 1000))
    try:
        return {n: depth(n) for n in sorted(nodes)}
    finally:
        sys.setrecursionlimit(old_limit)


def transitive_depth(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Per-node longest-path depth over a DAG of dependency edges
    (``src`` DEPENDS_ON ``dst``): depth(n) = 0 for sinks, else
    1 + max(depth(m) for each edge n → m). Returns (node, depth).

    Reference analog: ``computeTransitiveDepth``
    (src/modules/ast-parser.ts:440-449) — a driver-side DFS there;
    here one equi-join + groupBy-max relaxation round per depth level,
    lineage cut with localCheckpoint. Round count equals the longest
    path length — dependency graphs are shallow (package/module DAGs
    rarely exceed depth ~20); a 10⁶-deep chain would want pointer
    doubling instead, which this deliberately does not implement.

    Raises ConvergenceError after ``max_iter`` rounds: a cycle makes
    longest-path depth undefined, and raising beats silently reporting
    a truncated depth (same policy as connected_components).

    Two physical strategies, same result (same split as
    connected_components): ≤ ``driver_threshold`` edges → driver-side
    memoized DFS (an iterative job loop over a dozen-row dependency
    graph is pure scheduler overhead — measured 14 s for 10 nodes);
    above it → the distributed relaxation. Equality of the two paths
    is pinned by pytest (test_transitive_depth_distributed_equals_driver).
    """
    spark = edges.sparkSession
    small = (
        driver_threshold > 0
        and edges.limit(driver_threshold + 1).count() <= driver_threshold
    )
    if small:
        pairs = [
            (r[0], r[1])
            for r in edges.select(src, dst).collect()
            if r[0] is not None and r[1] is not None and r[0] != r[1]
        ]
        mapping = _transitive_depth_driver(pairs)
        if not mapping:
            return spark.createDataFrame([], "node string, depth int")
        return spark.createDataFrame(
            sorted(mapping.items()), ["node", "depth"]
        ).select("node", F.col("depth").cast("int").alias("depth"))
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .filter(F.col("s").isNotNull() & F.col("t").isNotNull())
        .filter(F.col("s") != F.col("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("t").alias("node")))
        .distinct()
    )
    depth = nodes.withColumn("depth", F.lit(0)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        cand = (
            e.join(depth, e["t"] == depth["node"])
            .select(F.col("s"), (F.col("depth") + 1).alias("d1"))
            .groupBy("s")
            .agg(F.max("d1").alias("cand"))
        )
        new_depth = (
            depth.join(cand, depth["node"] == cand["s"], "left")
            .select(
                "node",
                F.greatest(
                    F.col("depth"), F.coalesce(F.col("cand"), F.lit(0))
                ).alias("depth"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_depth.join(depth, ["node", "depth"], "left_anti").limit(1).count()
        )
        depth = new_depth
        if changed == 0:
            return depth
    raise ConvergenceError(
        f"transitive_depth did not converge in {max_iter} rounds — "
        "the edge set likely contains a cycle (longest-path depth is "
        "only defined on a DAG)"
    )


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


def _pagerank_driver(
    edge_list: list[tuple[str, str]], damping: float, n_iter: int
) -> list[tuple[str, float]]:
    """Driver twin: the identical recurrence on a collected edge list
    (numpy float64, contribs accumulated in sorted-edge order so the
    result is deterministic). Bounded by ``driver_threshold``."""
    import numpy as np

    edge_list = sorted(edge_list)  # accumulate in a fixed order
    ids = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {u: i for i, u in enumerate(ids)}
    n = len(ids)
    srcs = np.fromiter((idx[u] for u, _ in edge_list), dtype=np.int64)
    dsts = np.fromiter((idx[v] for _, v in edge_list), dtype=np.int64)
    deg = np.bincount(srcs, minlength=n).astype(np.float64)
    dangling = deg == 0
    deg[dangling] = 1.0  # self-loop treatment: dangling keeps own mass
    ranks = np.full(n, 1.0 / n)
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dsts, ranks[srcs] / deg[srcs])
        contrib[dangling] += ranks[dangling]
        ranks = teleport + damping * contrib
    return [(u, float(ranks[idx[u]])) for u in ids]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Fixed-iteration PageRank power method over a directed edge list.
    Returns (node, rank) for every node incident to an edge.

    FIXED iteration count, not an epsilon stop: the result is a pure
    function of (edges, damping, n_iter), so an independent engine
    replaying the same recurrence agrees to rounding — that is what
    makes the operator oracle-checkable, and what makes a resumed run
    reproducible (north-rule determinism, same reason the id minting
    bans UUIDs). Dangling nodes get the SELF-LOOP treatment (they keep
    their own damped mass) — it needs no global mass total, so an
    iteration is pure join+aggregate with nothing on the driver.

    Two physical strategies, same recurrence (pinned equal to 1e-12 by
    ``test_operators.test_pagerank_driver_equals_distributed``):
    - ≤ ``driver_threshold`` edges: collected numpy power iteration —
      a 10-node co-mention graph costs ~20 scheduler round-trips as a
      join loop and ~1 ms as vector math (the same economics as
      ``connected_components``' union-find twin; the collect is
      BOUNDED by the threshold probe).
    - larger: per iteration one join (edge × rank, co-partitioned on
      src) + one groupBy(dst) — 2 shuffles, both map-side-combinable;
      hot destinations absorbed by partial aggregation (sum is
      algebraic); lineage cut every 3 rounds (single-reference chain,
      no double-evaluation in between).
    """
    # materialize the deduped edge list ONCE — every branch below needs
    # it at least twice (threshold probe + collect, or degree + rounds)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = e.sparkSession
    small = (
        driver_threshold > 0
        and e.limit(driver_threshold + 1).count() <= driver_threshold
    )
    if small:
        pairs = [(r[0], r[1]) for r in e.collect()]
        if not pairs:
            return spark.createDataFrame([], "node string, rank double")
        return spark.createDataFrame(
            _pagerank_driver(pairs, damping, n_iter), ["node", "rank"]
        )
    default_par = spark.sparkContext.defaultParallelism
    n_edges = e.count()
    npart = max(1, min(default_par, n_edges // 20_000 + 1))
    e = e.repartition(npart, "src").localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # self-loop treatment materialized: dangling nodes (no out-edge)
    # get an explicit self-edge, after which every node has deg >= 1
    # and the recurrence is closed over the edge list alone
    dangling = nodes.join(
        e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    )
    e_closed = e.unionByName(
        dangling.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    ).localCheckpoint(eager=True)
    outdeg = e_closed.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for i in range(n_iter):
        contribs = (
            e_closed.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 3 == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def _ppr_driver(
    edge_list: list[tuple[str, str]], seed: str, alpha: float, n_iter: int
) -> list[tuple[str, float]]:
    """Driver twin of ``personalized_pagerank`` (same recurrence on a
    collected edge list; bounded by ``driver_threshold``)."""
    import numpy as np

    edge_list = sorted(edge_list)
    ids = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {u: i for i, u in enumerate(ids)}
    n = len(ids)
    srcs = np.fromiter((idx[u] for u, _ in edge_list), dtype=np.int64)
    dsts = np.fromiter((idx[v] for _, v in edge_list), dtype=np.int64)
    deg = np.bincount(srcs, minlength=n).astype(np.float64)
    dangling = deg == 0
    deg[dangling] = 1.0
    e_seed = np.zeros(n)
    if seed in idx:
        e_seed[idx[seed]] = 1.0
    ranks = e_seed.copy()
    for _ in range(n_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dsts, ranks[srcs] / deg[srcs])
        contrib[dangling] += ranks[dangling]
        ranks = alpha * e_seed + (1.0 - alpha) * contrib
    return [(u, float(ranks[idx[u]])) for u in ids]


def personalized_pagerank(
    edges: DataFrame,
    seed: str,
    src: str = "src",
    dst: str = "dst",
    alpha: float = 0.15,
    n_iter: int = 6,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Random-walk-with-restart proximity to ONE seed node — the
    "related entities" query a knowledge graph serves interactively
    (reference analog: the graph-traversal search tier,
    src/api/services/search-service.ts — structural relatedness around
    a focus node; here scored by stationary visit probability instead
    of hop count). Returns (node, score) for every node incident to an
    edge; mass concentrates near the seed, so the top-k IS the
    related-entity answer.

    Recurrence (fixed iterations, oracle-replayable like ``pagerank``):
        r_0      = e_seed
        r_{i+1}  = alpha * e_seed + (1 - alpha) * P^T r_i
    with the same dangling self-loop closure as ``pagerank`` (a node
    with no out-edge keeps its damped mass). Fixed n_iter keeps the
    result a pure function of (edges, seed, alpha, n_iter).

    Scale shape: identical to ``pagerank`` — per iteration one
    co-partitioned join (edge x rank) + one map-side-combinable
    groupBy(dst); the rank vector is as sparse as the walk frontier in
    early iterations but the plan is the same either way. Driver twin
    below ``driver_threshold`` edges (bounded-probe economics, pinned
    equal to the distributed path by
    ``test_operators.test_ppr_driver_equals_distributed``).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = e.sparkSession
    small = (
        driver_threshold > 0
        and e.limit(driver_threshold + 1).count() <= driver_threshold
    )
    if small:
        pairs = [(r[0], r[1]) for r in e.collect()]
        if not pairs:
            return spark.createDataFrame([], "node string, score double")
        return spark.createDataFrame(
            _ppr_driver(pairs, seed, alpha, n_iter), ["node", "score"]
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dangling = nodes.join(
        e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    )
    e_closed = e.unionByName(
        dangling.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    ).localCheckpoint(eager=True)
    outdeg = e_closed.groupBy("src").agg(F.count("*").alias("deg"))
    seed_ind = F.when(F.col("node") == seed, F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.withColumn("score", seed_ind)
    for i in range(n_iter):
        contribs = (
            e_closed.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("score") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(alpha) * seed_ind
                + F.lit(1.0 - alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("score"),
        )
        if (i + 1) % 3 == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_counts(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph given as
    unique (a < b) edge pairs — the graph-quality metric behind
    clustering coefficients and community sanity checks.

    Scale shape: the classic degree-orientation algorithm. Every edge
    is oriented from its lower-(degree, id) endpoint to the higher one,
    which makes the wedge join's fan-out per node O(sqrt(m)) on ANY
    graph (a node's out-degree in the oriented graph is at most
    ~sqrt(2m)) — the hub that would explode a naive adjacency self-join
    (degree² wedges) becomes the JOINED side, never the wedge pivot.
    Each triangle is counted exactly once (its unique cyclic
    orientation), then credited to all three corners. Three
    shuffles: degree agg, wedge join, closure semi-join + count.
    """
    sym = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).unionByName(edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    # orient u -> v when (deg_u, u) < (deg_v, v): total order, so the
    # oriented graph is acyclic and each triangle has ONE wedge apex
    du = deg.select(F.col("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        sym.join(du, "u")
        .join(dv, "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )
    # wedges: u -> v, u -> w with v < w (apex u has bounded out-degree)
    w1 = oriented.select(F.col("u"), F.col("v"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w"))
    # close the wedge: (v, w) must be an edge. Wedges already carry
    # v < w, and the canonical edge set is a < b, so a plain two-key
    # equi-semi-join closes it (hash join, no expression keys).
    # assume_canonical (round-6 opt.): the docstring contract is
    # already "unique (a < b) pairs" — a caller that guarantees it
    # (the shared edge dims) skips the defensive re-canonicalization
    # (least/greatest are per-row no-ops, the distinct a wide shuffle).
    if assume_canonical:
        canon = edges.select(
            F.col(a_col).alias("v"), F.col(b_col).alias("w")
        )
    else:
        canon = edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("w"),
        ).distinct()
    tri = wedges.join(canon, ["v", "w"], "left_semi")
    # credit each corner
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def k_core(
    edges: DataFrame,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    assume_canonical: bool = False,
) -> DataFrame:
    """Nodes of the k-core — the maximal induced subgraph in which
    every node has degree ≥ k — with their in-core degree. The
    standard corpus-graph density filter (entity cores, spam rings,
    co-occurrence backbones) next to triangle_counts / clustering.

    Iterative distributed peel: each round computes degrees (algebraic
    groupBy — map-side partials absorb hubs), keeps nodes with deg ≥
    k, and induces the surviving edge set via two semi-joins on the
    SAME node key (one shuffle family end-to-end; AQE shrinks the
    width as the graph melts). A round removes the ENTIRE sub-k
    frontier at once, so the round count is the peeling DEPTH of the
    graph, not its node count — single-digit for social/co-occurrence
    topologies (here: 3 rounds at sf0.1); a pathological path graph
    peels O(n) deep, hence the ``max_iter`` guard raising
    ConvergenceError rather than silently returning a non-core
    (round-1 advice: no silent wrong answers). Lineage is cut per
    round with localCheckpoint exactly like connected_components.

    Input: unique undirected (a, b) pairs; self-loops dropped.
    Returns (node, core_deg) for k-core members, core_deg ≥ k.
    """
    # assume_canonical (round-6 opt.): a caller guaranteeing unique
    # a < b pairs (which also excludes self-loops) skips the defensive
    # normalization distinct; everyone else gets the round-5 path.
    if assume_canonical:
        sym = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    else:
        sym = (
            edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
            .filter(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
            )
            .distinct()
        )
    cur = (
        sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(sym.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # persist: the degree table feeds the convergence probe, both
        # induction semi-joins, and (on the final round) the returned
        # result — without it each consumer re-runs the groupBy over
        # the checkpointed edge state (with the one-job probe below:
        # measured sf0.1 steady 7.1 → ~5 s). O(nodes) rows per round,
        # LRU-evicted.
        deg = cur.groupBy("u").agg(F.count("*").alias("core_deg")).persist()
        keep = deg.filter(F.col("core_deg") >= k).select("u")
        # one probe job per round, not two: total and surviving node
        # counts from a single pass over the degree table
        n_nodes, n_keep = deg.agg(
            F.count("*"), F.count_if(F.col("core_deg") >= k)
        ).first()
        if n_keep == n_nodes:
            return deg.orderBy("u")
        if n_keep == 0:
            return deg.sparkSession.createDataFrame(
                [], "u string, core_deg long"
            )
        cur = (
            cur.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise ConvergenceError(
        f"k_core(k={k}) did not converge in {max_iter} rounds"
    )


def deterministic_walks(
    edges: DataFrame,
    length: int,
    a_col: str = "a",
    b_col: str = "b",
    starts: DataFrame | None = None,
) -> DataFrame:
    """DeepWalk-style walk corpus (Perozzi et al. 2014) with a
    DETERMINISTIC walker: from every node, ``length`` steps where step
    t moves to the neighbor minimizing the portable 48-bit md5 hash of
    (current, t, neighbor). The hash plays the RNG (uniform over
    neighbors, step-dependent so walks don't cycle), which makes the
    walk corpus reproducible run-to-run, engine-independent (a SQL
    twin replays it exactly via arg_min over the same hash), and free
    of driver-seeded RNG state — the property a resumable distributed
    pipeline needs anyway (re-running a failed partition must emit the
    SAME walks).

    Scale shape: walker state is one (start, cur) row per walk —
    CONSTANT width whatever ``length`` — and each step is one join on
    the current-node key (the irreducible random-walk access pattern;
    at cluster scale the adjacency side is bucketed on u so only the
    walker side shuffles) followed by an algebraic min_by per walk.
    Steps append to the long-form result (start, step, node); a
    dead-end node yields NULL which propagates, ending the walk.

    ``starts`` (single column ``node``) restricts walk origins — e.g.
    one side of a bipartite graph; default every node.

    Returns (start, step, node), step 0..length, ordered by caller.
    """
    # persist: the adjacency is probed once per step and the step-t
    # union branch would otherwise re-execute the whole step-1..t-1
    # lineage (O(L²) recompute measured: sf0.1 11.1 → 4.8 s). In
    # production the adjacency is a bucketed table read, but the
    # walker states must still be persisted (or checkpointed) to keep
    # the emitted-steps union linear in L.
    # persist, NOT localCheckpoint (round-6 measured): persist keeps
    # catalyst stats visible, so the planner broadcasts the adjacency
    # when it fits (one reused broadcast exchange serves every step —
    # measured 3.9s vs 9.8s with a stats-hiding checkpoint at sf0.1)
    # and falls back to a shuffle join at scale. The walker-state
    # persist below stays regardless.
    sym = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    origins = (
        starts.select(F.col("node").alias("u")) if starts is not None
        else sym.select("u")
    )
    state = origins.distinct().select(
        F.col("u").alias("start"), F.col("u").alias("cur")
    )
    out = state.select("start", F.lit(0).cast("int").alias("step"),
                       F.col("cur").alias("node"))
    for t in range(1, length + 1):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("cur"), F.lit(str(t)), F.col("v"))),
                1, 12,
            ), 16, 10,
        ).cast("long")
        state = (
            state.join(sym, state["cur"] == sym["u"], "left")
            .groupBy("start")
            .agg(F.min_by("v", h).alias("cur"))
            .persist()
        )
        out = out.unionByName(
            state.select(
                "start", F.lit(t).cast("int").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def label_propagation(
    edges: DataFrame,
    rounds: int,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for
    community detection, run for EXACTLY ``rounds`` rounds: every node
    starts labeled with itself; each round every node adopts the most
    frequent label among its neighbors, ties broken by the smaller
    label (the deterministic variant — classic LPA breaks ties
    randomly, which a resumable distributed pipeline cannot afford:
    partition retries must reproduce the same labels).

    Fixed-round semantics are deliberate: synchronous LPA on bipartite
    or near-regular graphs can oscillate forever, so "run to
    convergence" is not well-defined — the operator's contract is the
    label state after R rounds, which IS well-defined, deterministic,
    and exactly replayable by an unrolled SQL twin.

    Scale shape per round: one join of the label table (node → label,
    O(V) rows) against the adjacency on the node key, then two
    algebraic groupBys — count per (node, neighbor label), then the
    winning label per node as a single ``min_by`` over the
    (−count, label) struct (count DESC, label ASC). Both aggregations
    are map-side combinable, so a hot node's neighbor-label counts
    collapse in partials before the shuffle. Lineage cut per round.

    Returns (node, label) after ``rounds`` rounds.
    """
    sym = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    labels = sym.select("u").distinct().select(
        "u", F.col("u").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        neigh = sym.join(
            labels.select(F.col("u").alias("v"), "label"), "v"
        ).select("u", "label")
        counts = neigh.groupBy("u", "label").agg(F.count("*").alias("c"))
        # most-frequent label, ties -> smaller label: min_by over a
        # struct ordered by (-c, label) is a single algebraic agg
        labels = counts.groupBy("u").agg(
            F.min_by("label", F.struct(-F.col("c"), F.col("label"))).alias(
                "label"
            )
        ).localCheckpoint(eager=True)
    return labels.select(F.col("u").alias("node"), "label")


def bounded_sssp(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Multi-source single-source-shortest-paths bounded to ``k``
    relaxation rounds (weighted Bellman-Ford over ≤ k hops) — the
    weighted sibling of transitive_depth's unweighted relaxation and
    the "how far is every node from the seed set" primitive behind
    radius-bounded KG neighborhood pricing. No reference analog
    (the reference's only traversal is unweighted DFS depth,
    src/modules/ast-parser.ts:440-449); target-domain addition.

    Returns (node, dist) for every node reachable from ``sources``
    (a one-column DataFrame named ``node``) within k hops, dist =
    min total weight over all ≤ k-hop paths. Weights must be
    non-negative (asserted on the first pass); ties need no break —
    min is total.

    Scale shape: per round ONE equi-join (frontier × edges, hashed on
    the join key) + ONE groupBy-min — both on the same node key, and
    the join's left side is the FRONTIER ONLY (nodes whose dist
    improved last round), never the full dist table: on expander-ish
    graphs the frontier decays after the wave passes a region, so
    late rounds cost |frontier|·avg-degree, not |V|·avg-degree.
    k is a hard bound — rounds are O(k) scheduler steps, each lineage
    cut with localCheckpoint (the iterative-union recompute trap).
    Early-exits when the frontier empties.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = (
        edges.select(
            F.col(src).alias("es"),
            F.col(dst).alias("et"),
            F.col(weight).cast("long").alias("ew"),
        )
        .filter(
            F.col("es").isNotNull()
            & F.col("et").isNotNull()
            & (F.col("es") != F.col("et"))
        )
        .groupBy("es", "et")
        .agg(F.min("ew").alias("ew"))
        .localCheckpoint(eager=True)
    )
    n_bad = e.filter(F.col("ew") < 0).limit(1).count()
    if n_bad:
        raise ValueError("bounded_sssp requires non-negative weights")
    dist = (
        sources.select(F.col("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(k):
        cand = (
            frontier.join(e, frontier["node"] == e["es"])
            .select(F.col("et").alias("node"), (F.col("dist") + F.col("ew")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(2**62)),
                    F.coalesce(F.col("nd"), F.lit(2**62)),
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        # frontier = nodes whose dist changed this round (new or improved)
        frontier = merged.join(dist, ["node", "dist"], "left_anti").localCheckpoint(
            eager=True
        )
        dist = merged
        if frontier.limit(1).count() == 0:
            break
    return dist


def negative_edge_samples(
    edges: DataFrame,
    n_items: int,
    k: int = 5,
    n_candidates: int = 4,
    seed: str = "neg",
    u_col: str = "u",
    v_col: str = "v",
    valid_items: DataFrame | None = None,
) -> DataFrame:
    """Deterministic NEGATIVE edge sampling for link-prediction /
    KG-embedding training: for every positive edge (u, v) mint
    ``n_candidates`` pseudo-random items h(u,v,j) mod ``n_items``,
    drop collisions with the positive set, and keep the top-``k``
    negatives per u in seeded-hash order. Same-seed re-runs are
    byte-identical (the export family's determinism contract — no
    rand(), so a resumed job never re-draws). No reference analog;
    target-domain addition next to g_link_predict's positive scorer.

    Caller maps items to a dense [0, n_items) id space first (the
    modulus must cover real ids); ``valid_items`` (one column named
    ``v_col``) optionally broadcast-semi-joins candidates to the real
    item dim when the space has holes.

    Scale shape: candidate minting is a narrow generate (explode of a
    j-array literal — rows out = n_candidates × |E|, no shuffle);
    the positive-collision drop is ONE anti-join on (u, item); the
    per-u top-k window is bounded by n_candidates·deg(u) candidate
    rows per u — skew inherits the positive degree distribution, so
    cap the input degree the same way g_link_predict does if u is
    hot. Ranking key is md5 of the FINAL pair (recomputed after
    distinct), so dedup order can't leak.
    """
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    cand = (
        e.select(
            "u",
            "v",
            F.explode(F.array(*[F.lit(j) for j in range(n_candidates)])).alias("j"),
        )
        .select(
            "u",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(seed),
                            F.col("u").cast("string"),
                            F.col("v").cast("string"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .select("u", (F.col("h") % n_items).alias("neg_v"))
        .distinct()
    )
    if valid_items is not None:
        cand = cand.join(
            F.broadcast(valid_items.select(F.col(v_col).alias("neg_v")).distinct()),
            "neg_v",
        )
    clean = cand.join(
        e.select("u", F.col("v").alias("neg_v")), ["u", "neg_v"], "left_anti"
    )
    rank_key = F.md5(
        F.concat_ws(
            ":",
            F.lit(seed),
            F.lit("rank"),
            F.col("u").cast("string"),
            F.col("neg_v").cast("string"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("u").orderBy(rank_key, F.col("neg_v"))
    return (
        clean.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("u").alias(u_col),
            F.col("neg_v").alias(f"neg_{v_col}"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def neighborhood_function(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    lg_config_k: int = 12,
) -> DataFrame:
    """HyperBall (Boldi/Vigna) — per-node ≤ k-hop neighborhood SIZE via
    iterated HLL-sketch unions: b₀(v) = sketch{v};
    b_{t+1}(v) = b_t(v) ∪ ⋃_{(v,w)∈E} b_t(w). Returns
    (node, reach_est) where reach_est = round(estimate(b_k)) INCLUDING
    the node itself. The neighborhood function / effective-diameter
    estimator used on billion-edge graphs, where the exact frontier
    set per node is O(reach) state and dies at scale — the HLL
    register array is O(2^lgK) bytes per node REGARDLESS of reach,
    and union is associative+idempotent so re-delivered edges (task
    retries) cannot inflate it. No reference analog; target-domain
    addition beside the mergeable-sketch family (HLL distinct / GK /
    count-min / KMV).

    Scale shape: per round ONE equi-join keyed on the edge source
    (sketches ride to their in-neighbors) + ONE hll_union_agg groupBy
    + a full-outer merge with the previous ball — all DataSketches
    JVM aggregates, no Python; lineage cut per round; round count is
    the hard bound k (for diameter work k grows to ~log(diameter),
    still scheduler-bounded).

    At small cardinalities (≪ 2^lgK) the DataSketches HLL runs in
    exact sparse mode, so estimates equal exact reach — callers
    asserting error contracts should size test graphs accordingly.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = (
        edges.select(F.col(src).alias("es"), F.col(dst).alias("et"))
        .filter(F.col("es").isNotNull() & F.col("et").isNotNull())
        .filter(F.col("es") != F.col("et"))
        .distinct()
    )
    # every round joins e on "et"
    e = _keyed_checkpoint(e, "et")
    nodes = (
        e.select(F.col("es").alias("node"))
        .unionByName(e.select(F.col("et").alias("node")))
        .distinct()
    )
    ball = nodes.groupBy("node").agg(
        F.hll_sketch_agg(F.col("node").cast("string"), F.lit(lg_config_k)).alias("b")
    ).localCheckpoint(eager=True)
    for _ in range(k):
        recv = (
            e.join(ball, e["et"] == ball["node"])
            .select(F.col("es").alias("node"), "b")
            .groupBy("node")
            .agg(F.hll_union_agg("b").alias("nb"))
        )
        ball = (
            ball.join(recv, "node", "left")
            .select(
                "node",
                F.when(
                    F.col("nb").isNull(), F.col("b")
                ).otherwise(F.hll_union("b", "nb")).alias("b"),
            )
            .localCheckpoint(eager=True)
        )
    return ball.select(
        "node", F.round(F.hll_sketch_estimate("b")).cast("long").alias("reach_est")
    )


def temporal_reachability(
    edges: DataFrame,
    sources: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    time: str = "t",
) -> DataFrame:
    """Time-RESPECTING reachability (contact-network / provenance
    semantics): a path may only traverse edges whose timestamps are
    non-decreasing along the path, and each hop departs no earlier
    than it arrived. Returns (node, arrival) = the EARLIEST time
    information seeded at ``sources`` (rows (node, t0) — available
    from t0) can reach each node within ≤ k hops. This is a different
    algebra from bounded_sssp's min-weight: the relaxation value is
    the edge's own timestamp, and usability is the predicate
    edge.t ≥ arrival(u) — a static shortest path through a temporal
    graph gives WRONG answers (it happily walks backwards in time).
    No reference analog; target-domain addition (who could have seen
    X / taint propagation over transcripts and event streams).

    Earlier arrival is monotonically at least as good (t ≥ arrival
    is a superset predicate), so frontier-pruned min-relaxation
    converges exactly like Bellman-Ford: per round ONE frontier ×
    edges equi-join (+ the time predicate as a residual filter) and
    ONE groupBy-min, lineage cut per round, early exit on empty
    frontier. Edge times are caller-provided integers (micros) —
    no timestamp arithmetic inside the loop.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = (
        edges.select(
            F.col(src).alias("es"),
            F.col(dst).alias("et"),
            F.col(time).cast("long").alias("tt"),
        )
        .filter(
            F.col("es").isNotNull()
            & F.col("et").isNotNull()
            & F.col("tt").isNotNull()
            & (F.col("es") != F.col("et"))
        )
        .groupBy("es", "et", "tt")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    # every relaxation round joins e on "es"
    e = _keyed_checkpoint(e, "es")
    arr = (
        sources.select("node", F.col("t0").cast("long").alias("arrival"))
        .groupBy("node")
        .agg(F.min("arrival").alias("arrival"))
        .localCheckpoint(eager=True)
    )
    frontier = arr
    for _ in range(k):
        cand = (
            frontier.join(e, frontier["node"] == e["es"])
            .filter(F.col("tt") >= F.col("arrival"))
            .select(F.col("et").alias("node"), F.col("tt").alias("na"))
            .groupBy("node")
            .agg(F.min("na").alias("na"))
        )
        merged = (
            arr.join(cand, "node", "full")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("arrival"), F.lit(2**62)),
                    F.coalesce(F.col("na"), F.lit(2**62)),
                ).alias("arrival"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = merged.join(arr, ["node", "arrival"], "left_anti").localCheckpoint(
            eager=True
        )
        arr = merged
        if frontier.limit(1).count() == 0:
            break
    return arr


def functional_scc(
    ptr: DataFrame, node: str = "node", succ: str = "succ"
) -> DataFrame:
    """Strongly connected components of an out-degree-1 (functional)
    pointer graph via POINTER DOUBLING — the directed sibling of
    connected_components for the best-match-pointer graphs dedup
    canonicalization produces (each doc points at its most-similar
    doc; the SCCs, i.e. the cycles, are the mutual-best duplicate
    clusters; tail nodes are singleton SCCs that merely *feed into*
    a cluster). Reference analog: the alias-canonicalization intent of
    hikma-engine's entity merging (src/utils/in-memory-graph.ts
    connected traversals), directed rather than undirected.

    Algorithm (classic parallel pointer jumping):
      state(u) = (t = succ^(2^k)(u), m = min id in succ^1..2^k(u));
      one self-equi-join per round composes the state with itself, so
      after L = ceil(log2(2n)) rounds t(u) = succ^(2^L)(u) with
      2^L >= n, which is ALWAYS on u's terminal cycle. Three facts
      close the computation with no further iteration:
        * image(t) = exactly the set of cycle nodes (t always lands on
          a cycle, and t restricted to a cycle is a rotation, hence
          surjective onto it) -> on_cycle(u) = u IN distinct(t);
        * for a node ON its cycle the whole 2^L-step path stays on the
          cycle, so m(u) = min id of the cycle -> scc_id = least(u, m);
        * tail nodes are singleton SCCs -> scc_id = u.

    Scale: L grows logarithmically (n = 10^12 -> 41 rounds), each
    round ONE equi-join + projection shuffled on the join key — the
    textbook O(log n)-depth list-ranking trade; lineage cut per round
    with localCheckpoint exactly like connected_components. The
    pointer domain must be closed (succ(u) always has a pointer row),
    which holds by construction for best-match pointers (sharing a
    shingle is symmetric).

    Returns (node, scc_id, on_cycle), one row per pointer-table node.
    """
    import math

    st = (
        ptr.select(
            F.col(node).alias("node"),
            F.col(succ).alias("t"),
            F.col(succ).alias("m"),
        )
        # self-pointers are legitimate 1-cycles and need no special
        # case: (u,u,u) is a fixpoint of the doubling join, lands in
        # image(t), and gets scc_id = u with on_cycle = true
        .localCheckpoint(eager=True)
    )
    n = st.count()
    if n == 0:
        # schema-preserving empty result (node dtype follows the input)
        return ptr.select(
            F.col(node).alias("node"),
            F.col(node).alias("scc_id"),
            F.lit(True).alias("on_cycle"),
        ).filter(F.lit(False))
    # size the per-round shuffle to the STATE (n rows, fixed across
    # rounds), exactly like connected_components: a 5k-row state on a
    # 32-way shuffle is pure task overhead × log2(2n) rounds
    # (measured 8.0 → 2.6 s on the sf0.1 pointer graph)
    default_par = ptr.sparkSession.sparkContext.defaultParallelism
    npart = max(1, min(default_par, n // 20_000 + 1))
    st = st.repartition(npart, "t").localCheckpoint(eager=True)
    rounds = max(1, math.ceil(math.log2(2 * n)))
    for r in range(rounds):
        other = st.select(
            F.col("node").alias("t"),
            F.col("t").alias("t2"),
            F.col("m").alias("m2"),
        )
        st = (
            st.join(other, "t")
            .select(
                "node",
                F.col("t2").alias("t"),
                F.least("m", "m2").alias("m"),
            )
            .repartition(npart, "t")
        )
        # cut lineage every 3rd round (and at the end): an eager
        # checkpoint per round pays a full job per doubling, while the
        # un-cut plan only doubles in depth — 3 self-joins of depth ≤ 8
        # stay well inside codegen/analysis budgets (measured 3.4 →
        # 1.9 s for the 14-round sf0.1 loop)
        if r % 3 == 2 or r == rounds - 1:
            st = st.localCheckpoint(eager=True)
    cycle_nodes = st.select(F.col("t").alias("node")).distinct()
    on_cycle = st.join(cycle_nodes, "node", "left_semi").select(
        "node", F.least("node", "m").alias("scc_id"), F.lit(True).alias("on_cycle")
    )
    tails = st.join(cycle_nodes, "node", "left_anti").select(
        "node", F.col("node").alias("scc_id"), F.lit(False).alias("on_cycle")
    )
    return on_cycle.unionByName(tails)


def edge_support(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-EDGE triangle support over an undirected simple graph given
    as unique (a < b) pairs — support(e) = number of triangles through
    e, the statistic under k-truss decomposition and Granovetter
    weak-tie analysis: support-0 edges close no triangle, i.e. they
    are the bridge candidates BETWEEN communities (and the first peel
    of any truss).

    Same degree-orientation doctrine as triangle_counts (each triangle
    enumerated exactly once at its unique wedge apex, O(sqrt(m)) wedge
    fan-out on any graph); the difference is the credit step — each
    triangle credits its three EDGES (canonicalized a < b), then a
    left join back onto the full edge set fills support 0 for the
    triangle-free edges a corner-credit pass would silently drop.
    """
    sym = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).unionByName(edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("deg"))
    du = deg.select(F.col("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        sym.join(du, "u")
        .join(dv, "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )
    w1 = oriented.select(F.col("u"), F.col("v"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w"))
    # assume_canonical (round-6 opt.): same contract note as
    # triangle_counts — a caller guaranteeing unique a < b pairs skips
    # the two defensive re-canonicalization distincts.
    if assume_canonical:
        canon = edges.select(
            F.col(a_col).alias("v"), F.col(b_col).alias("w")
        )
    else:
        canon = edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("w"),
        ).distinct()
    tri = wedges.join(canon, ["v", "w"], "left_semi")
    credits = (
        tri.select(
            F.least("u", "v").alias("ea"), F.greatest("u", "v").alias("eb")
        )
        .unionByName(
            tri.select(
                F.least("u", "w").alias("ea"), F.greatest("u", "w").alias("eb")
            )
        )
        .unionByName(tri.select(F.col("v").alias("ea"), F.col("w").alias("eb")))
    )
    sup = credits.groupBy("ea", "eb").agg(F.count("*").alias("support"))
    if assume_canonical:
        base = edges.select(
            F.col(a_col).alias("ea"), F.col(b_col).alias("eb")
        )
    else:
        base = edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("ea"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("eb"),
        ).distinct()
    return base.join(sup, ["ea", "eb"], "left").select(
        F.col("ea").alias(a_col),
        F.col("eb").alias(b_col),
        F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
        (F.coalesce(F.col("support"), F.lit(0)) == 0).alias("weak_tie"),
    )


def k_betweenness(
    edges: DataFrame,
    sources: DataFrame,
    k: int = 4,
    a_col: str = "a",
    b_col: str = "b",
    assume_simple: bool = False,
) -> DataFrame:
    """Source-sampled k-bounded Brandes betweenness centrality
    (Brandes 2001 "A faster algorithm for betweenness centrality";
    source sampling per Brandes & Pich 2007) — the broker-detection
    centrality the graph family was missing: PageRank scores
    ENDORSEMENT mass, k-core scores EMBEDDEDNESS, betweenness scores
    the nodes shortest paths must PASS THROUGH. Exact betweenness is
    O(nm) — never scale-honest — so this is the published estimator:
    Brandes' dependency accumulation from a deterministic sample of
    source nodes, with BFS radius bounded to ``k`` (k-betweenness:
    only shortest paths of length ≤ k are counted; at social-graph
    diameters ~ 4-5 the truncation is mild and the round count is a
    hard scheduler bound, same doctrine as bounded_sssp).

    Semantics returned: bc_micro(v) = Σ_{s ∈ sources} δ_s(v) · 10⁶
    over INTERIOR nodes v ≠ s, where δ follows Brandes' recurrence
    δ(v) = Σ_{w : d(w)=d(v)+1, v~w} σ(v)/σ(w) · (1 + δ(w)). The
    per-edge term is carried as the exact BIGINT
    σ(v)·(10⁶ + δ_micro(w)) DIV σ(w) — floor-bias per TERM, then an
    order-insensitive integer SUM, so the result is bit-stable under
    any partitioning and replayable by an unrolled SQL twin (the
    repo's micro-integer doctrine; at ~10⁹-node graphs the products
    need DECIMAL(38), a widening Spark does natively). Nodes at the
    deepest level have δ = 0 by the k-truncation.

    Scale shape: the forward pass is bounded_sssp's frontier
    discipline vectorized over sources — state is (source, node,
    dist, sigma); each of the ≤ k rounds is ONE frontier×edges
    equi-join + ONE anti-join + ONE algebraic groupBy-sum, lineage
    cut per round with localCheckpoint. The backward pass re-joins
    each level to its successor level only (never the full state),
    ≤ k-1 more rounds. Hot hub nodes land in groupBy SUMs (map-side
    combinable); the per-source fan-out is |sources|, a constant the
    caller samples."""
    if k < 1:
        raise ValueError("k must be >= 1")
    e = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).filter(
        F.col("u").isNotNull()
        & F.col("v").isNotNull()
        & (F.col("u") != F.col("v"))
    )
    # round-6 opt. (guide §2.2): ``assume_simple`` lets a caller that
    # already guarantees a DISTINCT simple edge list with no symmetric
    # (v,u) duplicates (e.g. a deduped bipartite dim whose endpoint
    # namespaces are disjoint) skip the two full-table wide distincts —
    # on anything else the exact round-5 normalization runs unchanged.
    if not assume_simple:
        e = e.distinct()
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not assume_simple:
        und = und.distinct()
    # every forward AND backward round joins und on "u"
    und = _keyed_checkpoint(und, "u")
    l0 = (
        sources.select(F.col("node").alias("s"))
        .distinct()
        .select(
            "s",
            F.col("s").alias("node"),
            F.lit(1).cast("long").alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [l0]
    # round-6 opt.: ``assigned`` is a plain union of the already-
    # checkpointed levels' (s, node) keys — re-checkpointing the
    # growing union each round materialized the same rows k times; the
    # anti-join below scans the ≤ k checkpointed leaves instead.
    assigned = l0.select("s", "node")
    frontier = l0
    for _ in range(k):
        nxt = (
            frontier.join(und, frontier["node"] == und["u"])
            .select("s", F.col("v").alias("node"), "sigma")
            .join(assigned, ["s", "node"], "left_anti")
            .groupBy("s", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        assigned = assigned.unionByName(nxt.select("s", "node"))
        frontier = nxt
    depth = len(levels) - 1
    all_nodes = und.select(F.col("u").alias("node")).distinct()
    if depth < 2:
        # no interior nodes possible within the radius
        return all_nodes.select(
            "node", F.lit(0).cast("long").alias("bc_micro")
        ).limit(0)
    # round-6 opt.: delta carries the level's sigma alongside
    # delta_micro, so each backward round joins its successor level
    # ONCE (on the shared (s, w) grain) instead of separately joining
    # the level-(d+1) sigma dim and the delta dim — one shuffle join
    # fewer per round, identical per-edge terms.
    delta = levels[depth].select(
        "s", "node", "sigma", F.lit(0).cast("long").alias("delta_micro")
    )
    parts = []
    for d in range(depth - 1, 0, -1):
        cur = levels[d]
        dn = delta.select(
            "s",
            F.col("node").alias("w"),
            F.col("sigma").alias("sigma_w"),
            "delta_micro",
        )
        contrib = (
            cur.join(und, cur["node"] == und["u"])
            .select("s", "node", "sigma", F.col("v").alias("w"))
            .join(dn, ["s", "w"])
            .select(
                "s",
                "node",
                F.expr(
                    "sigma * (1000000 + delta_micro) DIV sigma_w"
                ).alias("t"),
            )
        )
        delta = (
            cur.join(
                contrib.groupBy("s", "node").agg(
                    F.sum("t").alias("delta_micro")
                ),
                ["s", "node"],
                "left",
            )
            .select(
                "s",
                "node",
                "sigma",
                F.coalesce("delta_micro", F.lit(0))
                .cast("long")
                .alias("delta_micro"),
            )
            .localCheckpoint(eager=True)
        )
        parts.append(delta)
    acc = parts[0].select("s", "node", "delta_micro")
    for p in parts[1:]:
        acc = acc.unionByName(p.select("s", "node", "delta_micro"))
    return acc.groupBy("node").agg(
        F.sum("delta_micro").cast("long").alias("bc_micro")
    )


def luby_mis(
    edges: DataFrame,
    rounds: int = 6,
    a_col: str = "a",
    b_col: str = "b",
    assume_simple: bool = False,
) -> DataFrame:
    """Deterministic Luby-style MAXIMAL INDEPENDENT SET (Luby 1986,
    "A simple parallel algorithm for the maximal independent set
    problem") — the classic distributed-coordination primitive: pick a
    maximal set of nodes no two of which are adjacent, in O(log n)
    expected synchronous rounds. In a data pipeline this is DIVERSITY
    SELECTION (an MIS over a kNN graph keeps a maximal subset of
    mutually-dissimilar examples — data-pruning's complement to
    dedup's keep-one-per-component) and CONFLICT-FREE SCHEDULING (an
    MIS over a merge-conflict graph is a maximal batch of ER merges
    that can commit in parallel).

    Luby's random priorities are replaced by the repo's portable
    48-bit-md5 hash of the node id, with the node id itself as the
    tie-break — so every round's decision is a pure function of the
    graph, rounds replay identically under partition retry, and an
    unrolled SQL twin reproduces the set bit-for-bit. Fixed-round
    semantics (the label_propagation precedent): after ``rounds``
    synchronous rounds any still-undecided nodes are returned as
    status='undecided' — the caller asserts n_undecided == 0 as its
    convergence contract rather than trusting an unbounded loop.

    Per round (bounded_sssp's discipline, lineage cut per round):
    ONE undecided-semi-joined edge pass + ONE algebraic
    min(struct(h, node)) groupBy gives each undecided node its
    minimum undecided-neighbor priority; nodes beating that minimum
    (or isolated among undecided) enter the MIS; their undecided
    neighbors leave as excluded. Hot hubs sit in the min() groupBy —
    map-side combinable, no salting needed.

    Returns (node, status ∈ {mis, excluded, undecided}, round —
    the deciding round, or ``rounds`` for undecided)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).filter(
        F.col("u").isNotNull()
        & F.col("v").isNotNull()
        & (F.col("u") != F.col("v"))
    )
    # assume_simple (round-6 opt., same contract as k_betweenness): a
    # caller guaranteeing a distinct simple edge list with no symmetric
    # duplicates skips the two normalization distincts.
    if not assume_simple:
        e = e.distinct()
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not assume_simple:
        und = und.distinct()

    def _pr(c: str) -> F.Column:
        return (
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 12), 16, 10)
            .cast("long")
        )

    u = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("h", _pr("node"))
        .localCheckpoint(eager=True)
    )
    # round-6 opt. (the k_core peel-state pattern): maintain the LIVE
    # edge set — edges whose BOTH endpoints are still undecided — as
    # loop state with the v-side priority attached once, instead of
    # re-deriving it from the full edge table every round (two
    # semi-joins + a hash join per round before). Round r's live set
    # is exactly {(u,v) ∈ und : u,v undecided at round r} by
    # induction (newly-decided endpoints are anti-joined out below),
    # so nbr_min — and every downstream decision — is value-identical
    # to the round-5 formulation; the state SHRINKS as rounds decide
    # nodes (Luby decides the bulk in round 1).
    live = und.join(
        u.select(F.col("node").alias("v"), F.col("h").alias("vh")), "v"
    ).localCheckpoint(eager=True)
    decided = None
    for r in range(1, rounds + 1):
        nbr_min = live.groupBy(F.col("u").alias("node")).agg(
            F.min(F.struct(F.col("vh"), F.col("v"))).alias("nm")
        )
        mis_new = (
            u.join(nbr_min, "node", "left")
            .filter(
                F.col("nm").isNull()
                | (F.col("h") < F.col("nm.vh"))
                | ((F.col("h") == F.col("nm.vh")) & (F.col("node") < F.col("nm.v")))
            )
            .select("node")
            .localCheckpoint(eager=True)
        )
        excl_new = (
            live.join(mis_new.select(F.col("node").alias("u")), "u", "left_semi")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(mis_new, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        batch = mis_new.select(
            "node", F.lit("mis").alias("status"), F.lit(r).alias("round")
        ).unionByName(
            excl_new.select(
                "node", F.lit("excluded").alias("status"), F.lit(r).alias("round")
            )
        )
        decided = batch if decided is None else decided.unionByName(batch)
        dec = mis_new.unionByName(excl_new)
        u = u.join(dec, "node", "left_anti").localCheckpoint(eager=True)
        if u.limit(1).count() == 0:
            break
        if r < rounds:
            live = (
                live.join(dec.select(F.col("node").alias("u")), "u", "left_anti")
                .join(dec.select(F.col("node").alias("v")), "v", "left_anti")
                .localCheckpoint(eager=True)
            )
    out = decided.unionByName(
        u.select(
            "node",
            F.lit("undecided").alias("status"),
            F.lit(rounds).alias("round"),
        )
    )
    return out.select("node", "status", F.col("round").cast("long").alias("round"))


def wl_refinement(
    edges: DataFrame,
    rounds: int = 3,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 32,
) -> DataFrame:
    """Weisfeiler-Leman COLOR REFINEMENT (1-WL; Weisfeiler & Leman
    1968, the canonical-form/graph-isomorphism primitive and the
    expressiveness bound of message-passing GNNs): iteratively refine a
    per-node class label to a hash of (own label, multiset of neighbor
    labels) until classes stabilize. Two nodes share a round-r class
    iff their r-hop neighborhood trees are isomorphic — in a knowledge
    graph this is ROLE DISCOVERY (entities used the same way land in
    the same class regardless of identity), the structural prior behind
    alias suggestion and schema induction.

    Distributed shape — the textbook trap is the multiset itself:
    collect_list + sort of neighbor labels puts a degree-sized array on
    every hot node (a 10⁸-degree hub materializes a 10⁸-element sorted
    list in one task). Instead the multiset signature is ALGEBRAIC:
    dense integer codes for round-r labels, and the neighbor multiset
    fingerprinted by (count, Σc, Σc² mod p, Σ(c²·c) mod p) with
    p = 2³¹−1 — commutative, associative, map-side combinable, so a hub
    costs a partial aggregate, never a sorted array. (Power sums up to
    degree determine the multiset exactly; three plus count is the
    practical fingerprint — a collision needs two distinct ≤|V|-value
    multisets agreeing on all four BIGINTs mod p simultaneously.)
    Label→dense-code assignment each round is ``ranking.global_rank``
    over the DISTINCT signature dim (range-partitioned sort, bounded
    single-task state) — never an unpartitioned dense_rank window.
    All arithmetic is overflow-safe BIGINT at 10⁹ codes: each mod term
    < 2³¹ and Σ over a 10⁹-degree hub < 2³¹·10⁹ < 2⁶³.

    Fixed-round semantics (luby_mis/label_propagation precedent):
    ``rounds`` synchronous refinements, lineage cut per round; classes
    only split (never merge), so per-round class counts are monotone —
    the caller's convergence readout. Returns
    (node, degree, c0, c1, …, c{rounds}) with c0 = degree class.

    No reference analog (the reference's SQLite graph is queried, not
    canonicalized); cite: graph family operators/graph.py, code
    assignment operators/ranking.py.
    """
    from .ranking import global_rank

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    p = 2147483647
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
    )
    nbr = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("nb"))
        .localCheckpoint(eager=True)
    )
    deg = nbr.groupBy("node").agg(F.count("*").cast("long").alias("degree"))
    deg_dim = global_rank(
        deg.select("degree").distinct(),
        ["degree"],
        out_col="code",
        num_partitions=num_partitions,
    )
    out = deg.join(deg_dim, "degree").select(
        "node", "degree", F.col("code").alias("c0")
    )
    labels = out.select("node", F.col("c0").alias("code")).localCheckpoint(
        eager=True
    )
    for r in range(1, rounds + 1):
        sig = (
            nbr.join(
                labels.select(F.col("node").alias("nb"), F.col("code").alias("nc")),
                "nb",
            )
            .groupBy("node")
            .agg(
                F.count("*").cast("long").alias("d"),
                F.sum("nc").cast("long").alias("s1"),
                F.expr(f"sum(nc * nc % {p}) % {p}").cast("long").alias("s2"),
                F.expr(f"sum((nc * nc % {p}) * nc % {p}) % {p}")
                .cast("long")
                .alias("s3"),
            )
        )
        tup = labels.join(sig, "node").select(
            "node", F.col("code").alias("own"), "d", "s1", "s2", "s3"
        )
        dim = global_rank(
            tup.select("own", "d", "s1", "s2", "s3").distinct(),
            ["own", "d", "s1", "s2", "s3"],
            out_col="code",
            num_partitions=num_partitions,
        )
        labels = (
            tup.join(dim, ["own", "d", "s1", "s2", "s3"])
            .select("node", "code")
            .localCheckpoint(eager=True)
        )
        out = out.join(
            labels.select("node", F.col("code").alias(f"c{r}")), "node"
        )
    return out


def jp_coloring(
    edges: DataFrame,
    rounds: int = 24,
    a_col: str = "a",
    b_col: str = "b",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Deterministic Jones-Plassmann GREEDY GRAPH COLORING (Jones &
    Plassmann 1993) — the full-partition complement of luby_mis: where
    an MIS is ONE maximal conflict-free batch, a coloring schedules the
    ENTIRE graph into conflict-free batches (color classes). In an ER
    pipeline a coloring of the merge-conflict graph is the complete
    parallel-commit schedule; greedy mex assignment guarantees
    n_colors ≤ Δ+1.

    Same determinism contract as luby_mis: priorities are the portable
    48-bit-md5 hash of the node id with the node id as tie-break, so
    rounds replay identically under retry and an unrolled SQL twin
    reproduces every color bit-for-bit. Fixed-round semantics (the
    luby_mis precedent): the full ``rounds`` budget always runs (a
    converged graph makes the tail rounds no-op plan segments, and the
    SQL twin unrolls the same budget with empty CTEs); nodes still
    uncolored after ``rounds`` return status='uncolored' and the
    caller asserts none exist.

    Per round, ONE state DataFrame (node, h, color, round) is rebuilt;
    lineage is cut every ``checkpoint_every`` rounds (default every
    round: the state is referenced three times per round — frontier,
    used-colors, merge-back — so an unmaterialized round TRIPLES the
    plan subtree and two deferred rounds already blow the optimizer
    budget; synchronous JP rounds are inherently sequential, ~14-16 on
    a kNN-5 graph with 48-bit hash priorities, and one job barrier per
    round is the honest price of that dependency chain): the
    priority-local-minima frontier among uncolored nodes (an
    independent set — within-round assignments can never conflict)
    takes the MINIMUM EXCLUDANT of its already-colored neighbors'
    colors, computed relationally: explode(sequence(0, n_used))
    candidates anti-joined against the used set, min per node — never
    a per-node Python loop; candidate fan-out bounded by the colored
    degree ≤ Δ. Hot hubs sit in map-side-combinable min()/count()
    aggregates.

    Returns (node, color, round, status ∈ {colored, uncolored});
    color/round are NULL for uncolored leftovers."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
    )
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    # per-round joins key und on "v" (uncolored priorities, colored
    # neighbor colors); the "u"-keyed accesses broadcast
    und = _keyed_checkpoint(und, "v")

    def _pr(c: str) -> F.Column:
        return (
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 12), 16, 10)
            .cast("long")
        )

    st = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .select(
            "node",
            _pr("node").alias("h"),
            F.lit(None).cast("long").alias("color"),
            F.lit(None).cast("long").alias("round"),
        )
        .localCheckpoint(eager=True)
    )
    for r in range(1, rounds + 1):
        unc = st.filter(F.col("color").isNull()).select("node", "h")
        nbr_min = (
            und.join(
                unc.select(F.col("node").alias("v"), F.col("h").alias("vh")),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min(F.struct(F.col("vh"), F.col("v"))).alias("nm"))
        )
        front = (
            unc.join(nbr_min, "node", "left")
            .filter(
                F.col("nm").isNull()
                | (F.col("h") < F.col("nm.vh"))
                | (
                    (F.col("h") == F.col("nm.vh"))
                    & (F.col("node") < F.col("nm.v"))
                )
            )
            .select("node")
        )
        # mex via array algebra (round-6 optimization): one
        # collect_set aggregate replaces the old distinct +
        # count-groupBy + explode(sequence) anti-join + min-groupBy
        # (3 exchanges per round → 1). Equivalence: collect_set dedups
        # exactly like the old distinct, size(used) == the old n_used
        # (count of DISTINCT used colors), and
        # array_min(array_except(sequence(0, n), used)) is the same
        # minimum excludant the anti-join computed — sequence has n+1
        # candidates vs n used colors, so a mex always exists. The
        # per-node array is bounded by the colored degree ≤ Δ, the
        # same bound the old explode fan-out had.
        used_sets = (
            und.join(front.select(F.col("node").alias("u")), "u", "left_semi")
            .join(
                st.filter(F.col("color").isNotNull()).select(
                    F.col("node").alias("v"), "color"
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.collect_set("color").alias("used"))
        )
        assign = (
            front.join(used_sets, "node", "left")
            .select(
                "node",
                F.expr(
                    "coalesce(array_min(array_except("
                    " sequence(0L, CAST(coalesce(size(used), 0) AS BIGINT)),"
                    " coalesce(used, CAST(array() AS ARRAY<BIGINT>)))), 0L)"
                ).cast("long").alias("new_color"),
            )
        )
        st = (
            st.join(assign, "node", "left")
            .select(
                "node",
                "h",
                F.coalesce(F.col("color"), F.col("new_color")).alias("color"),
                F.coalesce(
                    F.col("round"),
                    F.when(
                        F.col("new_color").isNotNull(), F.lit(r).cast("long")
                    ),
                ).alias("round"),
            )
        )
        if r % checkpoint_every == 0 or r == rounds:
            st = st.localCheckpoint(eager=True)
            # early exit (round-6 optimization): once every node is
            # colored the remaining budget rounds are exact no-ops
            # (empty frontier, st unchanged) — skip them. Output is
            # identical; only dead work is avoided. The check is one
            # tiny job over the just-materialized state.
            if r < rounds and (
                st.filter(F.col("color").isNull()).limit(1).count() == 0
            ):
                break
    return st.select(
        "node",
        "color",
        "round",
        F.when(F.col("color").isNotNull(), F.lit("colored"))
        .otherwise(F.lit("uncolored"))
        .alias("status"),
    )
