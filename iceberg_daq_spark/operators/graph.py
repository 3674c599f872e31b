"""Distributed iterative graph operators (PageRank).

The second graph primitive next to the dedup connected-components
closure (operators/dedup.py): power-iteration PageRank expressed as
the classic Spark join+agg loop - each round is

    contributions = ranks JOIN edges ON src, grouped by dst
    ranks'        = (1 - d)/N + d * contributions

i.e. one hash-partitioned equi-join plus one partial-agg shuffle per
round, both on the node id, so consecutive rounds reuse the same
key partitioning.  Lineage is truncated with ``localCheckpoint``
every round (the same discipline as the CC loop) so the plan doesn't
grow with the iteration count.

Scale shape: state per round is one (id, rank) row per node and one
(src, dst) row per edge - never materialized on the driver; a
billion-node graph is just a bigger shuffle.  Dangling nodes (no
out-edges) are NOT redistributed here - callers must ensure min
out-degree >= 1 (q109 does, by construction) or accept the lost-mass
variant, which is what a fixed-iteration SQL oracle computes too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank.

    ``nodes``: one ``id`` column (every vertex, including sinks);
    ``edges``: ``src``/``dst`` columns, pre-deduplicated.  Returns
    ``(id, rank)`` after ``iterations`` rounds from the uniform
    start, UNNORMALIZED relative to N: rank values sum to ~1.
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    # out-degree rides along with the edge list so each round is one
    # join, not two.  Pre-shuffle the edge table on the join key ONCE
    # and cache it: InMemoryTableScan preserves outputPartitioning
    # (localCheckpoint does not - Scan ExistingRDD re-exchanges every
    # round, which at 10x edges was the dominant stress-bench term),
    # so all `iterations` joins reuse the single edge shuffle.
    ed = edges.join(deg, "src").repartition("src").persist()
    try:
        base = (1.0 - damping) / n_nodes
        ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
        for _ in range(iterations):
            # localCheckpoint keeps the plan flat across rounds; the
            # node-sized tables (ranks in, nodes in the dangling left
            # join, contributions out) are the only per-round exchanges -
            # all one row per node, the SMALL class next to the edge
            # table, so re-exchanging them is linear while pinning them
            # (measured) only adds cache-write fixed cost
            ranks = _round(ranks, ed, nodes, base, damping).localCheckpoint()
    finally:
        # ranks is materialized by the final localCheckpoint - the
        # cached edge table can be dropped without recompute risk; the
        # finally keeps a mid-iteration failure from pinning the
        # largest object in the job for the session lifetime
        ed.unpersist()
    return ranks


def _round(
    ranks: DataFrame, ed: DataFrame, nodes: DataFrame, base: float, damping: float
) -> DataFrame:
    """One un-checkpointed power iteration (factored out so the plan
    tests can assert the per-round physical shape - the checkpointed
    loop's final plan is just a scan of the pinned RDD)."""
    contrib = (
        ranks.join(ed, ranks["id"] == ed["src"])
        .select(
            F.col("dst").alias("id"), (F.col("rank") / F.col("_deg")).alias("_c")
        )
        .groupBy("id")
        .agg(F.sum("_c").alias("_inc"))
    )
    return nodes.join(contrib, "id", "left_outer").select(
        "id",
        (
            F.lit(base) + F.lit(damping) * F.coalesce(F.col("_inc"), F.lit(0.0))
        ).alias("rank"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count via degree-ordered edge orientation.

    ``edges``: undirected, pre-deduplicated ``u``/``v`` pairs with
    ``u < v``.  Returns a single-row ``(n_nodes, n_edges,
    n_triangles)`` DataFrame.

    Scale shape: each undirected edge is oriented from its
    lower-(degree, id) endpoint to its higher one, so every wedge is
    generated at its smallest corner - the classic trick that bounds
    per-node fan-out by O(sqrt(m)) (arboricity) instead of the max
    degree, which is what keeps a power-law graph's hot vertex from
    producing deg^2 wedge rows.  The whole thing is three equi-joins
    plus partial aggs, all keyed on node ids: degrees (one agg),
    orientation (two broadcast-size joins against the degree table),
    wedge generation (self-join on the wedge corner), and closure
    (inner join of wedges against the unique edge set).  No driver
    collect; a billion-edge graph is just a bigger shuffle.
    """
    nodes = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("_deg"))
    )
    # orient by (degree, id): lower endpoint -> higher endpoint
    du = deg.select(F.col("id").alias("u"), F.col("_deg").alias("_du"))
    dv = deg.select(F.col("id").alias("v"), F.col("_deg").alias("_dv"))
    ed = edges.join(du, "u").join(dv, "v")
    lower_first = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # wedges at the common (smallest-order) corner; dedupe the two
    # symmetric (b, c)/(c, b) generations by id order
    a = oriented.alias("a")
    b = oriented.alias("b")
    wedges = a.join(b, F.col("a.src") == F.col("b.src")).where(
        F.col("a.dst") < F.col("b.dst")
    )
    # a wedge (x -> b, x -> c) closes iff b-c is an edge, probed in
    # canonical undirected form; INNER join (not semi) because two
    # triangles sharing a base edge produce the same (u, v) closing
    # pair - the unique edge set guarantees no fan-out, so each
    # closed wedge survives exactly once
    closing = wedges.select(
        F.least(F.col("a.dst"), F.col("b.dst")).alias("u"),
        F.greatest(F.col("a.dst"), F.col("b.dst")).alias("v"),
    )
    tri = closing.join(edges, ["u", "v"], "inner")
    return (
        tri.agg(F.count("*").cast("bigint").alias("n_triangles"))
        .crossJoin(nodes.agg(F.count("*").cast("bigint").alias("n_nodes")))
        .crossJoin(edges.agg(F.count("*").cast("bigint").alias("n_edges")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def bfs_hops(
    edges: DataFrame, seed: int | None = None, max_hops: int = 8
) -> DataFrame:
    """Breadth-first hop distance from a seed vertex over an
    undirected edge list (``u``/``v`` pairs, ``u < v``,
    pre-deduplicated).  Returns ``(id, hops)`` for every vertex
    reachable within ``max_hops``, seed included at ``hops = 0``.
    ``seed=None`` picks ``min(u)`` - the deterministic default the
    recursive-CTE oracle mirrors.

    Scale shape: classic frontier expansion.  Each round joins the
    CURRENT frontier (only the vertices discovered last round, not
    the whole visited set) against the symmetrized edge list, strips
    already-visited vertices with a left-anti join, and
    ``localCheckpoint``s both sets so plan lineage stays flat across
    rounds.  Per-round work is O(edges incident to the frontier) -
    the same per-round cost profile as the connected-components
    min-label loop (operators/dedup.py) - and the loop exits as soon
    as a frontier comes back empty, so total rounds = graph
    eccentricity, not ``max_hops``.  The only driver-side value per
    round is the isEmpty() probe; vertex sets never collect.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col("u").alias("s"), F.col("v").alias("t"))
        .unionAll(edges.select(F.col("v").alias("s"), F.col("u").alias("t")))
        .localCheckpoint()
    )
    if seed is None:
        row = edges.agg(F.min("u").alias("m")).first()
        if row is None or row["m"] is None:
            return spark.createDataFrame([], "id bigint, hops bigint")
        seed = row["m"]
    visited = spark.createDataFrame(
        [(int(seed), 0)], "id bigint, hops bigint"
    ).localCheckpoint()
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["id"] == sym["s"])
            .select(F.col("t").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .select("id", F.lit(h).cast("bigint").alias("hops"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited


def k_core(edges: DataFrame, k: int, max_rounds: int | None = None) -> DataFrame:
    """The k-core of an undirected graph (``u``/``v``, ``u < v``,
    deduplicated): the maximal subgraph where every vertex keeps
    degree >= k, computed by iterative peeling - drop all vertices
    below k, recompute degrees on the induced subgraph, repeat until
    a fixed point.  Returns the surviving edge list.

    Peeling always terminates (the edge count strictly shrinks every
    non-fixed-point round, so rounds <= |E|), so the default runs to
    the true fixed point - a partial peel is NOT a k-core, and
    returning one silently would be wrong (a k=2 chain peels one
    layer per round, making the round count O(n), not bounded by any
    constant).  Pass ``max_rounds`` only as an explicit safety budget
    for untrusted inputs; exhausting it without convergence raises
    rather than returning the non-core edge list.

    Scale shape: each round is one degree aggregation plus two
    semi-joins of the edge list against the surviving vertex set,
    ``localCheckpoint``ed so lineage stays flat; the edge list only
    ever shrinks.  Rounds are bounded by the peeling depth (the
    degeneracy ordering's layer count), and the only driver-side
    value per round is the pruned-edge count probe.
    """
    cur = edges.localCheckpoint()
    rounds = 0
    while True:
        deg = (
            cur.select(F.col("u").alias("id"))
            .unionAll(cur.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("_deg"))
        )
        keep = deg.filter(F.col("_deg") >= k).select("id")
        nxt = (
            cur.join(keep.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n_cur, n_nxt = cur.count(), nxt.count()
        cur = nxt
        if n_nxt == n_cur or n_nxt == 0:
            return cur
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            raise RuntimeError(
                f"k_core did not reach a fixed point within max_rounds="
                f"{max_rounds} (still peeling at {n_nxt} edges); the "
                "partial edge list is not a k-core"
            )
