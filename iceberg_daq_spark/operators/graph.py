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
    # join, not two
    ed = edges.join(deg, "src").localCheckpoint()
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        ranks = _round(ranks, ed, nodes, base, damping).localCheckpoint()
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
