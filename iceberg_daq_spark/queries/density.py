"""Q240: grid-accelerated DBSCAN - density-based clustering.

Completes the clustering family: q226 partitions (k-means), q86
groups by semantic cell (SemDeDup), q57 closes explicit match edges
(CC) - DBSCAN discovers clusters of ARBITRARY SHAPE from density
alone, with an explicit noise class, and needs no k.

Semantics (declared, deterministic): a point is CORE when at least
MIN_PTS points (itself included) lie within EPS; clusters are the
connected components of the core-core eps-graph; a non-core point
within EPS of any core is a BORDER point and joins the LOWEST
cluster id among its in-reach cores (the textbook first-found rule
made order-free); everything else is NOISE (cluster_id -1).

100 TB shape: the eps-neighborhood join is the q123 grid pattern -
cell edge >= eps, 3x3-neighborhood equi-join, exact distance verify
- so candidate volume is cell-occupancy-bounded, never all-pairs;
the closure is the size-aware connected_components operator; border
assignment is one min-aggregate join.  Coordinates derive from user
ids with exact integer arithmetic (both engines compute the same
doubles), clustered around 5 sites so density structure exists at
every test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.dedup import connected_components
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

EPS = 5.0
MIN_PTS = 3  # neighbors within EPS, self included

_PTS_SQL = """
      SELECT DISTINCT user_id,
             (user_id % 5) * 20 + 10
               + ((user_id * 7919 % 100) / 100.0) * 6 - 3 AS x,
             ((user_id * 3 % 5)) * 20 + 10
               + ((user_id * 104729 % 100) / 100.0) * 6 - 3 AS y
      FROM events
"""


@register(
    "q240_dbscan",
    oracle=f"""
    WITH RECURSIVE pts AS (
      {_PTS_SQL}
    ), nbr AS (
      SELECT a.user_id AS u, b.user_id AS v
      FROM pts a JOIN pts b
        ON pow(a.x - b.x, 2) + pow(a.y - b.y, 2) <= {EPS} * {EPS}
    ), ncnt AS (
      SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_in_eps
      FROM nbr GROUP BY u
    ), core AS (
      SELECT user_id FROM ncnt WHERE n_in_eps >= {MIN_PTS}
    ), cedge AS (
      SELECT n.u, n.v FROM nbr n
      JOIN core ca ON ca.user_id = n.u
      JOIN core cb ON cb.user_id = n.v
      WHERE n.u <> n.v
    ), cc AS (
      WITH RECURSIVE x(node, comp) AS (
        SELECT u, least(u, min(v)) FROM cedge GROUP BY u
        UNION
        SELECT e.u, least(x.comp, xx.comp)
        FROM cedge e JOIN x ON e.u = x.node JOIN x xx ON e.v = xx.node
        WHERE least(x.comp, xx.comp) < x.comp
      )
      SELECT node, min(comp) AS comp FROM x GROUP BY node
    ), isolated_core AS (
      -- a core with no other core in reach is its own cluster
      SELECT c.user_id AS node, c.user_id AS comp FROM core c
      WHERE NOT EXISTS (SELECT 1 FROM cc WHERE cc.node = c.user_id)
    ), assign_core AS (
      SELECT node, comp FROM cc UNION ALL
      SELECT node, comp FROM isolated_core
    ), border AS (
      SELECT n.u AS node, CAST(min(a.comp) AS BIGINT) AS comp
      FROM nbr n
      JOIN assign_core a ON a.node = n.v
      WHERE n.u <> n.v
        AND NOT EXISTS (SELECT 1 FROM core c WHERE c.user_id = n.u)
      GROUP BY n.u
    ), labeled AS (
      SELECT node, comp, TRUE AS is_core FROM assign_core
      UNION ALL
      SELECT node, comp, FALSE FROM border
    ), clusters AS (
      SELECT CAST(comp AS BIGINT) AS cluster_id,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT)
               AS n_core
      FROM labeled GROUP BY comp
    ), noise AS (
      SELECT CAST(-1 AS BIGINT) AS cluster_id,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(0 AS BIGINT) AS n_core
      FROM pts p
      WHERE NOT EXISTS (SELECT 1 FROM labeled l WHERE l.node = p.user_id)
    )
    SELECT cluster_id, n_points, n_core
    FROM (SELECT * FROM clusters UNION ALL
          SELECT * FROM noise WHERE n_points > 0)
    ORDER BY n_points DESC, cluster_id LIMIT 20
    """,
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the site-clustered synthetic user points: top-20
    clusters by size (cluster_id = lowest member core id) plus the
    noise bucket as cluster_id -1.

    The eps-neighborhood join buckets points into EPS-edge grid
    cells and probes the 3x3 neighborhood (q123's candidate-then-
    verify discipline - occupancy-bounded, no all-pairs); the
    core-core closure rides connected_components; isolated cores
    self-label; border points take the minimum in-reach core's
    cluster."""
    e = load(spark, sf_dir, "events")
    uid = F.col("user_id")
    pts = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            (
                (uid % 5) * 20 + 10
                + ((uid * 7919 % 100) / 100.0) * 6 - 3
            ).alias("x"),
            (
                (uid * 3 % 5) * 20 + 10
                + ((uid * 104729 % 100) / 100.0) * 6 - 3
            ).alias("y"),
        )
        .localCheckpoint()
    )
    cell = pts.select(
        "user_id",
        "x",
        "y",
        F.floor(F.col("x") / EPS).cast("int").alias("cx"),
        F.floor(F.col("y") / EPS).cast("int").alias("cy"),
    )
    a = cell.alias("a")
    b = (
        cell.select(
            F.col("user_id").alias("v_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            F.explode(
                F.array(*[F.col("cx") + i for i in (-1, 0, 1)])
            ).alias("cx"),
            "cy",
        )
        .select(
            "v_id",
            "bx",
            "by",
            "cx",
            F.explode(
                F.array(*[F.col("cy") + i for i in (-1, 0, 1)])
            ).alias("cy"),
        )
        .alias("b")
    )
    d2 = (F.col("a.x") - F.col("bx")) ** 2 + (F.col("a.y") - F.col("by")) ** 2
    nbr = (
        a.join(b, ["cx", "cy"])
        .filter(d2 <= EPS * EPS)
        .select(F.col("a.user_id").alias("u"), F.col("v_id").alias("v"))
        .localCheckpoint()
    )
    ncnt = nbr.groupBy("u").agg(F.count("*").cast("bigint").alias("n_in_eps"))
    core = ncnt.filter(F.col("n_in_eps") >= MIN_PTS).select(
        F.col("u").alias("user_id")
    ).localCheckpoint()
    cedge = (
        nbr.join(core.select(F.col("user_id").alias("u")), "u", "left_semi")
        .join(core.select(F.col("user_id").alias("v")), "v", "left_semi")
        .filter(F.col("u") != F.col("v"))
    )
    cc = connected_components(cedge, "u", "v")
    isolated = core.join(
        cc.select(F.col("node").alias("user_id")), "user_id", "left_anti"
    ).select(F.col("user_id").alias("node"), F.col("user_id").alias("comp"))
    assign_core = cc.select("node", F.col("component").alias("comp")).unionByName(
        isolated
    ).localCheckpoint()
    border = (
        nbr.filter(F.col("u") != F.col("v"))
        .join(
            core.select(F.col("user_id").alias("u")), "u", "left_anti"
        )
        .join(
            assign_core.select(F.col("node").alias("v"), "comp"), "v"
        )
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("comp").cast("bigint").alias("comp"))
    )
    labeled = assign_core.select(
        "node", "comp", F.lit(True).alias("is_core")
    ).unionByName(border.select("node", "comp", F.lit(False).alias("is_core")))
    clusters = labeled.groupBy(F.col("comp").cast("bigint").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum(F.when(F.col("is_core"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_core"),
    )
    noise = (
        pts.join(
            labeled.select(F.col("node").alias("user_id")), "user_id", "left_anti"
        )
        .agg(F.count("*").cast("bigint").alias("n_points"))
        .select(
            F.lit(-1).cast("bigint").alias("cluster_id"),
            "n_points",
            F.lit(0).cast("bigint").alias("n_core"),
        )
        .filter(F.col("n_points") > 0)
    )
    return (
        clusters.unionByName(noise)
        .orderBy(F.col("n_points").desc(), "cluster_id")
        .limit(20)
    )
