"""Q123: grid-bucketed spatial radius join.

The spatial-join family's scale pattern: bucket points into grid
cells sized to the query radius, generate candidates only between a
cell and its 3x3 neighborhood (each pair of points within radius r
is guaranteed to share a neighborhood when the cell edge is >= r),
then exact-filter by distance.  This is the same
candidate-then-verify discipline as the LSH/IVF similarity family -
the cross-product never happens; candidate fan-out is bounded by
cell occupancy.

The corpus has no native coordinates, so points are derived from
user ids with DETERMINISTIC integer arithmetic (identical in the
Spark plan and the DuckDB oracle, the q79/q80 enrichment
convention): the operator logic - cell bucketing, neighborhood
explode, distance verify, a<b dedup - is what is exercised and
hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_R = 7.0  # query radius; cell edge == radius


@register(
    "q123_spatial_radius_join",
    oracle=f"""
    WITH pts AS (
      SELECT DISTINCT user_id,
             CAST(user_id * 7919 % 1000 AS DOUBLE) / 10.0  AS x,
             CAST(user_id * 104729 % 1000 AS DOUBLE) / 10.0 AS y
      FROM events
    ), pairs AS (
      SELECT a.user_id AS u, b.user_id AS v,
             sqrt(pow(a.x - b.x, 2) + pow(a.y - b.y, 2)) AS dist
      FROM pts a JOIN pts b ON a.user_id < b.user_id
      WHERE pow(a.x - b.x, 2) + pow(a.y - b.y, 2) <= {_R} * {_R}
    ), nbr AS (
      SELECT u AS user_id FROM pairs UNION ALL SELECT v FROM pairs
    ), cnt AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_neighbors
      FROM nbr GROUP BY user_id
    )
    SELECT user_id, n_neighbors FROM cnt
    ORDER BY n_neighbors DESC, user_id LIMIT 20
    """,
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join over a synthetic point set (one point per
    user): which points have the most neighbors within distance r -
    the density hot-spot query of geo analytics.

    100 TB shape: each point lands in ONE grid cell
    (floor(x/r), floor(y/r)) and probes its 3x3 neighborhood via a
    9-row literal explode on the smaller side, so candidate
    generation is an EQUI join on the cell key with fan-out bounded
    by cell occupancy - never the all-pairs product the oracle
    (fine at oracle scale) writes.  The verify step and the a<b
    dedup are map-side; neighbor counting is a partial-agg shuffle
    on user_id.  Skewed cells (urban hot spots) are exactly the AQE
    skew-join case; the cell key is a 2-int struct, so salting
    composes if needed."""
    e = load(spark, sf_dir, "events")
    pts = e.select("user_id").distinct().select(
        "user_id",
        ((F.col("user_id") * 7919 % 1000).cast("double") / 10.0).alias("x"),
        ((F.col("user_id") * 104729 % 1000).cast("double") / 10.0).alias("y"),
    )
    cell = pts.select(
        "user_id",
        "x",
        "y",
        F.floor(F.col("x") / _R).cast("int").alias("cx"),
        F.floor(F.col("y") / _R).cast("int").alias("cy"),
    )
    # left side probes its full 3x3 neighborhood; right side stays in
    # its home cell - every within-r pair shares a (cell, neighbor)
    # combination exactly once per direction, and the a<b filter
    # keeps one
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = cell.select(
        F.col("user_id").alias("u"),
        F.col("x").alias("ux"),
        F.col("y").alias("uy"),
        F.explode(offsets).alias("_o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "u",
        "ux",
        "uy",
        (F.col("cx") + F.col("_o.dx")).alias("pcx"),
        (F.col("cy") + F.col("_o.dy")).alias("pcy"),
    )
    home = cell.select(
        F.col("user_id").alias("v"),
        F.col("x").alias("vx"),
        F.col("y").alias("vy"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
    )
    d2 = F.pow(F.col("ux") - F.col("vx"), 2) + F.pow(
        F.col("uy") - F.col("vy"), 2
    )
    pairs = (
        probe.join(home, ["pcx", "pcy"])
        .where((F.col("u") < F.col("v")) & (d2 <= F.lit(_R * _R)))
        .select("u", "v")
    )
    nbr = pairs.select(F.col("u").alias("user_id")).unionAll(
        pairs.select(F.col("v").alias("user_id"))
    )
    return (
        nbr.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_neighbors"))
        .orderBy(F.desc("n_neighbors"), "user_id")
        .limit(20)
    )
