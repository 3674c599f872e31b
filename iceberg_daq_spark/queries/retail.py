"""Q214-Q216: the retail-behavior battery.

Basket-size distribution per market segment, the discount
effectiveness ladder, and order-cadence regularity - three retail
reads that round out the commerce family with a fully-integer
variance computation (q216's regularity uses the exact identity
n*sum(x^2) - sum(x)^2 over BIGINT day gaps - no float moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows


@register(
    "q214_segment_basket_size",
    oracle="""
    WITH basket AS (
      SELECT o.o_orderkey, c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
               AS units
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(n_lines, 0.5), 1) AS p50_lines,
           round(quantile_cont(units, 0.5), 1) AS p50_units,
           round(quantile_cont(units, 0.9), 1) AS p90_units,
           round(sum(units) * 1.0 / count(*), 2) AS mean_units
    FROM basket GROUP BY 1 ORDER BY 1
    """,
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution per market segment: lines and units
    per order, summarized as exact percentiles and an integer-ratio
    mean - the merchandising read behind segment-specific bundle
    sizing.

    100 TB shape: the customer dim joins orders on custkey (segment
    label only), lineitem pre-aggregates through the orderkey join to
    the ORDER grain, and the percentiles run per 5-segment group over
    that grain through the size-aware ``grouped_exact_percentile``:
    small groups use the buffered exact aggregate, giant groups (the
    100 TB case - 5 segments x billions of orders) switch to the
    distributed two-pass rank selection; units are exact integers."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    basket = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.round("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("units"),
        )
    )
    res = grouped_exact_percentile(
        basket,
        ["segment"],
        [
            ("n_lines", 0.5, "_p50_lines"),
            ("units", 0.5, "_p50_units"),
            ("units", 0.9, "_p90_units"),
        ],
        extra_aggs=[
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("units") * 1.0 / F.count("*"), 2).alias(
                "mean_units"
            ),
        ],
        input_rows=table_rows(sf_dir, "orders"),
    )
    return res.select(
        "segment",
        "n_orders",
        F.round("_p50_lines", 1).alias("p50_lines"),
        F.round("_p50_units", 1).alias("p50_units"),
        F.round("_p90_units", 1).alias("p90_units"),
        "mean_units",
    ).orderBy("segment")


@register(
    "q215_discount_ladder",
    oracle="""
    WITH tot AS (
      SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS t_cents
      FROM lineitem
    )
    SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pts,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(CAST(round(l_quantity) AS BIGINT)) * 1.0 / count(*), 2)
             AS avg_qty,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0,
                 2) AS revenue,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 * 1.0 / t.t_cents, 4) AS rev_share
    FROM lineitem CROSS JOIN tot t
    GROUP BY 1, t.t_cents ORDER BY 1
    """,
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount effectiveness ladder: for each discount level (whole
    points 0-10), line volume, average quantity, and revenue share -
    the rung-by-rung companion to q152's elasticity coefficient (does
    a deeper discount actually move more units?).

    100 TB shape: one partial-agg pass to the 11-rung ladder; the
    total is one broadcast row (pinned grain keeps the scan single);
    every ratio divides exact BIGINTs."""
    li = load(spark, sf_dir, "lineitem")
    ladder = (
        li.groupBy(
            F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pts")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.round("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("units"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        .localCheckpoint()
    )
    tot = ladder.agg(F.sum("cents").cast("bigint").alias("t_cents"))
    return (
        ladder.crossJoin(F.broadcast(tot))
        .select(
            "disc_pts",
            "n_lines",
            F.round(F.col("units") * 1.0 / F.col("n_lines"), 2).alias(
                "avg_qty"
            ),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") * 1.0 / F.col("t_cents"), 4).alias(
                "rev_share"
            ),
        )
        .orderBy("disc_pts")
    )


@register(
    "q216_order_regularity",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
               - CAST(floor(epoch(lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 )) / 86400) AS BIGINT) AS gap_d
      FROM orders
    ), moments AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(gap_d) AS BIGINT) AS s1,
             CAST(sum(gap_d * gap_d) AS BIGINT) AS s2
      FROM gaps WHERE gap_d IS NOT NULL
      GROUP BY 1 HAVING count(*) >= 4 AND sum(gap_d) > 0
    )
    SELECT o_custkey AS custkey, n AS n_gaps,
           round(s1 * 1.0 / n, 2) AS mean_gap_d,
           round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n - 1)) / s1, 4)
             AS cv
    FROM moments
    ORDER BY sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n - 1)) / s1,
             o_custkey
    LIMIT 20
    """,
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-cadence regularity: the 20 repeat customers (>= 5 orders)
    whose inter-order day gaps have the lowest coefficient of
    variation - the subscription-like buyers a replenishment program
    targets first.

    The variance never leaves the integers: with BIGINT day gaps,
    n*sum(x^2) - sum(x)^2 is an exact integer numerator, so the cv is
    ONE fixed-shape double expression per customer (identical on both
    engines) ordered unrounded with a custkey tiebreak.  100 TB
    shape: one custkey-partitioned lag window, one partial-agg
    shuffle on the same key, TakeOrdered top-20."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    day = F.floor(F.col("o_orderdate").cast("double") / 86400).cast("bigint")
    gaps = o.select(
        "o_custkey",
        (day - F.lag(day).over(w)).alias("gap_d"),
    ).filter(F.col("gap_d").isNotNull())
    moments = (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("gap_d").cast("bigint").alias("s1"),
            F.sum(F.col("gap_d") * F.col("gap_d")).cast("bigint").alias("s2"),
        )
        .filter((F.col("n") >= 4) & (F.col("s1") > 0))
    )
    cv = (
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("n") - 1)
        )
        / F.col("s1")
    )
    return (
        moments.select(
            F.col("o_custkey").alias("custkey"),
            F.col("n").alias("n_gaps"),
            F.round(F.col("s1") * 1.0 / F.col("n"), 2).alias("mean_gap_d"),
            F.round(cv, 4).alias("cv"),
            cv.alias("_cv_exact"),
        )
        .orderBy("_cv_exact", "custkey")
        .limit(20)
        .drop("_cv_exact")
    )
