"""Q207-Q208: the calendar-reporting battery.

Week-over-year revenue comparison and the open-order backlog curve -
the two standing reads of a weekly business review, and two distinct
plan shapes: a self-join on a shifted integer week key, and a
sweep-line (+1/-1 prefix sum) that counts interval overlaps without
an interval join.

Determinism: weeks are integer epoch-weeks (epoch-day // 7 - no
ISO-week year-boundary ambiguity across engines); revenue is exact
BIGINT cents; the backlog is a pure integer prefix sum over the day
grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q207_weekly_yoy",
    oracle="""
    WITH wk AS (
      SELECT CAST(floor(epoch(o_orderdate) / 604800) AS BIGINT) AS w,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT cur.w AS week,
           round(cur.cents / 100.0, 2) AS revenue,
           cur.n_orders,
           round(prior.cents / 100.0, 2) AS revenue_prior_year,
           round((cur.cents - prior.cents) * 1.0 / prior.cents, 4)
             AS yoy_delta
    FROM wk cur JOIN wk prior ON prior.w = cur.w - 52
    ORDER BY cur.w
    """,
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-year revenue: each epoch-week's order revenue against
    the week 52 weeks earlier - the weekly-business-review table
    (epoch-weeks sidestep the ISO-week year-boundary ambiguity that
    makes naive weekofyear() comparisons disagree between engines).

    100 TB shape: orders reduce to the WEEK grain (partial agg,
    time-span-sized) and the reduction is pinned with localCheckpoint
    so the 52-week-shift self-join reads it twice - the fact table
    scans once; all deltas divide exact BIGINT cents."""
    o = load(spark, sf_dir, "orders")
    wk = (
        o.groupBy(
            F.floor(F.col("o_orderdate").cast("double") / 604800)
            .cast("bigint")
            .alias("w")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
        .localCheckpoint()
    )
    prior = wk.select(
        (F.col("w") + 52).alias("pw"),
        F.col("cents").alias("p_cents"),
    )
    return (
        wk.join(prior, F.col("w") == F.col("pw"))
        .select(
            F.col("w").alias("week"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            "n_orders",
            F.round(F.col("p_cents") / 100.0, 2).alias("revenue_prior_year"),
            F.round(
                (F.col("cents") - F.col("p_cents")) * 1.0 / F.col("p_cents"),
                4,
            ).alias("yoy_delta"),
        )
        .orderBy("week")
    )


@register(
    "q208_order_backlog",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS d0,
             CAST(max(floor(epoch(l.l_shipdate) / 86400)) AS BIGINT) AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), deltas AS (
      SELECT d0 AS d, CAST(count(*) AS BIGINT) AS opened,
             CAST(0 AS BIGINT) AS closed
      FROM spans GROUP BY 1
      UNION ALL
      SELECT d1 + 1 AS d, CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
      FROM spans GROUP BY 1
    ), grid AS (
      SELECT d, CAST(sum(opened) AS BIGINT) AS opened,
             CAST(sum(closed) AS BIGINT) AS closed
      FROM deltas GROUP BY 1
    ), curve AS (
      SELECT d, opened, closed,
             CAST(sum(opened - closed) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS backlog
      FROM grid
    )
    SELECT d AS day, opened, closed, backlog
    FROM curve
    ORDER BY backlog DESC, d
    LIMIT 20
    """,
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog curve: an order is open from its order date
    until its last line ships; report the 20 peak-backlog days - the
    operations read behind staffing and capacity planning.

    The overlap count is a SWEEP-LINE, not an interval join: every
    order contributes +1 at its open day and -1 after its close day,
    the day grid aggregates those deltas, and a prefix sum walks the
    grid - O(orders) work plus a time-span-sized window, where the
    naive day-in-span join fans out O(orders x span).  All integers.

    100 TB shape: lineitem pre-aggregates to order grain on the
    orderkey join (co-partitioned), the delta table is at most
    2 x days after its partial agg, and the prefix window runs over
    the bounded grid.  Top-20 by exact integer backlog."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.floor(F.col("o_orderdate").cast("double") / 86400)
            .cast("bigint")
            .alias("d0"),
        )
        .agg(
            F.max(
                F.floor(F.col("l_shipdate").cast("double") / 86400).cast(
                    "bigint"
                )
            ).alias("d1"),
        )
        .localCheckpoint()  # order-grain; opened/closed both read it
    )
    opened = spans.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").cast("bigint").alias("opened"),
        F.lit(0).cast("bigint").alias("closed"),
    )
    closed = spans.groupBy((F.col("d1") + 1).alias("d")).agg(
        F.lit(0).cast("bigint").alias("opened"),
        F.count("*").cast("bigint").alias("closed"),
    )
    grid = (
        opened.unionByName(closed)
        .groupBy("d")
        .agg(
            F.sum("opened").cast("bigint").alias("opened"),
            F.sum("closed").cast("bigint").alias("closed"),
        )
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.select(
            F.col("d").alias("day"),
            "opened",
            "closed",
            F.sum(F.col("opened") - F.col("closed"))
            .over(wcum)
            .cast("bigint")
            .alias("backlog"),
        )
        .orderBy(F.col("backlog").desc(), "day")
        .limit(20)
    )