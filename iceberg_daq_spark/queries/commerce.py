"""Q151-Q154: the commerce-operations battery.

Shipping-SLA percentiles, discount elasticity, supplier-concentration
HHI, and the day-of-week x hour activity heatmap - the four reads an
order-flow warehouse answers daily.  Same determinism discipline as
queries/stats.py: exact integer units (days, cents, discount points,
epoch buckets) everywhere, doubles only in final fixed-shape ratios
or bounded, rounded reductions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows


@register(
    "q151_shipping_sla",
    oracle="""
    WITH sla AS (
      SELECT o.o_orderpriority AS priority,
             CAST(floor((epoch(l.l_shipdate) - epoch(o.o_orderdate))
                        / 86400) AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(quantile_cont(days, 0.5), 2) AS p50_days,
           round(quantile_cont(days, 0.9), 2) AS p90_days,
           round(quantile_cont(days, 0.99), 2) AS p99_days,
           round(avg(CASE WHEN days > 90 THEN 1.0 ELSE 0.0 END), 4)
             AS pct_over_90d
    FROM sla GROUP BY priority ORDER BY priority
    """,
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping SLA percentiles per order priority: order-to-ship
    latency in whole days, its p50/p90/p99, and the share of lines
    blowing a 90-day SLA - the fulfillment-performance read that
    validates whether priority classes actually ship faster.

    Latencies are exact integer days (epoch subtraction, floor
    division - no calendar arithmetic); percentiles run through the
    size-aware ``grouped_exact_percentile``: the buffered exact
    aggregate while the 5 priority groups are small, the distributed
    two-pass rank selection once a group outgrows one task's sort
    (the 100 TB case - this is LINEITEM grain, billions of rows per
    priority).  One shuffle join on the order key (co-partitioned at
    scale), one grouped agg."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    sla = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(
            (
                F.col("l_shipdate").cast("double")
                - F.col("o_orderdate").cast("double")
            )
            / 86400
        )
        .cast("bigint")
        .alias("days"),
    )
    res = grouped_exact_percentile(
        sla,
        ["priority"],
        [
            ("days", 0.5, "_p50"),
            ("days", 0.9, "_p90"),
            ("days", 0.99, "_p99"),
        ],
        extra_aggs=[
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(
                F.avg(F.when(F.col("days") > 90, 1.0).otherwise(0.0)), 4
            ).alias("pct_over_90d"),
        ],
        input_rows=table_rows(sf_dir, "lineitem"),
    )
    return res.select(
        "priority",
        "n_lines",
        F.round("_p50", 2).alias("p50_days"),
        F.round("_p90", 2).alias("p90_days"),
        F.round("_p99", 2).alias("p99_days"),
        "pct_over_90d",
    ).orderBy("priority")


@register(
    "q152_discount_elasticity",
    oracle="""
    WITH cells AS (
      SELECT p.p_brand AS brand,
             CAST(round(l.l_discount * 100) AS BIGINT) AS disc_pts,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(l.l_quantity AS BIGINT)) AS qty_sum
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY brand, disc_pts
    )
    SELECT brand,
           CAST(sum(n) AS BIGINT) AS n_lines,
           round(regr_slope(CAST(qty_sum AS DOUBLE) / n, disc_pts), 4)
             AS qty_per_disc_pt,
           round(CAST(sum(qty_sum) AS DOUBLE) / sum(n), 4) AS mean_qty
    FROM cells
    GROUP BY brand
    HAVING count(*) >= 3
    ORDER BY brand
    """,
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount elasticity per brand: regress the mean quantity per
    discount level on the discount points - does a deeper discount
    actually move more units of this brand?  The pricing-analytics
    staple, fit per group with the one-pass regr_slope aggregate.

    100 TB shape: the stream reduces to (brand, discount-level)
    cells FIRST (brands x <=11 levels - one partial-agg shuffle;
    the part dim is UNHINTED - AQE broadcasts it at this scale and
    falls back to a co-partitioned join at 100 TB), so the
    regression runs
    over a bounded cell table.  Cell means are exact (integer
    quantity sums over exact counts - a single division), and the
    per-brand slope folds <=11 such values; brands with fewer than
    3 observed levels are dropped as unfittable on both sides."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_discount") * 100)
            .cast("bigint")
            .alias("disc_pts"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        )
    )
    return (
        cells.groupBy("brand")
        .agg(
            F.sum("n").cast("bigint").alias("n_lines"),
            F.round(
                F.regr_slope(
                    F.col("qty_sum").cast("double") / F.col("n"),
                    F.col("disc_pts"),
                ),
                4,
            ).alias("qty_per_disc_pt"),
            F.round(
                F.sum("qty_sum").cast("double") / F.sum("n"), 4
            ).alias("mean_qty"),
            F.count("*").alias("_n_levels"),
        )
        .filter(F.col("_n_levels") >= 3)
        .drop("_n_levels")
        .orderBy("brand")
    )


@register(
    "q153_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY nationkey, suppkey
    ), shares AS (
      SELECT n.n_name AS nation, rev.cents,
             sum(rev.cents) OVER (PARTITION BY rev.nationkey) AS total
      FROM rev JOIN nation n ON n.n_nationkey = rev.nationkey
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum((CAST(cents AS DOUBLE) / total)
                     * (CAST(cents AS DOUBLE) / total)) * 10000, 2)
             AS hhi,
           round(max(CAST(cents AS DOUBLE) / total), 4) AS top_share
    FROM shares GROUP BY nation ORDER BY nation
    """,
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration HHI per nation: each supplier's revenue
    share squared, summed and scaled to the 0-10000 antitrust scale,
    with the single largest share alongside - the supply-chain-risk
    read (HHI > 2500 = highly concentrated market).

    Revenue accumulates as exact BIGINT cents; shares are fixed-shape
    divisions against a per-nation window total over the
    supplier-count-sized reduction; the HHI sum folds bounded
    per-nation supplier sets and rounds at 2.  100 TB shape: nation
    (constant-size) broadcast by hint, supplier UNHINTED (AQE
    broadcasts here; co-partitioned join when it scales past the
    threshold), one partial-agg shuffle to (nation, supplier) cents,
    windows and aggs over that bounded table."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    shares = rev.join(
        F.broadcast(n), rev["nationkey"] == n["n_nationkey"]
    ).select(
        F.col("n_name").alias("nation"),
        "cents",
        F.sum("cents").over(Window.partitionBy("nationkey")).alias("total"),
    )
    share = F.col("cents").cast("double") / F.col("total")
    return (
        shares.groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(F.sum(share * share) * 10000, 2).alias("hhi"),
            F.round(F.max(share), 4).alias("top_share"),
        )
        .orderBy("nation")
    )


@register(
    "q154_activity_heatmap",
    oracle="""
    WITH cells AS (
      SELECT event_type,
             CAST((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 3) % 7
                  AS BIGINT) AS dow,
             CAST(CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24
                  AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, dow, hour
    )
    SELECT event_type, dow, hour, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY event_type), 4) AS pct_of_type
    FROM cells ORDER BY event_type, dow, hour
    """,
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap per event type (0 =
    Monday, UTC buckets): the "when do users do what" grid behind
    every engagement dashboard, with each cell's share of its type.

    Bucketing is pure epoch-integer arithmetic ((epoch_day + 3) % 7
    anchors Monday without any calendar/timezone function that could
    disagree across engines).  100 TB shape: one partial-agg shuffle
    to at most types x 168 cells; the share window runs over that
    bounded grid."""
    e = load(spark, sf_dir, "events")
    epoch = F.col("ts").cast("double")
    cells = e.groupBy(
        "event_type",
        ((F.floor(epoch / 86400).cast("bigint") + 3) % 7).alias("dow"),
        (F.floor(epoch / 3600).cast("bigint") % 24).alias("hour"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    wt = Window.partitionBy("event_type")
    return cells.select(
        "event_type",
        "dow",
        "hour",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 4).alias(
            "pct_of_type"
        ),
    ).orderBy("event_type", "dow", "hour")


@register(
    "q156_mix_shift_bridge",
    oracle="""
    WITH halves AS (
      SELECT o.o_custkey, o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN epoch(o.o_orderdate) <
               (SELECT (min(epoch(o_orderdate)) + max(epoch(o_orderdate)))
                       / 2.0 FROM orders)
             THEN 1 ELSE 2 END AS half
      FROM orders o
    ), seg AS (
      SELECT c.c_mktsegment AS segment, h.half,
             CAST(count(*) AS BIGINT) AS n,
             sum(h.cents) AS cents
      FROM halves h JOIN customer c ON c.c_custkey = h.o_custkey
      GROUP BY segment, h.half
    ), wide AS (
      SELECT segment,
             sum(CASE WHEN half = 1 THEN n ELSE 0 END) AS n1,
             sum(CASE WHEN half = 2 THEN n ELSE 0 END) AS n2,
             sum(CASE WHEN half = 1 THEN cents ELSE 0 END) AS rev1,
             sum(CASE WHEN half = 2 THEN cents ELSE 0 END) AS rev2
      FROM seg GROUP BY segment
    )
    SELECT segment,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(rev1 AS BIGINT) AS rev1, CAST(rev2 AS BIGINT) AS rev2,
           CAST(rev2 - rev1 AS BIGINT) AS delta_cents,
           round((n2 - n1) * (CAST(rev1 AS DOUBLE) / n1), 2)
             AS volume_effect,
           round((CAST(rev2 AS DOUBLE) / n2 - CAST(rev1 AS DOUBLE) / n1)
                 * n2, 2) AS rate_effect
    FROM wide
    WHERE n1 > 0 AND n2 > 0
    ORDER BY segment
    """,
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift revenue bridge per market segment: the
    period-over-period revenue delta decomposed into a VOLUME effect
    (order-count change at the old average order value) and a RATE
    effect (order-value change at the new volume) - the additive
    bridge (volume + rate = delta exactly, asserted in tests) that
    finance reviews walk through before believing any growth number.

    100 TB shape: the midpoint scalar is one agg broadcast into the
    scan (a subquery the optimizer runs once); the per-(segment,
    half) reduction shuffles once (customer UNHINTED - AQE picks
    broadcast here, co-partitioned shuffle at 100 TB); the bridge
    algebra runs over segments x 2 cells.  Revenue is
    exact BIGINT cents; the two effect terms are fixed-shape doubles
    over exact sums, rounded at 2."""
    o = load(spark, sf_dir, "orders")
    mid = o.agg(
        (
            (
                F.min(F.col("o_orderdate").cast("double"))
                + F.max(F.col("o_orderdate").cast("double"))
            )
            / 2.0
        ).alias("mid")
    )
    halves = o.crossJoin(F.broadcast(mid)).select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderdate").cast("double") < F.col("mid"), 1)
        .otherwise(2)
        .alias("half"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wide = (
        halves.join(c, halves["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("half") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n2"),
            F.sum(
                F.when(F.col("half") == 1, F.col("cents")).otherwise(0)
            ).alias("rev1"),
            F.sum(
                F.when(F.col("half") == 2, F.col("cents")).otherwise(0)
            ).alias("rev2"),
        )
    )
    rate1 = F.col("rev1").cast("double") / F.col("n1")
    rate2 = F.col("rev2").cast("double") / F.col("n2")
    return (
        wide.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .select(
            "segment",
            "n1",
            "n2",
            "rev1",
            "rev2",
            (F.col("rev2") - F.col("rev1")).alias("delta_cents"),
            F.round((F.col("n2") - F.col("n1")) * rate1, 2).alias(
                "volume_effect"
            ),
            F.round((rate2 - rate1) * F.col("n2"), 2).alias("rate_effect"),
        )
        .orderBy("segment")
    )
