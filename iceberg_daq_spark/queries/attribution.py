"""Q205-Q206: position-based attribution and referential integrity.

The U-shaped multi-touch attribution that completes the attribution
family (q126/q167 are last-touch), and the cross-table referential
integrity audit that completes the data-quality family (q102 is
per-column checks, q197 is financial reconciliation).

Determinism: credits quantize per (purchase, touch) to BIGINT
micro-cents from a fixed-shape double (cents x weight / k), so
channel roll-ups are exact integer sums; the RI audit is pure
anti-join counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q205_position_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS jgrp
      FROM events
    ), touches AS (
      SELECT user_id, jgrp, event_type AS channel, ts, event_id,
             row_number() OVER (PARTITION BY user_id, jgrp
               ORDER BY ts, event_id) AS pos,
             CAST(count(*) OVER (PARTITION BY user_id, jgrp)
                  AS BIGINT) AS k
      FROM ev WHERE is_p = 0 AND jgrp > 0
    ), purch AS (
      SELECT user_id, jgrp, cents
      FROM ev WHERE is_p = 1 AND jgrp > 0
    ), credited AS (
      SELECT t.channel,
             CAST(round(p.cents * (CASE
               WHEN t.k = 1 THEN 1.0
               WHEN t.k = 2 THEN 0.5
               WHEN t.pos = 1 OR t.pos = t.k THEN 0.4
               ELSE 0.2 / (t.k - 2) END) * 10000) AS BIGINT)
               AS microcents
      FROM purch p
      JOIN touches t ON t.user_id = p.user_id AND t.jgrp = p.jgrp
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_credits,
           round(sum(microcents) / 1000000.0, 2) AS revenue
    FROM credited GROUP BY 1 ORDER BY 1
    """,
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each
    purchase's revenue splits 40% to the first touch, 40% to the
    last, 20% across the middles (100%/50-50 for 1/2-touch journeys)
    over the touches since the user's previous purchase - the
    fairer sibling of q126/q167's last-touch.

    Journeys are delimited WITHOUT a self-join: a reverse cumulative
    count of purchases (frame CURRENT ROW..UNBOUNDED FOLLOWING) gives
    every event the id of the purchase that closes its journey, so
    one user-partitioned sort yields journey ids, positions, and
    sizes.  Credits quantize per (purchase, touch) to BIGINT
    micro-cents (fixed-shape weight expression over exact integers),
    making the channel roll-up order-insensitive.  100 TB shape: two
    window passes + one (user, journey)-keyed join over the SAME
    partitioning, then a 5-group agg."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrev = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ev = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        is_p.alias("is_p"),
        F.sum(is_p).over(wrev).cast("bigint").alias("jgrp"),
    )
    wj = Window.partitionBy("user_id", "jgrp").orderBy("ts", "event_id")
    touches = ev.filter((F.col("is_p") == 0) & (F.col("jgrp") > 0)).select(
        "user_id",
        "jgrp",
        F.col("event_type").alias("channel"),
        F.row_number().over(wj).alias("pos"),
        F.count("*")
        .over(Window.partitionBy("user_id", "jgrp"))
        .cast("bigint")
        .alias("k"),
    )
    purch = ev.filter((F.col("is_p") == 1) & (F.col("jgrp") > 0)).select(
        "user_id", "jgrp", "cents"
    )
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
    )
    credited = purch.join(touches, ["user_id", "jgrp"]).select(
        "channel",
        F.round(F.col("cents") * weight * 10000).cast("bigint").alias(
            "microcents"
        ),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_credits"),
            F.round(F.sum("microcents") / 1_000_000.0, 2).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "q206_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    ORDER BY 1
    """,
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts across the star
    schema's five foreign keys - the cross-table completeness check
    that q102's per-column rules and q197's financial recon don't
    cover (a pipeline that drops a dimension partition shows up HERE
    first).

    100 TB shape: each edge is one LEFT ANTI join on the FK (dims
    broadcast; the fact-fact edge co-partitions on the orderkey);
    counts are partial-agg single rows unioned into the 5-row
    report.  The two fact tables pin their FK projections ONCE with
    localCheckpoint - each fact's three/two edges (plus their n_rows
    legs) re-read the pinned columns, so the facts are scanned once
    each instead of 2x-per-edge (15 scans before, ~2 after)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .localCheckpoint()
    )
    od = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .localCheckpoint()
    )
    cu = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .localCheckpoint()  # both a dim (custkey) and a fact (nationkey edge)
    )
    pt = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")

    def edge(fk: str, fact: DataFrame, key, dim: DataFrame, dkey, bcast: bool):
        d = F.broadcast(dim) if bcast else dim
        orphans = fact.join(d, key == dkey, "left_anti")
        return (
            fact.agg(F.count("*").cast("bigint").alias("n_rows"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(
                        F.count("*").cast("bigint").alias("n_orphans")
                    )
                )
            )
            .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
        )

    report = (
        edge(
            "lineitem->orders",
            li.select("l_orderkey"),
            F.col("l_orderkey"),
            od.select("o_orderkey"),
            F.col("o_orderkey"),
            False,
        )
        .unionByName(
            edge(
                "lineitem->part",
                li.select("l_partkey"),
                F.col("l_partkey"),
                pt.select("p_partkey"),
                F.col("p_partkey"),
                True,
            )
        )
        .unionByName(
            edge(
                "lineitem->supplier",
                li.select("l_suppkey"),
                F.col("l_suppkey"),
                su.select("s_suppkey"),
                F.col("s_suppkey"),
                True,
            )
        )
        .unionByName(
            edge(
                "orders->customer",
                od.select("o_custkey"),
                F.col("o_custkey"),
                cu.select("c_custkey"),
                F.col("c_custkey"),
                True,
            )
        )
        .unionByName(
            edge(
                "customer->nation",
                cu.select("c_nationkey"),
                F.col("c_nationkey"),
                na.select("n_nationkey"),
                F.col("n_nationkey"),
                True,
            )
        )
    )
    return report.orderBy("fk")
