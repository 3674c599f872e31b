"""Q134/Q137: effective-dated history and exact allocation.

Two warehouse shapes every finance/CRM pipeline ships: build a
slowly-changing-dimension (SCD Type 2) history from a change stream
and join facts against it point-in-time, and prorate an order-level
total across its lines EXACTLY (largest-remainder method, integer
cents) so the parts always sum to the whole.

Both queries are engineered for cross-engine determinism: the PIT
join compares native timestamps (no arithmetic), and the proration
runs entirely in BIGINT cents - ideal shares via integer div/mod -
so no double-summation order can flip an allocation between Spark
and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q134_scd2_pit_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, value, ts AS valid_from,
             lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS valid_to,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS version
      FROM events WHERE event_type = 'signup'
    )
    SELECT f.event_id, f.user_id,
           CAST(d.version AS BIGINT) AS dim_version,
           round(d.value, 2) AS state_value,
           round(f.value, 2) AS fact_value
    FROM events f
    JOIN dim d ON d.user_id = f.user_id
              AND f.ts >= d.valid_from
              AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    WHERE f.event_type = 'purchase'
    ORDER BY f.event_id
    """,
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension build + point-in-time fact join: the
    'signup' events are a per-user attribute change stream; lead()
    over (ts, event_id) turns each change into a half-open
    [valid_from, valid_to) version interval, and every 'purchase'
    fact joins the ONE version that was in effect at its timestamp -
    the as-of-history lookup every warehouse dimension serves.

    100 TB shape: the dimension is the compacted change stream -
    orders of magnitude smaller than the fact side - so the PIT join
    is an equi-join on user_id with a range residual; each fact
    matches AT MOST ONE version (the intervals partition each user's
    timeline by construction), so there is no fan-out and no
    post-join dedup.  The interval build is one bounded per-user
    window (lead + row_number share a single sort).  Timestamps are
    compared natively - no epoch arithmetic, no truncation - so both
    engines evaluate identical predicates.  Same family as the as-of
    join (q10) but materializing the FULL version history rather
    than the latest row."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        e.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("d_user"),
            F.col("value").alias("d_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).cast("bigint").alias("version"),
        )
    )
    facts = e.filter(F.col("event_type") == "purchase")
    return (
        facts.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            "event_id",
            "user_id",
            F.col("version").alias("dim_version"),
            F.round("d_value", 2).alias("state_value"),
            F.round("value", 2).alias("fact_value"),
        )
        .orderBy("event_id")
    )


@register(
    "q137_largest_remainder_prorate",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS w
      FROM lineitem
    ), o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS target
      FROM orders
    ), base AS (
      SELECT li.l_orderkey, li.l_linenumber, o.target,
             (o.target * li.w) // sum(li.w) OVER (PARTITION BY li.l_orderkey)
               AS base_cents,
             (o.target * li.w) % sum(li.w) OVER (PARTITION BY li.l_orderkey)
               AS rem
      FROM li JOIN o ON o.o_orderkey = li.l_orderkey
    ), ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY l_orderkey ORDER BY rem DESC, l_linenumber
             ) AS rk,
             target - sum(base_cents) OVER (PARTITION BY l_orderkey)
               AS leftover
      FROM base
    ), alloc AS (
      SELECT l_orderkey, l_linenumber, target,
             base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
               AS alloc_cents
      FROM ranked
    )
    SELECT l_orderkey AS orderkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(max(target) AS BIGINT) AS target_cents,
           CAST(sum(alloc_cents) AS BIGINT) AS alloc_sum_cents,
           CAST(min(alloc_cents) AS BIGINT) AS min_alloc,
           CAST(max(alloc_cents) AS BIGINT) AS max_alloc,
           CAST(sum(alloc_cents * l_linenumber) AS BIGINT) AS alloc_checksum
    FROM alloc
    GROUP BY l_orderkey
    ORDER BY orderkey
    """,
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder proration: split each order's invoiced total
    (integer cents) across its line items proportionally to extended
    price so the per-line allocations sum EXACTLY to the order total
    - the revenue-allocation / tax-apportionment primitive where
    naive rounding leaks cents.

    Exactness across engines is by construction: every share is
    computed in BIGINT cents with integer div/mod (ideal share =
    target*w div wsum, remainder = target*w mod wsum), the leftover
    cents go to the largest remainders (ties by line number), and no
    double arithmetic exists anywhere past the initial cent
    conversion - so Spark and DuckDB agree bit-for-bit regardless of
    aggregation order.  (target <= ~5.6e7 cents, w <= ~1e7 cents:
    the cross product is < 2^60, no BIGINT overflow even under ANSI
    mode.)

    100 TB shape: one equi-join of lineitem against orders on the
    order key (co-partitioned at scale; AQE handles the skew), then
    two windows over the SAME per-order partition - bounded by max
    lines-per-order (7 in TPC-H), never data-sized.  The output is
    order-level: the alloc_checksum fold (sum of alloc x line
    number) pins every per-line allocation through the hash check
    without emitting lineitem-sized output."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("w"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("target"),
    )
    per_order = Window.partitionBy("l_orderkey")
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn("wsum", F.sum("w").over(per_order))
        .select(
            "l_orderkey",
            "l_linenumber",
            "target",
            F.expr("(target * w) div wsum").alias("base_cents"),
            ((F.col("target") * F.col("w")) % F.col("wsum")).alias("rem"),
        )
    )
    ranked = base.select(
        "l_orderkey",
        "l_linenumber",
        "target",
        "base_cents",
        F.row_number()
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("rem"), "l_linenumber"
            )
        )
        .alias("rk"),
        (F.col("target") - F.sum("base_cents").over(per_order)).alias(
            "leftover"
        ),
    )
    alloc = ranked.select(
        "l_orderkey",
        "l_linenumber",
        "target",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc_cents"),
    )
    return (
        alloc.groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.max("target").alias("target_cents"),
            F.sum("alloc_cents").alias("alloc_sum_cents"),
            F.min("alloc_cents").alias("min_alloc"),
            F.max("alloc_cents").alias("max_alloc"),
            F.sum(F.col("alloc_cents") * F.col("l_linenumber")).alias(
                "alloc_checksum"
            ),
        )
        .orderBy("orderkey")
    )
