"""Q3-Q11: the join family (SURVEY section 2B).

Reference parallels: A13 (anti join, sidecar skip), A19 (interval join),
A20/A21 (broadcast lookup joins), A22 (config composition).

Scale notes (100 TB): region/nation are constant-size -> always
broadcast.  part/supplier scale with SF but stay far below fact tables
-> explicit broadcast hint where the reference semantics are a dim
lookup; everything else left to Catalyst/AQE (sort-merge with runtime
skew splitting).  The range join (q09) is an equi-join on the stream key
plus a range residual, so it shuffles once on user_id - the same
partition-by-stream layout the reference's per-stream latency buffers
use (iceberg_daq_eth.json:160).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q03_inner_join_agg",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders x customer, grouped by market segment."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q04_broadcast_join",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 10
    GROUP BY p.p_brand
    ORDER BY p_brand
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x small-dim join with an explicit broadcast hint (A21 analog)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "q05_multiway_join",
    oracle="""
    SELECT n.n_name,
           round(CAST(sum(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table chain (TPC-H Q5 shape); constant dims broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q06_left_outer_join",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_customers_no_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


@register(
    "q07_left_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    )
    ORDER BY c_custkey
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers having >=1 order in 1995."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q08_left_anti_join",
    oracle="""
    SELECT p.p_partkey, p.p_name
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    ORDER BY p_partkey
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): parts never ordered.

    Mirrors A13 - the sidecar-exists skip in
    createMetadatafiles_iceberg_dropbox.sh:109.
    """
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@register(
    "q09_range_join",
    oracle="""
    SELECT e1.user_id AS user_id,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >= e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 MINUTE
     AND e1.event_id < e2.event_id
    GROUP BY e1.user_id
    ORDER BY e1.user_id
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join: event pairs within 1 minute on the same stream.

    Mirrors A19 (readout-window interval join,
    iceberg_daq_eth.json:252-258): equi-join on the stream key plus a
    time-range residual, so the only shuffle is on user_id.
    """
    e = load(spark, sf_dir, "events")
    e1 = e.select(
        F.col("user_id"), F.col("ts").alias("ts1"), F.col("event_id").alias("id1")
    )
    e2 = e.select(
        F.col("user_id").alias("user_id2"), F.col("ts").alias("ts2"), F.col("event_id").alias("id2")
    )
    return (
        e1.join(
            e2,
            (e1.user_id == e2.user_id2)
            & (e2.ts2 >= e1.ts1)
            & (e2.ts2 <= F.col("ts1") + F.expr("INTERVAL 1 MINUTE"))
            & (e1.id1 < e2.id2),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "q10_asof_join",
    oracle="""
    SELECT event_id,
           last_value(err_id IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_error_id
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN event_id END AS err_id
      FROM events
    )
    ORDER BY event_id
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest preceding 'error' event per stream at each event.

    Mirrors A21 (latest-config-effective-at-timestamp enrichment) as a
    single-pass window instead of a join: sort within stream partitions,
    carry the last non-null marker forward.  At scale this is one
    shuffle on the stream key - no N x M join blowup.
    """
    e = load(spark, sf_dir, "events")
    marked = e.withColumn(
        "err_id", F.when(F.col("event_type") == "error", F.col("event_id"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("last_error_id", F.last("err_id", ignorenulls=True).over(w))
        .select("event_id", "last_error_id")
        .orderBy("event_id")
    )


@register(
    "q11_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    ORDER BY r_name, n_name
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of the two constant-size dims (5 x 25 rows)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


@register(
    "q59_salted_join",
    oracle="""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(l.l_extendedprice) AS DOUBLE), 2) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY s_nationkey
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe salted join: lineitem x supplier through
    operators.skew.salted_join, aggregated per supplier nation.

    The oracle is the PLAIN unsalted join - the hash-match proves the
    salt/replicate/join/drop pipeline is row-identical to a vanilla
    equi-join while spreading any hot supplier key over SALT shuffle
    sub-keys (what AQE's skew splitting cannot do when a single key
    dominates a task)."""
    from iceberg_daq_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    fact = li.select(F.col("l_suppkey").alias("suppkey"), "l_extendedprice")
    dim = s.select(F.col("s_suppkey").alias("suppkey"), "s_nationkey")
    return (
        salted_join(fact, dim, ["suppkey"])
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "q62_correlated_subquery",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_below,
           round(CAST(sum(l.l_extendedprice) AS DOUBLE), 2) AS below_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
    )
    GROUP BY p.p_brand
    ORDER BY p_brand
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems below
    half their part's average quantity, aggregated per brand.  Written
    as SQL so Catalyst's subquery decorrelation plans it - the
    correlated aggregate rewrites to one per-part average join, not a
    per-row re-scan of lineitem (the plan guard asserts a single
    decorrelated aggregate, no nested-loop)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql("""
        SELECT p.p_brand,
               count(*) AS n_below,
               round(sum(l.l_extendedprice), 2) AS below_revenue
        FROM v_lineitem l JOIN v_part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM v_lineitem l2
          WHERE l2.l_partkey = p.p_partkey
        )
        GROUP BY p.p_brand
        ORDER BY p_brand
    """)


@register(
    "q119_full_outer_reconcile",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, day
    ), x AS (
      SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error' GROUP BY user_id, day
    )
    SELECT coalesce(p.user_id, x.user_id) AS user_id,
           coalesce(p.day, x.day)         AS day,
           coalesce(p.n, 0)               AS n_purchase,
           coalesce(x.n, 0)               AS n_error,
           CASE WHEN p.user_id IS NULL THEN 'error_only'
                WHEN x.user_id IS NULL THEN 'purchase_only'
                ELSE 'both' END           AS status
    FROM p FULL OUTER JOIN x
      ON p.user_id = x.user_id AND p.day = x.day
    ORDER BY user_id, day
    """,
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two sparse per-(user, day)
    series - purchases vs errors - the ledger-vs-ledger diff every
    reconciliation job runs: rows present on either side survive,
    absent sides zero-fill, and a status column says which.
    Completes the join family: inner/broadcast/left-outer/semi/
    anti/cross/range/as-of are q03-q11, full outer is here.

    100 TB shape: both inputs pre-reduce to (user, day) cells before
    the join (partial-agg shuffles), then ONE sort-merge full outer
    join on the composite key; both sides arrive hash-partitioned on
    that same key so the join reuses the aggregation exchange.  The
    coalesce/status projection is map-side.  Day indexes are
    epoch-day arithmetic (timezone-proof across engines)."""
    e = load(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("day")

    def side(kind: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == kind)
            .groupBy("user_id", day)
            .agg(F.count("*").cast("bigint").alias("n"))
        )

    p = side("purchase").withColumnRenamed("n", "np")
    x = side("error").withColumnRenamed("n", "nx")
    return (
        p.join(x, ["user_id", "day"], "full_outer")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("np"), F.lit(0).cast("bigint")).alias("n_purchase"),
            F.coalesce(F.col("nx"), F.lit(0).cast("bigint")).alias("n_error"),
            F.when(F.col("np").isNull(), F.lit("error_only"))
            .when(F.col("nx").isNull(), F.lit("purchase_only"))
            .otherwise(F.lit("both"))
            .alias("status"),
        )
        .orderBy("user_id", "day")
    )
