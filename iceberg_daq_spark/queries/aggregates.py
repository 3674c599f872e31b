"""Q12-Q17: aggregation family (SURVEY section 2B).

Reference parallels: A23 (event-list agg: distinct+sort+count+min+max,
createMetadatafiles_iceberg_dropbox.sh:161-176), A28 (run/event
numbering).  All aggregations here are hash aggregates with map-side
partial aggregation - one shuffle on the group keys, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q12_hash_agg_measures",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2)      AS sum_qty,
           round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
           round(CAST(avg(l_quantity) AS DOUBLE), 2)      AS avg_qty,
           round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_price,
           round(CAST(avg(l_discount) AS DOUBLE), 2)      AS avg_disc,
           CAST(count(*) AS BIGINT)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-measure hash aggregate (the flagship query)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q13_distinct_agg",
    oracle="""
    SELECT l_partkey,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY l_partkey
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate per part (A23's sort -u analog)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("l_partkey")
    )


@register(
    "q14_rollup_grouping",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(GROUPING(n.n_name, o.o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, o.o_orderpriority)
    ORDER BY gid, n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with grouping id over (nation, order priority)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("gid", F.col("n_name").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "q15_minmax_firstlast",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT)  AS event_count,
           CAST(min(event_id) AS BIGINT) AS min_event,
           CAST(max(event_id) AS BIGINT) AS max_event,
           CAST(min(ts) AS TIMESTAMP) AS start_time,
           CAST(max(ts) AS TIMESTAMP) AS end_time,
           CAST(first(event_id ORDER BY ts, event_id) AS BIGINT) AS first_event,
           CAST(last(event_id ORDER BY ts, event_id) AS BIGINT) AS last_event
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream min/max/first/last event numbers and time bounds.

    Mirrors A23/A28 (event_count/first_event_number/last_event_number/
    start_time/end_time fields of the file-metadata docs,
    createMetadatafiles_iceberg_dropbox.sh:173-174,153-158).
    first/last are by (ts, event_id) ordering - min_by/max_by over a
    deterministic composite key.
    """
    e = load(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("event_count"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
            F.min("ts").alias("start_time"),
            F.max("ts").alias("end_time"),
            F.min_by("event_id", order_key).alias("first_event"),
            F.max_by("event_id", order_key).alias("last_event"),
        )
        .orderBy("user_id")
    )


@register("q16_approx_count_distinct", oracle=None)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) vs exact - tolerance-checked, no hash
    oracle (flagged non-hash in SURVEY 2B).  Emits both so the test can
    assert relative error < 5%."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q17_collect_sorted_list",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_events,
           array_to_string(list_sort(list(DISTINCT event_id)), ',') AS event_list
    FROM events
    WHERE value > 35
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-collect-sort-join: the A23/A30 event-list aggregation
    (`sort -u -n` + comma join, createMetadatafiles...sh:169-176)."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(F.col("value") > 35)
        .groupBy("event_type")
        .agg(
            F.countDistinct("event_id").alias("n_events"),
            F.array_join(F.sort_array(F.collect_set("event_id")), ",").alias("event_list"),
        )
        .orderBy("event_type")
    )


@register(
    "q60_pivot",
    oracle="""
    SELECT user_id % 16 AS user_bucket,
           CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS n_error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS n_view,
           round(CAST(sum(value) FILTER (event_type = 'purchase') AS DOUBLE), 2)
             AS purchase_value
    FROM events
    GROUP BY user_id % 16
    ORDER BY user_bucket
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide-format aggregation): event counts per type as
    columns, per user bucket.  The explicit value list keeps the pivot
    single-pass (no distinct-values pre-query) and the output schema
    static - the 100 TB form; conditional aggregation is its oracle
    twin."""
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        e.withColumn("user_bucket", F.col("user_id") % 16)
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("val"),
        )
    )
    cols = [F.col("user_bucket")]
    cols += [F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}") for t in types]
    cols.append(F.col("purchase_val").alias("purchase_value"))
    return pivoted.select(*cols).orderBy("user_bucket")


@register(
    "q61_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value
    FROM (
      SELECT l_orderkey, l_linenumber, 'discount' AS measure,
             CAST(l_discount AS DOUBLE) AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', CAST(l_extendedprice AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'qty', CAST(l_quantity AS DOUBLE)
      FROM lineitem
    )
    ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (q60's inverse): wide measure columns to long
    (key, measure, value) rows - one map-side pass, no shuffle until
    the presentation sort; the long form feeds per-measure profiling
    (q58) without N separate scans."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_quantity").cast("double").alias("qty"),
    )
    return (
        wide.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["discount", "price", "qty"],
            "measure",
            "value",
        )
        .withColumn("value", F.round("value", 2))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@register(
    "q67_cube_grouping_sets",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(GROUPING(n.n_name, o.o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, o.o_orderpriority)
    ORDER BY gid, n_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping sets in one pass (q14's rollup sibling -
    together they cover Spark's full grouping-sets surface).  Catalyst
    plans one Expand + partial/final hash aggregate, so the fact side
    is scanned once for all four grouping combinations."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        n, c.c_nationkey == n.n_nationkey
    )
    return (
        joined.cube("n_name", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice").cast("double"), 2).alias("total_price"),
        )
        .select("n_name", "o_orderpriority", "gid", "n_orders", "total_price")
        .orderBy(
            "gid",
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q124_top_supplier_view",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a quarterly revenue view over
    lineitem, then the supplier(s) whose revenue equals the view's
    max - the classic view + scalar-subquery-on-aggregate shape.

    100 TB shape: the revenue view is one filtered partial-agg
    shuffle (the shipdate predicate pushes to the parquet scan); the
    scalar max is an aggregation of the ALREADY-REDUCED per-supplier
    table broadcast back as a one-row filter, and the supplier join
    is a dim-side hash join.  Revenue is rounded to 2 on both
    engines BEFORE the max-equality compare so float summation
    order cannot split the tie."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    li.createOrReplaceTempView("v_q124_lineitem")
    s.createOrReplaceTempView("v_q124_supplier")
    return spark.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM v_q124_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM v_q124_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """)


_PROFILE_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate",
]


@register(
    "q127_column_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
            CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT {c}) AS BIGINT)   AS n_distinct
            FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name",
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE shape): per column of
    lineitem, null count and exact distinct count - the statistics
    pass every warehouse runs before cost-based planning, and the
    data-quality profile every ingestion job logs.

    100 TB shape: the Spark side computes ALL columns' null counts
    in ONE scan (a single partial+final agg row), and the distinct
    counts as one count-distinct agg per column over the same
    cached scan - the oracle re-scans per column, which is exactly
    the n-passes-for-n-columns cost this formulation avoids.  At
    true scale the documented substitute for exact distincts is
    approx_count_distinct (q16's HLL sketch, one pass for ALL
    columns); exact is the oracle-matched calibration path here."""
    li = load(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    nulls_row = li.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(c).alias(f"nn_{c}") for c in _PROFILE_COLS],
    )
    # distinct counts: one expand-based agg (Spark plans multiple
    # count-distincts as a single Expand + two-level aggregate - one
    # scan, not len(cols) scans)
    dist_row = li.agg(
        *[F.countDistinct(c).alias(f"nd_{c}") for c in _PROFILE_COLS]
    )
    row = nulls_row.crossJoin(F.broadcast(dist_row))
    pairs = []
    for c in _PROFILE_COLS:
        pairs += [
            F.lit(c),
            F.struct(
                (F.col("_n") - F.col(f"nn_{c}")).cast("bigint").alias("n_nulls"),
                F.col(f"nd_{c}").cast("bigint").alias("n_distinct"),
            ),
        ]
    return (
        row.select(
            F.explode(F.create_map(*pairs)).alias("col_name", "stats")
        )
        .select(
            "col_name",
            F.col("stats.n_nulls").alias("n_nulls"),
            F.col("stats.n_distinct").alias("n_distinct"),
        )
        .orderBy("col_name")
    )
