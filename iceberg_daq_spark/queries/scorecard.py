"""Q212-Q213: the scorecard & engine-diagnostics battery.

A multi-grain supplier scorecard (three independent aggregations
assembled on the supplier key) and a join-key skew audit (the
distribution diagnostics a 100 TB engine runs BEFORE picking join
strategies - the numbers that decide salting, AQE skew-join
thresholds, and broadcast eligibility).

Determinism: every metric divides exact BIGINT counts/cents; skew
factors cross-multiply (max * n_keys vs sum) before the one display
division; top keys tie-break on the key value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q212_supplier_scorecard",
    oracle="""
    WITH vol AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS disc_pts
      FROM lineitem GROUP BY 1
    ), rets AS (
      SELECT l_suppkey,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS t_cents FROM vol
    )
    SELECT v.l_suppkey AS suppkey, s.s_name AS sname,
           round(v.cents / 100.0, 2) AS revenue,
           round(v.cents * 1.0 / t.t_cents, 4) AS rev_share,
           round(v.disc_pts * 1.0 / v.n_lines, 2) AS avg_disc_pts,
           round(r.n_returned * 1.0 / v.n_lines, 4) AS return_rate
    FROM vol v
    JOIN rets r ON r.l_suppkey = v.l_suppkey
    JOIN supplier s ON s.s_suppkey = v.l_suppkey
    CROSS JOIN tot t
    ORDER BY v.cents DESC, v.l_suppkey
    LIMIT 20
    """,
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: revenue, revenue share, average discount
    given, and return rate per supplier - the multi-metric vendor
    review assembled from independent aggregations on one key.

    100 TB shape: BOTH metric families reduce in the SAME supplier-
    grain aggregation pass wherever the grain allows (here the return
    counts ride the same groupBy in the Spark plan via a single
    aggregate - the SQL spells them as separate CTEs for clarity and
    DuckDB re-merges them); the reduction is pinned so the total and
    the scorecard both read it; supplier names broadcast; top-20 is
    TakeOrdered on exact cents."""
    li = load(spark, sf_dir, "lineitem")
    vol = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.round(F.col("l_discount") * 100).cast("bigint"))
            .cast("bigint")
            .alias("disc_pts"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_returned"),
        )
        .localCheckpoint()
    )
    tot = vol.agg(F.sum("cents").cast("bigint").alias("t_cents"))
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return (
        vol.join(F.broadcast(s), "suppkey")
        .crossJoin(F.broadcast(tot))
        .select(
            "suppkey",
            F.col("s_name").alias("sname"),
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("cents") * 1.0 / F.col("t_cents"), 4).alias(
                "rev_share"
            ),
            F.round(F.col("disc_pts") * 1.0 / F.col("n_lines"), 2).alias(
                "avg_disc_pts"
            ),
            F.round(F.col("n_returned") * 1.0 / F.col("n_lines"), 4).alias(
                "return_rate"
            ),
            F.col("cents").alias("_c_exact"),
        )
        .orderBy(F.col("_c_exact").desc(), "suppkey")
        .limit(20)
        .drop("_c_exact")
    )


@register(
    "q213_join_skew_audit",
    oracle="""
    WITH audits AS (
      SELECT 'lineitem.l_orderkey' AS join_key, l_orderkey AS k
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
      UNION ALL
      SELECT 'orders.o_custkey', o_custkey FROM orders
      UNION ALL
      SELECT 'events.user_id', user_id FROM events
    ), per_key AS (
      SELECT join_key, k, CAST(count(*) AS BIGINT) AS c
      FROM audits GROUP BY 1, 2
    )
    SELECT join_key,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_per_key,
           round(max(c) * count(*) * 1.0 / sum(c), 2) AS skew_factor,
           CAST(min(CASE WHEN c = mx THEN k END) AS BIGINT) AS heaviest_key
    FROM (SELECT join_key, k, c,
                 CAST(max(c) OVER (PARTITION BY join_key) AS BIGINT) AS mx
          FROM per_key)
    GROUP BY 1 ORDER BY 1
    """,
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: for every major join key, the key count,
    max rows per key, skew factor (max / mean, cross-multiplied), and
    the heaviest key - the pre-flight diagnostics that decide salting
    (q59), AQE skew-join thresholds, and broadcast eligibility at
    100 TB (a skew factor near 1 shuffles cleanly; 100x means the
    hottest task does 100x the median's work).

    100 TB shape: each audit is one partial-agg pass per source
    column, unioned at the KEY grain (the union carries (key, count)
    rows, never raw rows twice); the heaviest key resolves by an
    integer window max with a min-key tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")

    def audit(tag: str, df: DataFrame, col: str) -> DataFrame:
        return (
            df.groupBy(F.col(col).alias("k"))
            .agg(F.count("*").cast("bigint").alias("c"))
            .select(F.lit(tag).alias("join_key"), "k", "c")
        )

    per_key = (
        audit("lineitem.l_orderkey", li, "l_orderkey")
        .unionByName(audit("lineitem.l_partkey", li, "l_partkey"))
        .unionByName(audit("lineitem.l_suppkey", li, "l_suppkey"))
        .unionByName(audit("orders.o_custkey", od, "o_custkey"))
        .unionByName(audit("events.user_id", ev, "user_id"))
    )
    from pyspark.sql import Window

    wk = Window.partitionBy("join_key")
    marked = per_key.select(
        "join_key",
        "k",
        "c",
        F.max("c").over(wk).cast("bigint").alias("mx"),
    )
    return (
        marked.groupBy("join_key")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.max("c").cast("bigint").alias("max_per_key"),
            F.round(
                F.max("c") * F.count("*") * 1.0 / F.sum("c"), 2
            ).alias("skew_factor"),
            F.min(F.when(F.col("c") == F.col("mx"), F.col("k")))
            .cast("bigint")
            .alias("heaviest_key"),
        )
        .orderBy("join_key")
    )
