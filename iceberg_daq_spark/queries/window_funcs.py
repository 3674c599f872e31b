"""Q18-Q20: window functions (SURVEY section 2B).

Reference parallels: A27 (trigger-decision interval merge - the classic
gaps-and-islands plan, iceberg_daq_eth.json:239-258), A29/A31 (top-k,
newest-first).  Window functions shuffle once on the partition key and
sort within partitions - no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q18_ranking_topk",
    oracle="""
    SELECT c_custkey, o_orderkey, rn, rnk, drnk
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(rank()       OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey)
    )
    WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank; latest 3 orders per customer (top-k)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@register(
    "q19_analytic_lag_lead",
    oracle="""
    SELECT o_orderkey,
           round(CAST(lag(o_totalprice)  OVER w AS DOUBLE), 2) AS prev_price,
           round(CAST(lead(o_totalprice) OVER w AS DOUBLE), 2) AS next_price,
           round(CAST(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS sliding_sum,
           round(CAST(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead plus sliding and running frame sums per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.sum("o_totalprice").over(w.rowsBetween(-2, 0)), 2).alias("sliding_sum"),
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
            ).alias("running_sum"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q20_gaps_and_islands",
    oracle="""
    WITH spans AS (
      SELECT user_id, ts, ts + INTERVAL 2 MINUTE AS te FROM events
    ), flagged AS (
      SELECT user_id, ts, te,
             CASE WHEN ts > max(te) OVER (
               PARTITION BY user_id ORDER BY ts, te
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM spans
    ), islands AS (
      SELECT user_id, ts, te,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY ts, te
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(min(ts) AS TIMESTAMP) AS island_start,
           CAST(max(te) AS TIMESTAMP) AS island_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands
    GROUP BY user_id, island
    ORDER BY user_id, island
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge of overlapping [ts, ts+2min) spans
    per stream - exactly the MLT trigger-decision merge A27
    (iceberg_daq_eth.json:239-258): overlapping candidate windows
    coalesce into one decision record.

    Plan: one shuffle on the stream key, two window passes (cummax of
    span end, then a running island counter), then a hash agg - the
    standard scalable interval-merge, no self-join.
    """
    e = load(spark, sf_dir, "events")
    spans = e.select("user_id", "ts", F.expr("ts + INTERVAL 2 MINUTE").alias("te"))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "te")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "te")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = spans.withColumn(
        "new_island",
        F.when(F.col("ts") > F.max("te").over(w_prev), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return (
        islands.groupBy("user_id", "island")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("te").alias("island_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("island").cast("long").alias("island"),
            "island_start",
            "island_end",
            "n_events",
        )
        .orderBy("user_id", "island")
    )
