"""Q217-Q219: robust / weighted statistics battery.

Frequency-weighted percentiles (the aggregate shape a pre-aggregated
cell table needs - values arrive with repeat counts, not as rows),
the Theil T inequality index (the additive-decomposable cousin of
q143's Gini), and quartile-based robust spread/skew built on the
size-aware exact-percentile substrate.

Determinism discipline: the Theil entropy fold quantizes each row's
x*ln(x) term to BIGINT micro-units before summing (the q190 pattern -
no float summation-order dependence); weighted percentiles compare
against a DuckDB oracle that physically expands the frequency column,
which is exactly the semantics Spark's ``percentile(col, p, freq)``
implements; quartile arithmetic reuses grouped_exact_percentile, whose
both branches are oracle-hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows


@register(
    "q217_weighted_discount_percentiles",
    oracle="""
    WITH expanded AS (
      SELECT p.p_brand AS brand,
             CAST(round(l.l_discount * 100) AS BIGINT) AS disc_pts
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey,
      UNNEST(generate_series(1, CAST(round(l.l_quantity) AS BIGINT)))
    )
    SELECT brand,
           CAST(count(*) AS BIGINT) AS total_qty,
           round(quantile_cont(disc_pts, 0.25), 2) AS w_p25,
           round(quantile_cont(disc_pts, 0.5), 2) AS w_median,
           round(quantile_cont(disc_pts, 0.75), 2) AS w_p75
    FROM expanded GROUP BY brand ORDER BY brand
    """,
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted discount percentiles per brand: every unit
    sold votes for its line's discount level, so the median answers
    "at what discount does the MEDIAN UNIT of this brand move" - the
    volume-weighted pricing read (an unweighted median over lines
    over-counts small orders).

    Spark's ``percentile(col, p, frequency)`` aggregates the weighted
    distribution WITHOUT expanding rows - the frequency column is
    exact repeat-count semantics, which the oracle mirrors by
    physically UNNEST-expanding each line l_quantity times.  100 TB
    shape: the part dim broadcasts, one partial-agg pass buffers
    (value, weight) pairs per 25-brand group - the same bounded-group
    calibration posture as q74; for unbounded groups the documented
    substitute is expanding weights into q58's mergeable sketch."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_quantity"
    )
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pts"),
        F.round("l_quantity").cast("bigint").alias("qty"),
    )
    return (
        cells.groupBy("brand")
        .agg(
            F.sum("qty").cast("bigint").alias("total_qty"),
            F.expr(
                "percentile(disc_pts, array(0.25, 0.5, 0.75), qty)"
            ).alias("_w"),
        )
        .select(
            "brand",
            "total_qty",
            F.round(F.element_at("_w", 1), 2).alias("w_p25"),
            F.round(F.element_at("_w", 2), 2).alias("w_median"),
            F.round(F.element_at("_w", 3), 2).alias("w_p75"),
        )
        .orderBy("brand")
    )


@register(
    "q218_theil_inequality",
    oracle="""
    WITH x AS (
      SELECT n.n_name AS nation,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents,
             CAST(round((c.c_acctbal * ln(c.c_acctbal)) * 1000000)
                  AS BIGINT) AS xlnx_u
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE c.c_acctbal > 0
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(cents) / 100.0, 2) AS total_balance,
           round(
             (sum(xlnx_u) / 1000000.0) / (sum(cents) / 100.0)
             - ln((sum(cents) / 100.0) / count(*)), 4) AS theil_t
    FROM x GROUP BY nation ORDER BY nation
    """,
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of positive account balances per
    nation: T = E[(x/mu) ln(x/mu)] = sum(x ln x)/sum(x) - ln(mu).
    Unlike q143's Gini (which needs a full rank pass), Theil folds in
    ONE partial-agg scan and decomposes additively across subgroups -
    the inequality read that scales to any group count.

    Determinism: each row's x*ln(x) quantizes to BIGINT micro-units
    before summing (the q190 micro-nat pattern), balances sum as exact
    cents, and the final index is one fixed-shape double expression -
    no float fold whose summation order could differ across engines.
    100 TB shape: nation broadcasts, one combinable aggregate, 25 rows
    out."""
    c = load(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    bal = F.col("c_acctbal")
    x = (
        c.filter(bal > 0)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.round(bal * 100).cast("bigint").alias("cents"),
            F.round((bal * F.log(bal)) * 1_000_000)
            .cast("bigint")
            .alias("xlnx_u"),
        )
    )
    total = F.sum("cents") / 100.0
    return (
        x.groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(total, 2).alias("total_balance"),
            F.round(
                (F.sum("xlnx_u") / 1_000_000.0) / total
                - F.log(total / F.count("*")),
                4,
            ).alias("theil_t"),
        )
        .orderBy("nation")
    )


@register(
    "q219_robust_spread",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(o_totalprice, 0.5), 2) AS median_total,
           round(quantile_cont(o_totalprice, 0.75)
                 - quantile_cont(o_totalprice, 0.25), 2) AS iqr,
           round((quantile_cont(o_totalprice, 0.75)
                  + quantile_cont(o_totalprice, 0.25)
                  - 2 * quantile_cont(o_totalprice, 0.5))
                 / (quantile_cont(o_totalprice, 0.75)
                    - quantile_cont(o_totalprice, 0.25)), 4)
             AS bowley_skew
    FROM orders GROUP BY o_orderpriority ORDER BY priority
    """,
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust spread and skew of order totals per priority: exact
    quartiles, interquartile range, and Bowley's quartile skewness
    ((q3 + q1 - 2*median) / iqr) - the outlier-immune distribution
    read (variance-based spread is dominated by the top orders;
    quartiles are not).

    Rides :func:`operators.ranking.grouped_exact_percentile` with the
    orders row count as the metadata size bound: the buffered
    aggregate at test scale, the distributed two-pass rank selection
    for 5-priority groups over billions of orders - identical answers
    either way (both branches oracle-hash-verified).  All derived
    stats are fixed-shape arithmetic over the three quartiles."""
    o = load(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    res = grouped_exact_percentile(
        o.withColumnRenamed("o_orderpriority", "priority"),
        ["priority"],
        [
            ("o_totalprice", 0.25, "_q1"),
            ("o_totalprice", 0.5, "_q2"),
            ("o_totalprice", 0.75, "_q3"),
        ],
        extra_aggs=[F.count("*").cast("bigint").alias("n_orders")],
        input_rows=table_rows(sf_dir, "orders"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    return res.select(
        "priority",
        "n_orders",
        F.round("_q2", 2).alias("median_total"),
        F.round(iqr, 2).alias("iqr"),
        F.round((F.col("_q3") + F.col("_q1") - 2 * F.col("_q2")) / iqr, 4).alias(
            "bowley_skew"
        ),
    ).orderBy("priority")
