"""Q191-Q198: the commerce-economics battery.

ABC (Pareto) inventory classification, customer-segment migration,
per-customer brand concentration, new-vs-returning revenue, repeat
purchase cadence, price-band mix, order-total reconciliation, and a
Laspeyres price index - the economics reads over the TPC-H-shaped
tables that round out queries/commerce.py and queries/tpch_ext.py.

Determinism discipline (the queries/stats.py model): revenue reduces
in exact BIGINT cents (or cents x discount points); cumulative-share
class boundaries cross-multiply in integers (100*cum <= 80*total);
per-part index terms quantize to BIGINT micro-units before summing
(the q190 pattern); the one bounded float fold (per-customer HHI,
<= 25 brand terms) follows q153's rounding discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows


_REV_U_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _rev_u():
    return F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )


@register(
    "q191_abc_classification",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, CAST(sum({_REV_U_SQL}) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(rev) AS BIGINT) AS total FROM pr
    ), ranked AS (
      SELECT rev,
             CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM pr
    )
    SELECT CASE WHEN 100 * cum <= 80 * t.total THEN 'A'
                WHEN 100 * cum <= 95 * t.total THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev) / 10000.0, 2) AS revenue,
           round(sum(rev) * 1.0 / t.total, 4) AS rev_share
    FROM ranked CROSS JOIN tot t
    GROUP BY 1, t.total ORDER BY 1
    """,
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts ranked by revenue, class A
    while the cumulative share stays within 80%, B to 95%, C beyond -
    the inventory-prioritization read ("20% of SKUs carry 80% of
    revenue").

    Class boundaries cross-multiply in integers (100*cum <= 80*total)
    so no float share ever decides a class.  100 TB shape: lineitem
    reduces to part grain first (partial agg), that dim-sized
    reduction is pinned (total + ranking both read it), and the
    cumulative window runs over parts - dimension-sized, never fact-
    sized (documented tolerable global sort, same posture as q74)."""
    li = load(spark, sf_dir, "lineitem")
    pr = (
        li.groupBy("l_partkey")
        .agg(F.sum(_rev_u()).cast("bigint").alias("rev"))
        .localCheckpoint()
    )
    tot = pr.agg(F.sum("rev").cast("bigint").alias("total"))
    wcum = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = pr.select("rev", F.sum("rev").over(wcum).cast("bigint").alias("cum"))
    abc = (
        F.when(100 * F.col("cum") <= 80 * F.col("total"), "A")
        .when(100 * F.col("cum") <= 95 * F.col("total"), "B")
        .otherwise("C")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(abc.alias("abc_class"), "total")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("rev") / 10000.0, 2).alias("revenue"),
            F.round(F.sum("rev") * 1.0 / F.col("total"), 4).alias("rev_share"),
        )
        .drop("total")
        .orderBy("abc_class")
    )


@register(
    "q192_segment_migration",
    oracle="""
    WITH um AS (
      SELECT user_id,
             CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS ym,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ), seg AS (
      SELECT user_id, ym,
             CASE WHEN cents >= 75000 THEN 'high'
                  WHEN cents >= 55000 THEN 'mid'
                  ELSE 'low' END AS s
      FROM um
    ), trans AS (
      SELECT a.s AS seg_from, coalesce(b.s, 'gone') AS seg_to
      FROM seg a LEFT JOIN seg b
        ON b.user_id = a.user_id AND b.ym = a.ym + 1
    )
    SELECT seg_from, seg_to, CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / CAST(sum(count(*))
             OVER (PARTITION BY seg_from) AS BIGINT), 4) AS share
    FROM trans GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-segment migration matrix: label each paying user's
    month by spend tier (high/mid/low in exact cents), then count
    month-over-month transitions including churn to 'gone' - the
    segment-flow read behind "are mid spenders upgrading or leaving".

    100 TB shape: one scan reduces to the (user, month) grain, pinned
    with localCheckpoint so the month-shift self-join reads the
    reduction twice; tier thresholds compare exact BIGINT cents; the
    transition matrix is at most 3x4 cells and its row shares are
    window-sums over that tiny table."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    um = (
        e.groupBy(
            "user_id",
            (F.year("ts") * 12 + F.month("ts") - 1).cast("bigint").alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint()
    )
    seg_expr = (
        F.when(F.col("cents") >= 75000, "high")
        .when(F.col("cents") >= 55000, "mid")
        .otherwise("low")
    )
    a = um.select("user_id", "ym", seg_expr.alias("seg_from"))
    b = um.select(
        F.col("user_id").alias("b_user"),
        (F.col("ym") - 1).alias("b_prev_ym"),
        seg_expr.alias("b_seg"),
    )
    trans = a.join(
        b, (a.user_id == b.b_user) & (a.ym == b.b_prev_ym), "left"
    ).select("seg_from", F.coalesce(F.col("b_seg"), F.lit("gone")).alias("seg_to"))
    wrow = Window.partitionBy("seg_from")
    return (
        trans.groupBy("seg_from", "seg_to")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "seg_from",
            "seg_to",
            "n",
            F.round(
                F.col("n") * 1.0 / F.sum("n").over(wrow).cast("bigint"), 4
            ).alias("share"),
        )
        .orderBy("seg_from", "seg_to")
    )


@register(
    "q193_customer_brand_hhi",
    oracle="""
    WITH cb AS (
      SELECT o.o_custkey AS cust, p.p_brand AS brand,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ), shares AS (
      SELECT cust, cents,
             CAST(sum(cents) OVER (PARTITION BY cust) AS BIGINT) AS total
      FROM cb
    ), hhi AS (
      SELECT cust,
             round(sum((CAST(cents AS DOUBLE) / total)
                       * (CAST(cents AS DOUBLE) / total)) * 10000, 2)
               AS h
      FROM shares GROUP BY cust
    )
    SELECT round(quantile_cont(h, 0.1), 2) AS p10,
           round(quantile_cont(h, 0.5), 2) AS p50,
           round(quantile_cont(h, 0.9), 2) AS p90,
           round(avg(CASE WHEN h >= 5000 THEN 1.0 ELSE 0.0 END), 4)
             AS pct_concentrated,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM hhi
    """,
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-wallet concentration: each customer's brand HHI (sum
    of squared revenue shares, 0-10000), summarized as deciles and
    the share of single-brand-loyal customers (HHI >= 5000) - the
    loyalty-vs-variety read.

    Per-customer HHI folds at most 25 brand-share terms (q153's
    bounded-fold discipline, rounded at 2 before the percentile);
    percentiles interpolate exactly over the customer-grain table
    (q74 calibration posture).  100 TB shape: part broadcasts, the
    orderkey join co-partitions with lineitem, one (cust, brand)
    partial-agg shuffle, windows over that reduction."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    shares = cb.select(
        "cust",
        "cents",
        F.sum("cents").over(Window.partitionBy("cust")).cast("bigint").alias("total"),
    )
    share = F.col("cents").cast("double") / F.col("total")
    hhi = shares.groupBy("cust").agg(
        F.round(F.sum(share * share) * 10000, 2).alias("h")
    )
    res = grouped_exact_percentile(
        hhi,
        [],
        [("h", 0.1, "_p10"), ("h", 0.5, "_p50"), ("h", 0.9, "_p90")],
        extra_aggs=[
            F.round(
                F.avg(F.when(F.col("h") >= 5000, 1.0).otherwise(0.0)), 4
            ).alias("pct_concentrated"),
            F.count("*").cast("bigint").alias("n_customers"),
        ],
        input_rows=table_rows(sf_dir, "customer"),
    )
    return res.select(
        F.round("_p10", 2).alias("p10"),
        F.round("_p50", 2).alias("p50"),
        F.round("_p90", 2).alias("p90"),
        "pct_concentrated",
        "n_customers",
    )


@register(
    "q194_new_vs_returning",
    oracle="""
    WITH um AS (
      SELECT user_id,
             CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS ym,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ), firsts AS (
      SELECT user_id, CAST(min(ym) AS BIGINT) AS first_ym FROM um GROUP BY 1
    )
    SELECT um.ym,
           round(sum(CASE WHEN um.ym = f.first_ym THEN um.cents ELSE 0 END)
                 / 100.0, 2) AS new_revenue,
           round(sum(CASE WHEN um.ym > f.first_ym THEN um.cents ELSE 0 END)
                 / 100.0, 2) AS returning_revenue,
           round(sum(CASE WHEN um.ym > f.first_ym THEN um.cents ELSE 0 END)
                 * 1.0 / sum(um.cents), 4) AS returning_share
    FROM um JOIN firsts f ON f.user_id = um.user_id
    GROUP BY 1 ORDER BY 1
    """,
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning revenue split per month: a user's revenue is
    'new' in their first paying month and 'returning' after - the
    acquisition-vs-retention mix every growth dashboard leads with.

    100 TB shape: one scan to the pinned (user, month) grain; the
    first-month table re-aggregates FROM that reduction and joins
    back on its own grain (user-co-partitioned) - events is read
    once; all splits are exact BIGINT cents."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    um = (
        e.groupBy(
            "user_id",
            (F.year("ts") * 12 + F.month("ts") - 1).cast("bigint").alias("ym"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint()
    )
    firsts = um.groupBy("user_id").agg(
        F.min("ym").cast("bigint").alias("first_ym")
    )
    new_c = F.when(F.col("ym") == F.col("first_ym"), F.col("cents")).otherwise(0)
    ret_c = F.when(F.col("ym") > F.col("first_ym"), F.col("cents")).otherwise(0)
    return (
        um.join(firsts, "user_id")
        .groupBy("ym")
        .agg(
            F.round(F.sum(new_c) / 100.0, 2).alias("new_revenue"),
            F.round(F.sum(ret_c) / 100.0, 2).alias("returning_revenue"),
            F.round(F.sum(ret_c) * 1.0 / F.sum("cents"), 4).alias(
                "returning_share"
            ),
        )
        .orderBy("ym")
    )


@register(
    "q195_repeat_purchase_cadence",
    oracle="""
    WITH gaps AS (
      SELECT CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))
               / 86400000000) AS BIGINT) AS gap_d
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_d, 0.25), 2) AS p25_days,
           round(quantile_cont(gap_d, 0.5), 2) AS p50_days,
           round(quantile_cont(gap_d, 0.9), 2) AS p90_days,
           round(sum(gap_d) * 1.0 / count(*), 2) AS mean_days
    FROM gaps WHERE gap_d IS NOT NULL
    """,
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of whole-day gaps
    between each user's consecutive purchases - the replenishment
    rhythm that sets reactivation-campaign timing.

    Gaps are exact BIGINT microseconds floored to whole days (no
    double-seconds intermediate); the mean divides BIGINT sums and
    the percentiles run through the size-aware
    ``grouped_exact_percentile`` - a GLOBAL exact percentile is the
    canonical giant-group case, so above one task's sort it switches
    to the distributed two-pass rank selection.  100 TB shape:
    the purchase filter pushes to the scan, one user-partitioned
    window produces the lags, one global agg row comes out."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = e.select(
        F.floor((us - F.lag(us).over(w)) / 86_400_000_000)
        .cast("bigint")
        .alias("gap_d")
    ).filter(F.col("gap_d").isNotNull())
    res = grouped_exact_percentile(
        gaps,
        [],
        [
            ("gap_d", 0.25, "_p25"),
            ("gap_d", 0.5, "_p50"),
            ("gap_d", 0.9, "_p90"),
        ],
        extra_aggs=[
            F.count("*").cast("bigint").alias("n_gaps"),
            F.round(F.sum("gap_d") * 1.0 / F.count("*"), 2).alias(
                "mean_days"
            ),
        ],
        input_rows=table_rows(sf_dir, "events"),
    )
    return res.select(
        "n_gaps",
        F.round("_p25", 2).alias("p25_days"),
        F.round("_p50", 2).alias("p50_days"),
        F.round("_p90", 2).alias("p90_days"),
        "mean_days",
    )


@register(
    "q196_price_band_mix",
    oracle=f"""
    WITH banded AS (
      SELECT p_partkey,
             CAST(ntile(10) OVER (ORDER BY p_retailprice, p_partkey)
                  AS BIGINT) AS band
      FROM part
    ), yr AS (
      SELECT b.band,
             CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
             CAST(sum({_REV_U_SQL}) AS BIGINT) AS rev
      FROM lineitem l JOIN banded b ON b.p_partkey = l.l_partkey
      GROUP BY 1, 2
    )
    SELECT ship_year, band, round(rev / 10000.0, 2) AS revenue,
           round(rev * 1.0 / CAST(sum(rev) OVER (PARTITION BY ship_year)
                                  AS BIGINT), 4) AS year_share
    FROM yr ORDER BY ship_year, band
    """,
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-band revenue mix: parts split into retail-price deciles
    (ntile with a partkey tiebreak, so band assignment is
    deterministic), revenue share of each band within each ship year -
    the premiumization trend read.

    100 TB shape: the decile banding sorts the PART DIMENSION only
    (never the fact table) and broadcasts back onto the lineitem
    scan; one partial-agg shuffle to (band, year); shares are
    window-sums of exact BIGINT revenue units over that 10 x years
    cell table."""
    pt = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.ntile(10)
        .over(Window.orderBy("p_retailprice", "p_partkey"))
        .cast("bigint")
        .alias("band"),
    )
    li = load(spark, sf_dir, "lineitem")
    yr = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(
            "band", F.year("l_shipdate").cast("bigint").alias("ship_year")
        )
        .agg(F.sum(_rev_u()).cast("bigint").alias("rev"))
    )
    wyr = Window.partitionBy("ship_year")
    return yr.select(
        "ship_year",
        "band",
        F.round(F.col("rev") / 10000.0, 2).alias("revenue"),
        F.round(
            F.col("rev") * 1.0 / F.sum("rev").over(wyr).cast("bigint"), 4
        ).alias("year_share"),
    ).orderBy("ship_year", "band")


@register(
    "q197_order_reconciliation",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY 1
    ), recon AS (
      SELECT CAST(round(o.o_totalprice * 100) AS BIGINT)
               - l.line_cents AS delta
      FROM orders o JOIN lines l ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN delta = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN abs(delta) > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_off_by_dollar,
           CAST(max(abs(delta)) AS BIGINT) AS max_abs_delta_cents,
           round(sum(delta) / 100.0, 2) AS net_delta
    FROM recon
    """,
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial reconciliation: o_totalprice vs the roll-up of its
    lines at extendedprice x (1-discount) x (1+tax) - the books-vs-
    detail audit that catches pipeline drops and rounding bugs.

    Per-line charges round ONCE to BIGINT cents (identical fixed-shape
    double expression on both engines) and every downstream comparison
    is integer.  100 TB shape: lineitem pre-aggregates to order grain
    (partial agg) before the orderkey-co-partitioned join with orders;
    one global audit row out."""
    li = load(spark, sf_dir, "lineitem")
    line_cents = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("bigint")
    lines = li.groupBy("l_orderkey").agg(
        F.sum(line_cents).cast("bigint").alias("line_cents")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    delta = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") - F.col("line_cents")
    ).alias("delta")
    recon = lines.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(delta)
    return recon.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("delta") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(F.when(F.abs("delta") > 100, 1).otherwise(0))
        .cast("bigint")
        .alias("n_off_by_dollar"),
        F.max(F.abs("delta")).cast("bigint").alias("max_abs_delta_cents"),
        F.round(F.sum("delta") / 100.0, 2).alias("net_delta"),
    )


@register(
    "q198_laspeyres_index",
    oracle="""
    WITH py AS (
      SELECT l_partkey,
             CAST(year(l_shipdate) AS BIGINT) AS yr,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ), base AS (
      SELECT l_partkey, cents AS c0, qty AS q0 FROM py WHERE yr = 1995
    ), terms AS (
      SELECT p.yr,
             CAST(round(CAST(p.cents AS DOUBLE) / p.qty * b.q0 * 1000)
                  AS BIGINT) AS cur_microunits,
             CAST(round(CAST(b.c0 AS DOUBLE) / b.q0 * b.q0 * 1000)
                  AS BIGINT) AS base_microunits
      FROM py p JOIN base b ON b.l_partkey = p.l_partkey
    )
    SELECT yr,
           round(sum(cur_microunits) * 1.0 / sum(base_microunits), 4)
             AS laspeyres
    FROM terms GROUP BY 1 ORDER BY 1
    """,
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index: each year's average unit price per part
    weighted by the 1995 base-year basket quantities, relative to the
    base year - the inflation read over the catalog.

    Each part-year term (unit price x base quantity) quantizes to
    BIGINT micro-units BEFORE summing (the q190 pattern - the raw
    double sum over thousands of parts is where engines diverge), so
    the index is one fixed-shape division of exact integer sums.
    100 TB shape: one scan reduces lineitem to the (part, year) grain,
    pinned with localCheckpoint so the base-year basket and the probe
    both read the reduction; the join is part-co-partitioned."""
    li = load(spark, sf_dir, "lineitem")
    py = (
        li.groupBy(
            "l_partkey", F.year("l_shipdate").cast("bigint").alias("yr")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.sum(F.round("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
        .localCheckpoint()
    )
    base = py.filter(F.col("yr") == 1995).select(
        F.col("l_partkey").alias("b_partkey"),
        F.col("cents").alias("c0"),
        F.col("qty").alias("q0"),
    )
    cur_term = (
        F.round(F.col("cents").cast("double") / F.col("qty") * F.col("q0") * 1000)
        .cast("bigint")
        .alias("cur_microunits")
    )
    base_term = (
        F.round(F.col("c0").cast("double") / F.col("q0") * F.col("q0") * 1000)
        .cast("bigint")
        .alias("base_microunits")
    )
    terms = py.join(base, py.l_partkey == base.b_partkey).select(
        "yr", cur_term, base_term
    )
    return (
        terms.groupBy("yr")
        .agg(
            F.round(
                F.sum("cur_microunits") * 1.0 / F.sum("base_microunits"), 4
            ).alias("laspeyres")
        )
        .orderBy("yr")
    )
