"""Q168-Q179: the TPC-H remainder, adapted to this corpus.

The testdata is TPC-H-shaped but slimmer (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate, no c_phone/p_container), so the
classic decision-support suite is re-expressed against the columns
that exist: Q3 shipping priority, Q4 order-priority wait, Q6 revenue
uplift, Q7 volume shipping, Q8 market share, Q10 returned items,
Q13 customer distribution, Q14 promo effect, Q17 small-quantity
revenue, Q18 large-volume customers, Q21 waiting suppliers, Q22
dormant rich customers.  Each docstring names its TPC-H analog.

Determinism discipline (the queries/stats.py model): money reduces in
exact BIGINT cents - revenue units are ext_cents * (100 - disc_pts),
an exact integer per line - so every sum is order-insensitive integer
arithmetic; doubles appear only in final fixed-shape ratios computed
from identical BIGINTs on both engines, and every ORDER BY sorts the
exact integer (never the rounded display double) with a unique-key
tiebreak.  At true 100 TB these BIGINT unit-sums would be widened to
DECIMAL(38,0); the shapes are otherwise scale-ready as written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


def _ext_cents():
    return F.round(F.col("l_extendedprice") * 100).cast("bigint")


def _disc_pts():
    return F.round(F.col("l_discount") * 100).cast("bigint")


def _rev_u():
    """Exact revenue unit: cents x (100 - discount points), BIGINT."""
    return _ext_cents() * (F.lit(100) - _disc_pts())


_REV_U_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@register(
    "q168_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS okey,
           round(sum({_REV_U_SQL}) / 10000.0, 2) AS revenue,
           o.o_orderdate AS odate, o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15'
      AND l.l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY 1, 3, 4
    ORDER BY sum({_REV_U_SQL}) DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): the 10 highest-revenue unshipped
    BUILDING-segment orders as of the cutoff date - ordered before it,
    with lines still shipping after it.

    100 TB shape: the segment filter prunes customer BEFORE its join
    (broadcast after filter), the date predicates push to the orders
    and lineitem scans, the big join is orderkey-keyed (co-partitioned
    at scale), and the top-10 is a TakeOrdered over the exact BIGINT
    revenue sum - no global sort materializes."""
    cutoff = F.lit("1998-06-15").cast("timestamp")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("okey"),
            F.col("o_orderdate").alias("odate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(_rev_u()).alias("_rev_exact"))
        .orderBy(F.col("_rev_exact").desc(), "odate", "okey")
        .limit(10)
        .select(
            "okey",
            F.round(F.col("_rev_exact") / 10000.0, 2).alias("revenue"),
            "odate",
            "priority",
        )
    )


@register(
    "q169_order_priority_wait",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1 ORDER BY 1
    """,
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted: with no
    commit/receipt dates in this corpus, "late" means some line
    shipped more than 60 days after the order date; count such
    orders per priority over one quarter.

    100 TB shape: the EXISTS is a LEFT SEMI join on the order key
    (equi key + the ship-lag residual condition), so lineitem never
    fans out rows; the quarter filter pushes to the orders scan and
    the final agg is 5 groups."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("priority")
    )


@register(
    "q170_revenue_uplift",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT))
                 / 10000.0, 2) AS uplift
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the revenue that would
    be recovered by eliminating 5-7% discounts on small-quantity 1997
    lines - sum(extendedprice * discount) over the band.

    100 TB shape: a single scan with every predicate pushed down
    (dates, quantity; the discount-band test folds to a range on the
    raw column), one partial+final agg to one row, zero shuffles of
    consequence.  The sum is exact BIGINT cents x points."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.045)
        & (F.col("l_discount") <= 0.075)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.sum(_ext_cents() * _disc_pts()) / 10000.0, 2).alias("uplift"),
    )


@register(
    "q171_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           round(sum({_REV_U_SQL}) / 10000.0, 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
      AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
        OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade - revenue shipped
    between two nations in each direction, per ship year.

    100 TB shape: supplier x nation prunes lineitem EARLY (broadcast
    the two-nation supplier dim onto the fact scan, cutting it to
    ~2/25 of rows before the orderkey shuffle); customer joins on its
    own key with the nation pair filter applied immediately after;
    nations broadcast everywhere.  Final agg is (2 x years) groups."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1999-01-01").cast("timestamp")
    nat = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cus = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev_u()) / 10000.0, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q172_market_share",
    oracle=f"""
    WITH flows AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
             CASE WHEN ns.n_name = 'NATION_7'
                  THEN {_REV_U_SQL} ELSE 0 END AS rev_nat,
             {_REV_U_SQL} AS rev_all
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
    )
    SELECT order_year,
           CAST(sum(rev_nat) AS BIGINT) AS rev_nat_u,
           round(CAST(sum(rev_nat) AS DOUBLE) / sum(rev_all), 4) AS mkt_share
    FROM flows GROUP BY 1 ORDER BY 1
    """,
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_7 suppliers' share of
    PROMO-part revenue sold to EUROPE-region customers, per year.

    100 TB shape: the PROMO part dim broadcasts onto the lineitem scan
    first (strongest selectivity), supplier+nation broadcast next, the
    orderkey shuffle joins orders, and the EUROPE customer dim joins
    on custkey; share = exact BIGINT numerator / denominator in one
    fixed-shape division per year group."""
    li = load(spark, sf_dir, "lineitem")
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    nat = load(spark, sf_dir, "nation")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ncr = nat.join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("eu_nationkey"))
    cus = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(ncr), F.col("c_nationkey") == F.col("eu_nationkey"))
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    rev = _rev_u()
    flows = (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.when(F.col("supp_nation") == "NATION_7", rev)
            .otherwise(F.lit(0))
            .alias("rev_nat"),
            rev.alias("rev_all"),
        )
    )
    return (
        flows.groupBy("order_year")
        .agg(
            F.sum("rev_nat").cast("bigint").alias("rev_nat_u"),
            F.round(
                F.sum("rev_nat").cast("double") / F.sum("rev_all"), 4
            ).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


@register(
    "q173_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS cname,
           round(sum({_REV_U_SQL}) / 10000.0, 2) AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-10-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 4, 5
    ORDER BY sum({_REV_U_SQL}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the 20 customers who
    returned the most revenue in one quarter - the churn-risk call
    list.

    100 TB shape: the quarter filter pushes to orders and the return
    flag to lineitem before their orderkey-keyed join; the custkey
    agg shuffles once; nation broadcasts; top-20 is a TakeOrdered on
    the exact BIGINT revenue with a custkey tiebreak."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cname"),
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_rev_u()).alias("_rev_exact"))
        .orderBy(F.col("_rev_exact").desc(), "custkey")
        .limit(20)
        .select(
            "custkey",
            "cname",
            F.round(F.col("_rev_exact") / 10000.0, 2).alias("revenue"),
            "acctbal",
            "nation",
        )
    )


@register(
    "q174_customer_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly k qualifying orders - including the zero-order customers
    the left join preserves (the comment-pattern exclusion becomes a
    priority-class exclusion on this corpus).

    100 TB shape: orders pre-aggregates to (custkey, count) BEFORE
    the customer join, so the left join carries one row per customer
    on each side, then the distribution agg is tiny.  Both shuffles
    are custkey-keyed (co-partitioned)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").cast("bigint").alias("n_ord"))
    )
    co = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.coalesce(F.col("n_ord"), F.lit(0)).cast("bigint").alias("c_count")
    )
    return (
        co.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q175_promo_revenue",
    oracle=f"""
    SELECT CAST(month(l.l_shipdate) AS BIGINT) AS ship_month,
           round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_REV_U_SQL} ELSE 0 END)
                 / sum({_REV_U_SQL}), 4) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the percentage of each 1997
    month's revenue from PROMO-type parts.

    100 TB shape: part broadcasts onto the date-pruned lineitem scan,
    one partial+final agg to 12 month groups, share = exact BIGINT
    numerator / denominator per group."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_u()
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").cast("bigint").alias("ship_month"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
                )
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
        .orderBy("ship_month")
    )


@register(
    "q176_small_qty_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q,
             CAST(count(*) AS BIGINT) AS n_q
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 / 100.0 / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#7'
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE 2 * pq.n_q * CAST(round(l.l_quantity) AS BIGINT) < pq.sum_q
    """,
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): average yearly
    revenue lost if Brand#7 orders below half the part's mean
    quantity were not taken.

    The half-mean test is PURE INTEGER on both engines:
    qty < sum_q / (2 n)  <=>  2 n qty < sum_q - no float division
    ever compares.  100 TB shape: the per-part (sum, count) comes
    from a window over the SAME partkey shuffle the brand-filtered
    probe uses - the brand semi-join prunes the scan to ~1/25 of
    lines BEFORE the window (per-part means are unaffected: a part
    has one brand), one shuffle, no lineitem self-join (the SQL
    spells the equivalent join for DuckDB's binder)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.round("l_quantity").cast("bigint").alias("qty_i"),
    )
    pt = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    scored = li.join(
        F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).select(
        "l_partkey",
        "l_extendedprice",
        "qty_i",
        F.sum("qty_i").over(w).cast("bigint").alias("sum_q"),
        F.count("*").over(w).cast("bigint").alias("n_q"),
    )
    return (
        scored.filter(2 * F.col("n_q") * F.col("qty_i") < F.col("sum_q"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.sum(_ext_cents()) / 100.0 / 7.0, 2).alias("avg_yearly"),
        )
    )


@register(
    "q177_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
    )
    SELECT o.o_custkey AS custkey, o.o_orderkey AS okey,
           o.o_orderdate AS odate,
           round(o.o_totalprice, 2) AS totalprice, b.sum_qty
    FROM big b JOIN orders o ON o.o_orderkey = b.l_orderkey
    ORDER BY CAST(round(o.o_totalprice * 100) AS BIGINT) DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the top orders whose total
    line quantity exceeds 300 units, by order value.

    100 TB shape: lineitem pre-aggregates to (orderkey, sum_qty) with
    a map-side partial before the HAVING prunes to the rare giants;
    the survivors join orders on the same orderkey partitioning (AQE
    broadcasts the tiny filtered side); top-20 is a TakeOrdered on
    exact price cents with an orderkey tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load(spark, sf_dir, "orders")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderdate").alias("odate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("sum_qty"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("_tp_cents"),
        )
        .orderBy(F.col("_tp_cents").desc(), "okey")
        .limit(20)
        .drop("_tp_cents")
    )


@register(
    "q178_waiting_suppliers",
    oracle="""
    WITH sm AS (
      SELECT l.l_orderkey AS okey, l.l_suppkey AS skey,
             max(l.l_shipdate) AS smax
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ), marked AS (
      SELECT okey, skey, smax,
             max(smax) OVER (PARTITION BY okey) AS omax,
             CAST(count(*) OVER (PARTITION BY okey) AS BIGINT) AS n_supp
      FROM sm
    ), late AS (
      SELECT okey, skey,
             CAST(sum(CASE WHEN smax = omax THEN 1 ELSE 0 END)
                  OVER (PARTITION BY okey) AS BIGINT) AS n_at_max,
             smax, omax, n_supp
      FROM marked
    )
    SELECT skey AS suppkey, CAST(count(*) AS BIGINT) AS numwait
    FROM late
    WHERE n_supp > 1 AND smax = omax AND n_at_max = 1
    GROUP BY 1
    ORDER BY numwait DESC, suppkey
    LIMIT 20
    """,
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: with no
    commit/receipt dates, the "blocking" supplier of a finished
    multi-supplier order is the UNIQUE holder of its latest ship
    date; count blocked orders per supplier.

    100 TB shape: lineitem reduces to (order, supplier, max ship)
    first - partial agg on the scan - then two window passes over the
    SAME orderkey partitioning (one shuffle total) mark the order max
    and how many suppliers achieve it; no self-join of lineitem
    against lineitem (the classic Q21 does it twice)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    sm = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy(
            F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey")
        )
        .agg(F.max("l_shipdate").alias("smax"))
    )
    wo = Window.partitionBy("okey")
    marked = sm.select(
        "okey",
        "skey",
        "smax",
        F.max("smax").over(wo).alias("omax"),
        F.count("*").over(wo).cast("bigint").alias("n_supp"),
    )
    late = marked.select(
        "okey",
        "skey",
        "smax",
        "omax",
        "n_supp",
        F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0))
        .over(wo)
        .cast("bigint")
        .alias("n_at_max"),
    )
    return (
        late.filter(
            (F.col("n_supp") > 1)
            & (F.col("smax") == F.col("omax"))
            & (F.col("n_at_max") == 1)
        )
        .groupBy(F.col("skey").alias("suppkey"))
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "suppkey")
        .limit(20)
    )


@register(
    "q179_dormant_rich_customers",
    oracle="""
    WITH thresh AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             CAST(count(*) AS BIGINT) AS n_c
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_custs,
           round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2)
             AS total_bal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN thresh t
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * t.n_c > t.sum_c
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: per nation, the
    count and total balance of above-average-balance customers with
    no order since 1999 - the dormant-but-valuable reactivation list
    (nation replaces the missing phone country code).

    The above-average test is PURE INTEGER: bal > sum/n <=>
    bal_cents * n > sum_cents.  100 TB shape: the positive-balance
    mean is one broadcast row, the recency exclusion is a LEFT ANTI
    join against date-pruned orders on custkey, nation broadcasts,
    and the final agg is 25 groups."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).cast("bigint").alias("sum_c"),
        F.count("*").cast("bigint").alias("n_c"),
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(bal_cents * F.col("n_c") > F.col("sum_c"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_custs"),
            F.round(F.sum(bal_cents) / 100.0, 2).alias("total_bal"),
        )
        .orderBy("nation")
    )
