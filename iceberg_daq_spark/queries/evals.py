"""Q229-Q230: evaluation-statistics battery.

q229 is the DISTRIBUTED BOOTSTRAP: classical bootstrap resampling is
impossible at 100 TB (you cannot materialize B copies of the data),
but the Poisson bootstrap is its scan-friendly equivalent - each row
draws a pseudo-Poisson(1) weight per resample, so B resamples cost
ONE scan with a B-way explode and fold to B groups.  Weights come
from the same Mersenne-prime integer hashing as q223/q224 (no
engine RNG anywhere), so both engines draw the identical resamples.

q230 closes the recommender loop: q165 builds the item-item table;
this backtests it on a TEMPORAL holdout - train co-purchase on the
early years, recommend top-3 unseen brands per customer, score
hits@3 against what the customer actually bought later.  Every score
is an exact integer sum of micro-unit cosines; every ranking has
total deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_P = 2_147_483_647  # 2^31 - 1
_B = 32  # resamples

# Poisson(1) inverse-CDF thresholds as EXACT integer cutoffs on the
# uniform hash h in [0, P): floor(P * CDF(k)) for k = 0..4; h beyond
# the last cutoff draws weight 5.  Both engines compare the same
# integers, so every row's weight vector is identical.
_POIS_CDF = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
             0.9810118431238462, 0.9963401531726563]
_CUTS = [int(_P * c) for c in _POIS_CDF]


def _w_sql(h: str) -> str:
    """Pseudo-Poisson(1) weight from an integer hash in [0, P)."""
    return (
        f"(CASE WHEN {h} < {_CUTS[0]} THEN 0"
        f" WHEN {h} < {_CUTS[1]} THEN 1"
        f" WHEN {h} < {_CUTS[2]} THEN 2"
        f" WHEN {h} < {_CUTS[3]} THEN 3"
        f" WHEN {h} < {_CUTS[4]} THEN 4"
        f" ELSE 5 END)"
    )


# per-resample hash: multiplier/offset vary with the resample index b
_H_SPARK = f"pmod((1664525 + b * 22695477) * pmod(o_orderkey, {_P}) + 69069 * b + 12345, {_P})"
_H_DUCK = f"(((1664525 + b.b * 22695477) * (o.o_orderkey % {_P}) + 69069 * b.b + 12345) % {_P})"


@register(
    "q229_poisson_bootstrap_ci",
    oracle=f"""
    WITH b AS (SELECT unnest(range(0, {_B})) AS b),
    cells AS (
      SELECT b.b,
             CAST(sum({_w_sql(_H_DUCK)}
                  * CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS wsum_cents,
             CAST(sum({_w_sql(_H_DUCK)}) AS BIGINT) AS wn
      FROM orders o, b
      GROUP BY b.b
    ), means AS (
      SELECT b, wsum_cents / (wn * 100.0) AS m FROM cells
    ), pt AS (
      SELECT round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   / (count(*) * 100.0), 2) AS point_mean,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
    )
    SELECT pt.point_mean, pt.n_orders,
           CAST({_B} AS BIGINT) AS n_resamples,
           round(stddev_samp(m), 2) AS boot_se,
           round(quantile_cont(m, 0.025), 2) AS ci_lo,
           round(quantile_cont(m, 0.975), 2) AS ci_hi
    FROM means, pt
    GROUP BY pt.point_mean, pt.n_orders
    """,
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order value via
    32 Poisson resamples in ONE scan.

    Each (order, resample) cell draws a Poisson(1) weight by pushing
    an integer hash through exact inverse-CDF cutoffs, so the weighted
    sum/count per resample folds as exact BIGINT cents - the resample
    means are integer ratios, bit-identical on both engines - and the
    SE/percentile stats run over 32 fixed values.  100 TB shape:
    one scan, a broadcast 32-row explode, partial-agg to 32
    groups; memory is O(B), never O(B x data) - the reason Poisson
    bootstrap IS the distributed bootstrap."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    bs = F.broadcast(
        spark.range(0, _B).select(F.col("id").cast("bigint").alias("b"))
    )
    w = F.expr(_w_sql(_H_SPARK))
    cells = (
        o.crossJoin(bs)
        .groupBy("b")
        .agg(
            F.sum(w * F.col("cents")).cast("bigint").alias("wsum_cents"),
            F.sum(w).cast("bigint").alias("wn"),
        )
    )
    means = cells.select(
        (F.col("wsum_cents") / (F.col("wn") * 100.0)).alias("m")
    )
    pt = o.agg(
        F.round(F.sum("cents") / (F.count("*") * 100.0), 2).alias(
            "point_mean"
        ),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    return (
        means.crossJoin(F.broadcast(pt))
        .groupBy("point_mean", "n_orders")
        .agg(
            F.lit(_B).cast("bigint").alias("n_resamples"),
            F.round(F.stddev_samp("m"), 2).alias("boot_se"),
            F.round(F.expr("percentile(m, 0.025)"), 2).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 2).alias("ci_hi"),
        )
    )


_SPLIT = "1999-01-01"
_COS_SCALE = 1_000_000


@register(
    "q230_recsys_backtest",
    oracle=f"""
    WITH cb AS (
      SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand,
             o.o_orderdate < TIMESTAMP '{_SPLIT}' AS is_train
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ), train AS (
      SELECT DISTINCT cust, brand FROM cb WHERE is_train
    ), test AS (
      SELECT DISTINCT cust, brand FROM cb WHERE NOT is_train
    ), bc AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS nb FROM train GROUP BY brand
    ), sim AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(round({_COS_SCALE} * count(*)
               / sqrt(CAST(ba.nb AS DOUBLE) * bb.nb)) AS BIGINT) AS cos_u
      FROM train a
      JOIN train b ON b.cust = a.cust AND b.brand <> a.brand
      JOIN bc ba ON ba.brand = a.brand
      JOIN bc bb ON bb.brand = b.brand
      GROUP BY brand_a, brand_b, ba.nb, bb.nb
    ), scores AS (
      SELECT t.cust, s.brand_b AS rec,
             CAST(sum(s.cos_u) AS BIGINT) AS score
      FROM train t JOIN sim s ON s.brand_a = t.brand
      WHERE NOT EXISTS (
        SELECT 1 FROM train t2
        WHERE t2.cust = t.cust AND t2.brand = s.brand_b)
      GROUP BY t.cust, rec
    ), top3 AS (
      SELECT cust, rec FROM (
        SELECT *, row_number() OVER (
          PARTITION BY cust ORDER BY score DESC, rec) AS rk
        FROM scores
      ) WHERE rk <= 3
    ), hits AS (
      SELECT t3.cust,
             CAST(max(CASE WHEN te.brand IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hit
      FROM top3 t3
      LEFT JOIN test te ON te.cust = t3.cust AND te.brand = t3.rec
      WHERE EXISTS (SELECT 1 FROM test x WHERE x.cust = t3.cust)
      GROUP BY t3.cust
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           round(sum(hit)::DOUBLE / count(*), 4) AS hit_rate_at_3
    FROM hits
    """,
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal backtest of the q165-style item-item recommender:
    train binary-cosine brand similarity on pre-1999 orders,
    recommend each customer the top-3 brands they had NOT bought
    (score = sum of micro-unit cosines to their trained brands),
    and measure hits@3 against their actual post-split purchases
    (customers active in the test period only).

    Cosines quantize to micro-units at the pair table, so per-
    (customer, candidate) scores fold as exact BIGINTs; top-3 breaks
    ties by brand name.

    100 TB shape (r14, guide 2.3/2.4 - the r13 residual "restate the
    pair-join/anti-join keys so one exchange serves the five train
    consumers"): ONE partial-aggregating collect_set exchange keyed on
    cust builds per-customer TRAIN and TEST brand sets (<= 25 brands
    each, the q165 bound) and every former re-shuffle restates over
    the cached, cust-partitioned sets: the pair join generates
    MAP-SIDE by double explode; the NOT-EXISTS anti-join is a map-side
    array_contains filter against the customer's own train set; the
    active-customer semi-join and the hit left-join collapse into ONE
    cust-keyed inner join against the non-empty test sets (membership
    gives the hit flag).  The old plan paid 13 exchanges (r12: 18);
    this one pays the sets exchange plus brand-cardinality-bounded
    aggregations.  All downstream reads are order-insensitive set
    membership / pair counts, so collect_set's element order cannot
    affect results."""
    od = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sets = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("p_brand").alias("brand"),
            (F.col("o_orderdate") < F.lit(_SPLIT).cast("timestamp")).alias(
                "is_train"
            ),
        )
        .groupBy("cust")
        .agg(
            F.collect_set(F.when(F.col("is_train"), F.col("brand"))).alias("tb"),
            F.collect_set(F.when(~F.col("is_train"), F.col("brand"))).alias("eb"),
        )
        .persist()
    )
    bc = (
        sets.select(F.explode("tb").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").cast("bigint").alias("nb"))
    )
    ba = bc.select(F.col("brand").alias("brand_a"), F.col("nb").alias("nb_a"))
    bb = bc.select(F.col("brand").alias("brand_b"), F.col("nb").alias("nb_b"))
    sim = (
        sets.select(F.explode("tb").alias("brand_a"), "tb")
        .select("brand_a", F.explode("tb").alias("brand_b"))
        .filter(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("bigint").alias("nab"))
        .join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            F.round(
                _COS_SCALE
                * F.col("nab")
                / F.sqrt(F.col("nb_a").cast("double") * F.col("nb_b"))
            )
            .cast("bigint")
            .alias("cos_u"),
        )
    )
    scores = (
        sets.select("cust", "tb", F.explode("tb").alias("brand_a"))
        .join(F.broadcast(sim), "brand_a")
        .filter(~F.array_contains("tb", F.col("brand_b")))
        .groupBy("cust", F.col("brand_b").alias("rec"))
        .agg(F.sum("cos_u").cast("bigint").alias("score"))
    )
    wtop = Window.partitionBy("cust").orderBy(F.col("score").desc(), "rec")
    top3 = (
        scores.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= 3)
        .select("cust", "rec")
    )
    esets = sets.filter(F.size("eb") > 0).select("cust", "eb")
    hits = (
        top3.join(esets, "cust")
        .groupBy("cust")
        .agg(
            F.max(F.when(F.array_contains("eb", F.col("rec")), 1).otherwise(0))
            .cast("bigint")
            .alias("hit")
        )
    )
    return hits.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("hit").cast("bigint").alias("n_hits"),
        F.round(F.sum("hit") / F.count("*"), 4).alias("hit_rate_at_3"),
    )
