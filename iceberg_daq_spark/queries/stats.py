"""Q140-Q143: the inferential-statistics battery.

Chi-square independence, closed-form two-factor OLS, Kaplan-Meier
survival, and Gini concentration - the four tests an analytics engine
gets asked for the moment it stores more than counts.  Every query
follows the same determinism discipline: aggregate EXACT integer
sums (cents / unit counts), then derive the statistics as
fixed-shape double expressions over those sums, so no
double-summation order can flip a hash between Spark and DuckDB.
The only order-sensitive reductions left (the chi-square cell sum,
the KM log-product) run over bounded, deterministically-ordered
domains and round well above double noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q140_chi_square_independence",
    oracle="""
    WITH j AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ), t AS (
      SELECT sum(o) AS total,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
             CAST(count(DISTINCT source) AS BIGINT) AS n_src
      FROM j
    ), ml AS (
      SELECT lang, sum(o) AS nl FROM j GROUP BY lang
    ), ms AS (
      SELECT source, sum(o) AS ns FROM j GROUP BY source
    ), cells AS (
      SELECT j.o,
             CAST(ml.nl * ms.ns AS DOUBLE) / t.total AS e,
             t.total AS total, t.n_lang AS n_lang, t.n_src AS n_src
      FROM j, t
      JOIN ml ON ml.lang = j.lang
      JOIN ms ON ms.source = j.source
    )
    SELECT round(sum((o - e) * (o - e) / e), 2) AS chi2,
           (max(n_lang) - 1) * (max(n_src) - 1) AS dof,
           CAST(count(*) AS BIGINT) AS n_cells,
           round(sqrt(sum((o - e) * (o - e) / e)
                      / (max(total) * least(max(n_lang) - 1,
                                            max(n_src) - 1))), 4)
             AS cramers_v
    FROM cells
    """,
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between document language and
    source (the hypothesis-test companion of q135's mutual
    information), with Cramer's V as the normalized effect size -
    the "is this association real or noise" gate of corpus QA.

    100 TB shape: identical substrate to q135 - ONE scan, ONE
    contingency shuffle (langs x sources cells); the marginals are
    window sums OVER the cell table (by lang / by source / global),
    so the raw documents are read exactly once - separate marginal
    aggregations would each rescan the source.  The distinct
    lang/source counts fold into the FINAL single-row aggregate.
    Expected counts are fixed-shape doubles over exact BIGINT
    counts; the only order-sensitive reduction is the final sum over
    ~|langs x sources| cells, rounded at 2 decimals - ten orders of
    magnitude above double noise at any scale."""
    d = load(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("o")
    )
    cells = j.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("nl"),
        F.sum("o").over(Window.partitionBy("source")).alias("ns"),
        F.sum("o").over(Window.partitionBy()).alias("total"),
    ).withColumn(
        "e", (F.col("nl") * F.col("ns")).cast("double") / F.col("total")
    )
    chi2 = F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    return cells.agg(
        F.round(chi2, 2).alias("chi2"),
        (
            (F.countDistinct("lang").cast("bigint") - 1)
            * (F.countDistinct("source").cast("bigint") - 1)
        ).alias("dof"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.max("total")
                    * F.least(
                        F.countDistinct("lang").cast("bigint") - 1,
                        F.countDistinct("source").cast("bigint") - 1,
                    )
                )
            ),
            4,
        ).alias("cramers_v"),
    )


@register(
    "q141_ols_two_factor",
    oracle="""
    WITH li AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 100) AS BIGINT) AS x2,
             CAST(round(l_extendedprice) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
             sum(x1 * x1) AS sx1x1, sum(x2 * x2) AS sx2x2,
             sum(x1 * x2) AS sx1x2,
             sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y,
             sum(y * y) AS syy
      FROM li
    ), c AS (
      SELECT n,
             CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n AS s11,
             CAST(sx2x2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * sx2 / n AS s22,
             CAST(sx1x2 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx2 / n AS s12,
             CAST(sx1y AS DOUBLE) - CAST(sx1 AS DOUBLE) * sy / n AS s1y,
             CAST(sx2y AS DOUBLE) - CAST(sx2 AS DOUBLE) * sy / n AS s2y,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS syy_c,
             CAST(sx1 AS DOUBLE) / n AS m1,
             CAST(sx2 AS DOUBLE) / n AS m2,
             CAST(sy AS DOUBLE) / n AS my
      FROM m
    )
    SELECT n,
           round((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 4)
             AS beta_qty,
           round((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 4)
             AS beta_disc,
           round(my - (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * m1
                    - (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * m2,
                 2) AS intercept,
           round(((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) * s1y
                + (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) * s2y)
                / syy_c, 4) AS r2
    FROM c
    """,
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor ordinary least squares in closed form: regress the
    line's extended price (whole dollars) on quantity and discount
    points via the 2x2 normal equations (Cramer's rule) - the
    multi-feature generalization of q118's regr_slope, and the
    largest OLS that stays a pure one-pass aggregate (no iterative
    solver, no matrix library).

    Determinism across engines is total: every input is cast to an
    exact BIGINT unit (units, discount points, whole dollars), ALL
    ten moments are exact integer sums (max magnitude ~6e15 at
    sf0.1 - far below the ANSI int64 ceiling), and the centered
    moments, Cramer solution, intercept, and R^2 are fixed-shape
    double expressions over those exact sums - there is NO
    order-sensitive floating-point reduction anywhere.

    100 TB shape: one partial+final aggregate over lineitem (ten
    sums in a single HashAggregate), one row out; the closed-form
    algebra runs on that single row.  Adding features grows the
    moment count quadratically but it stays one map-side-combining
    pass."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    m = li.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    c = m.select(
        "n",
        (dbl("sx1x1") - dbl("sx1") * F.col("sx1") / F.col("n")).alias("s11"),
        (dbl("sx2x2") - dbl("sx2") * F.col("sx2") / F.col("n")).alias("s22"),
        (dbl("sx1x2") - dbl("sx1") * F.col("sx2") / F.col("n")).alias("s12"),
        (dbl("sx1y") - dbl("sx1") * F.col("sy") / F.col("n")).alias("s1y"),
        (dbl("sx2y") - dbl("sx2") * F.col("sy") / F.col("n")).alias("s2y"),
        (dbl("syy") - dbl("sy") * F.col("sy") / F.col("n")).alias("syy_c"),
        (dbl("sx1") / F.col("n")).alias("m1"),
        (dbl("sx2") / F.col("n")).alias("m2"),
        (dbl("sy") / F.col("n")).alias("my"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    return c.select(
        "n",
        F.round(b1, 4).alias("beta_qty"),
        F.round(b2, 4).alias("beta_disc"),
        F.round(
            F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 2
        ).alias("intercept"),
        F.round(
            (b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy_c"), 4
        ).alias("r2"),
    )


@register(
    "q142_kaplan_meier_churn",
    oracle="""
    WITH obs AS (
      SELECT CAST(max(epoch(ts)) AS DOUBLE) AS obs_end FROM events
    ), users AS (
      SELECT user_id,
             CAST(floor((max(epoch(ts)) - min(epoch(ts))) / 86400)
                  AS BIGINT) AS duration_d,
             CASE WHEN (SELECT obs_end FROM obs) - max(epoch(ts))
                       > 7 * 86400
                  THEN 1 ELSE 0 END AS churned
      FROM events GROUP BY user_id
    ), t AS (
      SELECT duration_d,
             CAST(count(*) AS BIGINT) AS n_ending,
             CAST(sum(churned) AS BIGINT) AS n_churned
      FROM users GROUP BY duration_d
    ), r AS (
      SELECT duration_d, n_ending, n_churned,
             (SELECT CAST(count(*) AS BIGINT) FROM users)
               - coalesce(sum(n_ending) OVER (
                   ORDER BY duration_d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS n_at_risk
      FROM t
    )
    SELECT duration_d, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_churned,
           round(exp(sum(ln(1.0 - CAST(n_churned AS DOUBLE) / n_at_risk))
                     OVER (ORDER BY duration_d
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)), 4) AS survival
    FROM r
    WHERE n_churned > 0 OR n_at_risk = n_ending
    ORDER BY duration_d
    """,
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user churn: a user's lifetime
    runs from their first to their last event; users silent for more
    than 7 days before the observation end are churn events, the
    rest are right-censored - the product-limit estimator every
    retention dashboard approximates with cruder cohort cuts (q110).

    100 TB shape: ONE scan of the stream, reduced to one row per
    user (partial agg) and pinned with localCheckpoint - the
    observation end, the per-day lifetime table, and the at-risk
    counts all derive from that reduction, so events is never
    re-read (the naive formulation scans it once per derived
    aggregate).  The day table is bounded by the observation span,
    never user count; the at-risk count is a REVERSE cumulative
    window over it (sum of lifetimes ending at or after t - no
    separate total, no extra scan), and the survival product is
    exp(cumulative sum of logs) over the SAME deterministic day
    order - the one order-sensitive reduction, its order fixed by
    the window frame on both engines, so the doubles agree
    bit-for-bit before the 4-decimal round.  ln(0) from a final
    full-churn day yields -inf -> survival 0.0 identically on both
    sides."""
    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("double")).alias("first_s"),
            F.max(F.col("ts").cast("double")).alias("last_s"),
        )
        .localCheckpoint()
    )
    obs_end = per_user.agg(F.max("last_s").alias("obs_end"))
    users = per_user.crossJoin(F.broadcast(obs_end)).select(
        F.floor((F.col("last_s") - F.col("first_s")) / 86400)
        .cast("bigint")
        .alias("duration_d"),
        F.when(F.col("obs_end") - F.col("last_s") > 7 * 86400, 1)
        .otherwise(0)
        .alias("churned"),
    )
    t = users.groupBy("duration_d").agg(
        F.count("*").cast("bigint").alias("n_ending"),
        F.sum("churned").cast("bigint").alias("n_churned"),
    )
    at_or_after = Window.orderBy("duration_d").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    upto = Window.orderBy("duration_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = t.withColumn("n_at_risk", F.sum("n_ending").over(at_or_after))
    return (
        r.withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            1.0
                            - F.col("n_churned").cast("double")
                            / F.col("n_at_risk")
                        )
                    ).over(upto)
                ),
                4,
            ),
        )
        .filter(
            (F.col("n_churned") > 0)
            | (F.col("n_at_risk") == F.col("n_ending"))
        )
        .select("duration_d", "n_at_risk", "n_churned", "survival")
        .orderBy("duration_d")
    )


@register(
    "q143_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY segment, custkey
    ), ranked AS (
      SELECT segment, cents,
             row_number() OVER (
               PARTITION BY segment ORDER BY cents, custkey
             ) AS i,
             count(*) OVER (PARTITION BY segment) AS n,
             sum(cents) OVER (PARTITION BY segment) AS total
      FROM rev
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_customers,
           CAST(max(total) AS BIGINT) AS total_cents,
           round((2.0 * sum(i * cents)) / (CAST(max(n) AS DOUBLE) * max(total))
                 - (max(n) + 1.0) / max(n), 4) AS gini,
           round(CAST(sum(CASE WHEN i > n - n // 10 THEN cents
                               ELSE 0 END) AS DOUBLE) / max(total), 4)
             AS top_decile_share
    FROM ranked
    GROUP BY segment
    ORDER BY segment
    """,
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient and top-decile share of customer revenue per
    market segment - the concentration/inequality metric behind
    "whale" analysis and fairness audits, computed by the
    rank-weighted formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending per-segment revenue ranks.

    Determinism: revenue accumulates as exact BIGINT cents
    (per-order cents are integers, summed exactly); ranks, the
    rank-weighted sum (max ~n * n * max_cents ~ 1e16 at sf0.1,
    inside int64), and the decile cutoff are all integers; the two
    output ratios are single fixed-shape divisions rounded at 4
    decimals.  100 TB shape: one join + partial agg to per-(segment,
    customer) cents; a HANDFUL of segments then hold
    customer-scaled populations, so above Q143_GIANT_SEGMENT_ROWS
    the ranks switch to :func:`operators.ranking.grouped_rank` (the
    two-pass range layout - no single task ever holds a whole
    segment), which is EXACT, so the oracle agrees on either path -
    the q103 registered-plan lesson applied at birth.  Below the
    threshold the plain per-segment window is fine and cheaper."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    rev = (
        o.join(cust, o["o_custkey"] == cust["c_custkey"])
        .groupBy("segment", F.col("o_custkey").alias("custkey"))
        .agg(F.sum("cents").alias("cents"))
    )
    return _q143_impl(rev)


Q143_GIANT_SEGMENT_ROWS = 15_000


def _q143_impl(rev: DataFrame) -> DataFrame:
    """q143 core over a (segment, custkey, cents) DataFrame (factored
    out so tests can drive the giant-segment branch synthetically)."""
    max_seg = (
        rev.groupBy("segment")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]["m"]
    ) or 0
    if max_seg > Q143_GIANT_SEGMENT_ROWS:
        from iceberg_daq_spark.operators.ranking import grouped_rank

        totals = rev.groupBy("segment").agg(F.sum("cents").alias("total"))
        g = grouped_rank(rev, ["segment"], ["cents", "custkey"])
        ranked = g.select(
            "segment",
            "cents",
            F.col("_grank").alias("i"),
            F.col("_gtotal").alias("n"),
        ).join(F.broadcast(totals), "segment")
    else:
        wseg = Window.partitionBy("segment")
        ranked = rev.select(
            "segment",
            "cents",
            F.row_number()
            .over(wseg.orderBy("cents", "custkey"))
            .cast("bigint")
            .alias("i"),
            F.count("*").over(wseg).alias("n"),
            F.sum("cents").over(wseg).alias("total"),
        )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.max("total").alias("total_cents"),
            F.round(
                (2.0 * F.sum(F.col("i") * F.col("cents")))
                / (F.max("n").cast("double") * F.max("total"))
                - (F.max("n") + 1.0) / F.max("n"),
                4,
            ).alias("gini"),
            F.round(
                F.sum(
                    F.when(
                        F.col("i") > F.col("n") - F.expr("n div 10"),
                        F.col("cents"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.max("total"),
                4,
            ).alias("top_decile_share"),
        )
        .orderBy("segment")
    )


@register(
    "q144_benford_first_digit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ), counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (), 4) AS obs_share,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 4) AS benford_share,
           round((CAST(n AS DOUBLE) / sum(n) OVER ()
                  - ln(1.0 + 1.0 / digit) / ln(10.0))
                 * sqrt(sum(n) OVER ())
                 / sqrt(ln(1.0 + 1.0 / digit) / ln(10.0)
                        * (1.0 - ln(1.0 + 1.0 / digit) / ln(10.0))), 2)
             AS z_score
    FROM counts
    ORDER BY digit
    """,
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: the
    distribution of leading digits against the log10(1 + 1/d)
    expectation, with a per-digit binomial z-score - the classic
    forensic-accounting / synthetic-data fraud screen.

    The leading digit comes from the DECIMAL STRING of the exact
    cent amount (substr of the BIGINT's text), never from
    floor(log10(x)) arithmetic - log10 of an exact power of ten can
    land a hair below the integer and misclassify the digit, and
    the two engines would disagree exactly there.  100 TB shape:
    map-side digit extraction, one 9-row partial agg, window math
    over the 9-row table."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wall = Window.partitionBy()
    total = F.sum("n").over(wall)
    obs = F.col("n").cast("double") / total
    exp_share = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return counts.select(
        "digit",
        "n",
        F.round(obs, 4).alias("obs_share"),
        F.round(exp_share, 4).alias("benford_share"),
        F.round(
            (obs - exp_share)
            * F.sqrt(total)
            / F.sqrt(exp_share * (1.0 - exp_share)),
            2,
        ).alias("z_score"),
    ).orderBy("digit")


@register(
    "q146_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_lo,
           CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_hi,
           round(max(b.lo), 4) AS p05,
           round(max(b.hi), 4) AS p95,
           round(avg(CASE WHEN e.value < b.lo THEN b.lo
                          WHEN e.value > b.hi THEN b.hi
                          ELSE e.value END), 4) AS winsor_mean,
           round(stddev_samp(CASE WHEN e.value < b.lo THEN b.lo
                                  WHEN e.value > b.hi THEN b.hi
                                  ELSE e.value END), 4) AS winsor_sd,
           round(avg(e.value), 4) AS raw_mean
    FROM events e JOIN b ON b.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/stddev per event type: clamp each value into
    its type's [p05, p95] band and re-aggregate - the
    outlier-robust summary that, unlike trimming, keeps n constant;
    reported next to the raw mean so the outlier pull is visible,
    with clip counts as the audit trail.  Complements q131's
    median/MAD census (detection) with the REPAIR side
    (winsorization).

    100 TB shape: exact per-type percentiles (bounded group count -
    the q74 calibration pattern; percentile_approx is the documented
    unbounded-group substitute), broadcast the tiny per-type band
    table back onto the stream, clamp map-side, one partial+final
    agg.  Percentile interpolation arithmetic is identical to
    DuckDB's quantile_cont; the clamped-mean double summation is
    rounded at 4 decimals, far above noise."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("lo"),
        F.percentile("value", 0.95).alias("hi"),
    )
    clamped = F.when(F.col("value") < F.col("lo"), F.col("lo")).otherwise(
        F.when(F.col("value") > F.col("hi"), F.col("hi")).otherwise(
            F.col("value")
        )
    )
    return (
        e.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_hi"),
            F.round(F.max("lo"), 4).alias("p05"),
            F.round(F.max("hi"), 4).alias("p95"),
            F.round(F.avg(clamped), 4).alias("winsor_mean"),
            F.round(F.stddev_samp(clamped), 4).alias("winsor_sd"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "q161_ks_two_sample",
    oracle="""
    WITH v AS (
      SELECT round(value, 3) AS x,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      FROM events WHERE event_type IN ('purchase', 'view')
    ), grid AS (
      SELECT x,
             CAST(sum(a) AS BIGINT) AS ca,
             CAST(sum(b) AS BIGINT) AS cb
      FROM v GROUP BY x
    ), cdf AS (
      SELECT abs(CAST(sum(ca) OVER w AS DOUBLE) / sum(ca) OVER ()
                 - CAST(sum(cb) OVER w AS DOUBLE) / sum(cb) OVER ()) AS gap,
             sum(ca) OVER () AS na, sum(cb) OVER () AS nb
      FROM grid
      WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
    )
    SELECT round(max(gap), 4) AS ks_d,
           CAST(max(na) AS BIGINT) AS n_purchase,
           CAST(max(nb) AS BIGINT) AS n_view,
           round(max(gap) / (1.358 * sqrt((CAST(max(na) AS DOUBLE)
                                           + max(nb))
                                          / (CAST(max(na) AS DOUBLE)
                                             * max(nb)))), 2)
             AS d_over_crit_5pct
    FROM cdf
    """,
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    purchase- and view-value distributions: the supremum gap between
    the two empirical CDFs, reported against the 5% critical value -
    the distribution-equality test that closes the drift toolkit
    (q147's PSI bins, q159's QQ shape, and now the exact sup-norm
    with significance).

    The CDF grid quantizes values to 3 decimals FIRST on both
    engines (the production move that bounds the grid by value
    space instead of row count - the sup over the coarsened grid is
    exact for the coarsened distributions), so everything after the
    one partial-agg shuffle is value-space-sized: cumulative AND
    total window sums over the grid (totals as windows, not a
    separate aggregate - a second aggregate of the grid would
    re-execute the whole reduction and scan events twice), exact
    BIGINT counts, fixed-shape gap doubles, one max.  The
    unpartitioned windows are safe by construction - their input is
    the bounded grid."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    v = e.select(
        F.round("value", 3).alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    )
    grid = v.groupBy("x").agg(
        F.sum("a").cast("bigint").alias("ca"),
        F.sum("b").cast("bigint").alias("cb"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cdf = grid.select(
        F.abs(
            F.sum("ca").over(w).cast("double") / F.sum("ca").over(wall)
            - F.sum("cb").over(w).cast("double") / F.sum("cb").over(wall)
        ).alias("gap"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return cdf.agg(
        F.round(F.max("gap"), 4).alias("ks_d"),
        F.max("na").alias("n_purchase"),
        F.max("nb").alias("n_view"),
        F.round(
            F.max("gap")
            / (
                1.358
                * F.sqrt(
                    (F.max("na").cast("double") + F.max("nb"))
                    / (F.max("na").cast("double") * F.max("nb"))
                )
            ),
            2,
        ).alias("d_over_crit_5pct"),
    )
