"""Q180-Q186: the forecasting / quantitative battery.

Seasonal decomposition, forecast backtesting, floored running
balances, max drawdown, bigram-LM perplexity, weekend lift, and A/B
power analysis - the reads that sit between the drift tests
(queries/stats.py) and the experimentation battery (queries/market.py).

Determinism discipline: daily revenue reduces to exact BIGINT cents;
detrending multiplies through by the window size so deviations stay
integer (dev7 = 7*cents - sum7); forecast error is WAPE
(sum|a-f| / sum a, both BIGINT) rather than an order-sensitive mean
of per-day ratios; running balances and drawdowns are pure BIGINT
window arithmetic; perplexity quantizes each token's log-probability
to BIGINT micro-nats before summing so the per-doc reduction is
order-insensitive integer addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


def _cents(col: str = "value"):
    return F.round(F.col(col) * 100).cast("bigint")


@register(
    "q180_seasonal_dow_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), win AS (
      SELECT d, cents,
             CAST(sum(cents) OVER w AS BIGINT) AS sum7,
             CAST(count(*) OVER w AS BIGINT) AS n7
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT d % 7 AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(7 * cents - sum7) / (700.0 * count(*)), 2)
             AS seasonal_idx
    FROM win WHERE n7 = 7
    GROUP BY 1 ORDER BY 1
    """,
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, the day-of-week component: daily
    purchase revenue detrended by a centered 7-observation moving
    average, averaged per weekday - the "Mondays run $X below trend"
    index (dow 0 = the epoch's Thursday).

    Detrending never leaves the integers: dev = 7*cents - sum7 is an
    exact BIGINT per day (x7 clears the moving-average division), the
    per-dow index is one fixed-shape division of BIGINT sums, and
    edge days with fewer than 7 observed neighbors are excluded by an
    integer count - the rows frame spans OBSERVED days, identical on
    both engines.  100 TB shape: one scan reduced to the day grid
    (bounded by the time span, not rows) before any window."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("d")
    ).agg(F.sum(_cents()).cast("bigint").alias("cents"))
    w = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("sum7"),
        F.count("*").over(w).cast("bigint").alias("n7"),
    )
    return (
        win.filter(F.col("n7") == 7)
        .groupBy((F.col("d") % 7).alias("dow"))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(
                F.sum(7 * F.col("cents") - F.col("sum7"))
                / (700.0 * F.count("*")),
                2,
            ).alias("seasonal_idx"),
        )
        .orderBy("dow")
    )


@register(
    "q181_wape_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(sum(abs(a.cents - f.cents)) * 1.0 / sum(a.cents), 4)
             AS wape,
           round((sum(f.cents) - sum(a.cents)) * 1.0 / sum(a.cents), 4)
             AS bias
    FROM daily a JOIN daily f
      ON f.event_type = a.event_type AND f.d = a.d - 7
    GROUP BY 1 ORDER BY 1
    """,
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest of the seasonal-naive model (forecast = the
    value 7 days earlier) on daily per-type revenue: WAPE (weighted
    absolute percentage error) and signed bias per event type.

    WAPE aggregates sum|actual - forecast| / sum(actual) - both exact
    BIGINT sums - instead of averaging per-day ratios (an
    order-sensitive float mean the engines could disagree on).  100 TB
    shape: one scan reduces to the (type, day) grid, pinned with
    localCheckpoint so the self-join at lag 7 reads the reduction
    twice without re-scanning events; the grid is time-span-sized."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("d"),
        )
        .agg(F.sum(_cents()).cast("bigint").alias("cents"))
        .localCheckpoint()
    )
    a = daily.select("event_type", "d", F.col("cents").alias("a_cents"))
    f_ = daily.select(
        F.col("event_type").alias("f_type"),
        (F.col("d") + 7).alias("f_d"),
        F.col("cents").alias("f_cents"),
    )
    return (
        a.join(
            f_,
            (a.event_type == f_.f_type) & (a.d == f_.f_d),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(
                F.sum(F.abs(F.col("a_cents") - F.col("f_cents")))
                * 1.0
                / F.sum("a_cents"),
                4,
            ).alias("wape"),
            F.round(
                (F.sum("f_cents") - F.sum("a_cents")) * 1.0 / F.sum("a_cents"),
                4,
            ).alias("bias"),
        )
        .orderBy("event_type")
    )


@register(
    "q182_floored_balance",
    oracle="""
    WITH flow AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN -CAST(round(value * 100) AS BIGINT)
                  ELSE CAST(round(value * 100) AS BIGINT) END AS delta
      FROM events
    ), pre AS (
      SELECT user_id,
             CAST(sum(delta) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS s
      FROM flow
    ), agg AS (
      SELECT user_id, CAST(max(s) AS BIGINT) AS _unused_max,
             CAST(min(s) AS BIGINT) AS min_s,
             CAST(count(*) AS BIGINT) AS n_events
      FROM pre GROUP BY user_id
    ), tot AS (
      SELECT user_id, CAST(sum(delta) AS BIGINT) AS total
      FROM flow GROUP BY user_id
    )
    SELECT a.user_id,
           round((t.total - least(0, a.min_s)) / 100.0, 2) AS balance,
           round(t.total / 100.0, 2) AS net_flow,
           a.n_events
    FROM agg a JOIN tot t ON t.user_id = a.user_id
    ORDER BY t.total - least(0, a.min_s) DESC, a.user_id
    LIMIT 20
    """,
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floored running balance: each user earns value cents on
    non-purchase events and spends on purchases, with the balance
    clamped at zero (spend never goes negative) - the points-ledger /
    prepaid-wallet read.  Top 20 final balances.

    The clamp has a closed form that avoids per-row recursion:
    final = total - min(0, running-min of the prefix sums) - so one
    cumulative-sum window and a per-user min replace the sequential
    fold, and everything is exact BIGINT cents.  100 TB shape: one
    scan, ONE user-partitioned window shuffle (the per-user agg reuses
    the same partitioning), TakeOrdered top-20."""
    e = load(spark, sf_dir, "events")
    delta = F.when(
        F.col("event_type") == "purchase", -_cents()
    ).otherwise(_cents())
    flow = e.select("user_id", "ts", "event_id", delta.alias("delta"))
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = flow.select(
        "user_id",
        "delta",
        F.sum("delta").over(wcum).cast("bigint").alias("s"),
    )
    agg = pre.groupBy("user_id").agg(
        F.min("s").cast("bigint").alias("min_s"),
        F.sum("delta").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    balance = F.col("total") - F.least(F.lit(0), F.col("min_s"))
    return (
        agg.select(
            "user_id",
            F.round(balance / 100.0, 2).alias("balance"),
            F.round(F.col("total") / 100.0, 2).alias("net_flow"),
            "n_events",
            balance.alias("_bal_exact"),
        )
        .orderBy(F.col("_bal_exact").desc(), "user_id")
        .limit(20)
        .drop("_bal_exact")
    )


@register(
    "q183_max_drawdown",
    oracle="""
    WITH flow AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN -CAST(round(value * 100) AS BIGINT)
                  ELSE CAST(round(value * 100) AS BIGINT) END AS delta
      FROM events
    ), pre AS (
      SELECT user_id, s,
             CAST(max(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS peak
      FROM (
        SELECT user_id, ts, event_id,
               CAST(sum(delta) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS s
        FROM flow)
    )
    SELECT user_id,
           round(max(peak - s) / 100.0, 2) AS max_drawdown,
           round(max(peak) / 100.0, 2) AS peak_value,
           CAST(count(*) AS BIGINT) AS n_points
    FROM pre GROUP BY user_id
    ORDER BY max(peak - s) DESC, user_id
    LIMIT 20
    """,
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown per user over the SIGNED net-flow curve (earn on
    non-purchase events, spend on purchases - the q182 ledger): the
    largest peak-to-trough drop, the risk measure behind "how deep
    does this account dig before recovering".  Top 20 drawdowns.

    Pure BIGINT window arithmetic: prefix sum, running max of the
    prefix sum over the SAME (user, ts, event_id) ordering - Spark
    plans both windows over one user-partitioned sort, one shuffle -
    then max(peak - s) per user and a TakeOrdered top-20 with a
    user_id tiebreak."""
    e = load(spark, sf_dir, "events")
    delta = F.when(
        F.col("event_type") == "purchase", -_cents()
    ).otherwise(_cents())
    flow = e.select("user_id", "ts", "event_id", delta.alias("delta"))
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = flow.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("delta").over(wcum).cast("bigint").alias("s"),
    ).select(
        "user_id",
        "s",
        F.max("s").over(wcum).cast("bigint").alias("peak"),
    )
    return (
        pre.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("s")).alias("_dd_exact"),
            F.round(F.max("peak") / 100.0, 2).alias("peak_value"),
            F.count("*").cast("bigint").alias("n_points"),
        )
        .orderBy(F.col("_dd_exact").desc(), "user_id")
        .limit(20)
        .select(
            "user_id",
            F.round(F.col("_dd_exact") / 100.0, 2).alias("max_drawdown"),
            "peak_value",
            "n_points",
        )
    )


@register(
    "q184_weekend_lift",
    oracle="""
    WITH marked AS (
      SELECT event_type,
             CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7
                  IN (2, 3) THEN 1 ELSE 0 END AS wk
      FROM events
    ), g AS (
      SELECT event_type,
             CAST(sum(wk) AS BIGINT) AS n_we,
             CAST(sum(1 - wk) AS BIGINT) AS n_wd
      FROM marked GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(n_we) AS BIGINT) AS t_we,
             CAST(sum(n_wd) AS BIGINT) AS t_wd
      FROM g
    )
    SELECT g.event_type, g.n_we, g.n_wd,
           round((CAST(g.n_we AS DOUBLE) / t.t_we)
                 / (CAST(g.n_wd AS DOUBLE) / t.t_wd), 4) AS lift
    FROM g CROSS JOIN tot t
    ORDER BY g.event_type
    """,
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend lift: each event type's share of weekend traffic
    relative to its share of weekday traffic (epoch day % 7 in {2,3}
    = Saturday/Sunday) - lift > 1 means the behavior skews weekend.

    One scan, one 5-group agg of exact BIGINT counts (pinned with
    localCheckpoint so the totals row and the scoring both read it
    without re-scanning events), one broadcast totals row, fixed-shape
    share-of-share division."""
    e = load(spark, sf_dir, "events")
    wk = (
        (F.floor(F.col("ts").cast("double") / 86400).cast("bigint") % 7).isin(2, 3)
    ).cast("int")
    g = (
        e.select("event_type", wk.alias("wk"))
        .groupBy("event_type")
        .agg(
            F.sum("wk").cast("bigint").alias("n_we"),
            F.sum(1 - F.col("wk")).cast("bigint").alias("n_wd"),
        )
        .localCheckpoint()
    )
    tot = g.agg(
        F.sum("n_we").cast("bigint").alias("t_we"),
        F.sum("n_wd").cast("bigint").alias("t_wd"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_we",
            "n_wd",
            F.round(
                (F.col("n_we").cast("double") / F.col("t_we"))
                / (F.col("n_wd").cast("double") / F.col("t_wd")),
                4,
            ).alias("lift"),
        )
        .orderBy("event_type")
    )


@register(
    "q185_power_analysis",
    oracle="""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events
    )
    SELECT CAST(mde AS DOUBLE) AS mde,
           round(CAST(x AS DOUBLE) / n, 4) AS base_rate,
           CAST(ceil(2 * 7.849 * (CAST(x AS DOUBLE) / n)
                     * (1 - CAST(x AS DOUBLE) / n)
                     / (CAST(mde AS DOUBLE) * CAST(mde AS DOUBLE)))
                AS BIGINT) AS n_per_arm
    FROM base
    CROSS JOIN (SELECT unnest([0.005, 0.01, 0.02, 0.03, 0.05]) AS mde)
    ORDER BY mde
    """,
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test power analysis: for a grid of minimum detectable
    effects (absolute lift in the purchase rate), the per-arm sample
    size at alpha=0.05 two-sided / 80% power - n = 2 (z_a+z_b)^2
    p(1-p) / mde^2 with (1.96 + 0.8416)^2 = 7.849 folded to a literal.

    The base rate comes from one exact-count pass; the five-row MDE
    grid is a literal explode, the sizing a fixed-shape expression.
    The purchase-event rate sits strictly inside (0,1), and ceil()
    lands on clean non-boundary doubles for any realistic rate."""
    e = load(spark, sf_dir, "events")
    base = e.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    grid = F.explode(
        F.array(*[F.lit(v) for v in (0.005, 0.01, 0.02, 0.03, 0.05)])
    ).alias("mde")
    p = F.col("x").cast("double") / F.col("n")
    return (
        base.select("n", "x", grid)
        .select(
            "mde",
            F.round(p, 4).alias("base_rate"),
            F.ceil(2 * 7.849 * p * (1 - p) / (F.col("mde") * F.col("mde")))
            .cast("bigint")
            .alias("n_per_arm"),
        )
        .orderBy("mde")
    )
