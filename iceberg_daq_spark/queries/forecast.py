"""Q220-Q222: forecasting battery - sequential-recurrence smoothing,
autocorrelation diagnostics, and classical seasonal decomposition.

The new technique here is the EXACT INTEGER RECURRENCE FOLD (q220):
Holt's linear-trend method is a true sequential recurrence (no closed
form, unlike q182's clamp), but the series it runs over is bounded by
the CALENDAR, not the data volume - 100 TB of orders over the same
seven years still reduces to ~80 monthly cells.  So the distributed
work is the monthly aggregation; the recurrence itself folds over one
sorted in-memory array with ``F.aggregate``, and every state update
is exact BIGINT-cents arithmetic (floor division via pmod-subtraction,
identical on both engines), so the DuckDB recursive-CTE oracle
reproduces it bit-for-bit - no float fold anywhere.

Q221/Q222 are fixed-shape arithmetic over exact integer sums (counts
and cents), following the q190/q218 quantization discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


def _monthly_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders reduced to (month, revenue-cents) cells - exact BIGINT."""
    o = load(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )


# Exact floor division by a positive literal: subtracting the
# non-negative pmod remainder makes the dividend exactly divisible, so
# integer `div` is exact and floor-consistent for negative dividends
# too (Spark's bare `div` truncates toward zero; DuckDB's `//` floors -
# this form sidesteps both).
def _fdiv(expr: str, d: int) -> str:
    return f"(({expr}) - pmod(({expr}), {d})) div {d}"


def _fdiv_duck(expr: str, d: int) -> str:
    return f"(({expr}) - ((((({expr})) % {d}) + {d}) % {d})) // {d}"


@register(
    "q220_holt_forecast",
    oracle=f"""
    WITH RECURSIVE monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY mon
    ), m AS (
      SELECT row_number() OVER (ORDER BY mon) AS t, cents FROM monthly
    ), hw AS (
      SELECT (SELECT max(t) FROM m) AS tmax,
             (SELECT cents FROM m WHERE t = 1) AS x1,
             (SELECT cents FROM m WHERE t = 2) AS x2
    ), fold AS (
      -- anchor at t=2: level = x2, trend = x2 - x1, mae accumulator 0
      SELECT 2 AS t, x2 AS l, x2 - x1 AS b, CAST(0 AS BIGINT) AS e,
             tmax FROM hw
      UNION ALL
      SELECT f.t + 1,
             {_fdiv_duck('3 * x.cents + 7 * (f.l + f.b)', 10)},
             {_fdiv_duck(
                 '2 * (' + _fdiv_duck('3 * x.cents + 7 * (f.l + f.b)', 10)
                 + ' - f.l) + 8 * f.b', 10)},
             f.e + abs(x.cents - (f.l + f.b)),
             f.tmax
      FROM fold f JOIN m x ON x.t = f.t + 1
      WHERE f.t < f.tmax
    ), final AS (
      SELECT l, b, e, tmax FROM fold WHERE t = tmax
    )
    SELECT CAST(h.h AS BIGINT) AS horizon,
           round((f.l + h.h * f.b) / 100.0, 2) AS forecast,
           round(f.l / 100.0, 2) AS final_level,
           round(f.b / 100.0, 2) AS final_trend,
           round(f.e / (f.tmax - 2) / 100.0, 2) AS fit_mae
    FROM final f JOIN unnest([1, 2, 3]) AS h(h) ON TRUE
    ORDER BY horizon
    """,
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of monthly revenue, horizons 1-3.

    The recurrence (alpha=0.3, beta=0.2, both exact rationals):
      l_t = (3*x_t + 7*(l+b)) fdiv 10
      b_t = (2*(l_t - l) + 8*b) fdiv 10
    anchored at l_2 = x_2, b_2 = x_2 - x_1, with the one-step-ahead
    MAE |x_t - (l+b)| accumulated alongside.  All state is BIGINT
    cents; fdiv is exact floor division (see module docstring), so
    Spark's ``F.aggregate`` fold and the oracle's recursive CTE march
    through IDENTICAL integer states.

    100 TB shape: the only full-data pass is the monthly partial agg
    (map-side combinable, ~80 output cells); the fold runs over one
    sorted 80-element array in a single task.  Series length is
    calendar-bounded - it does not grow with data volume."""
    monthly = _monthly_cents(spark, sf_dir)
    xs = monthly.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("mon"), F.col("cents")))
        ).alias("cells")
    ).select(F.expr("transform(cells, c -> c.cents)").alias("xs"))

    lt = _fdiv("3 * x + 7 * (acc.l + acc.b)", 10)
    bt = _fdiv(f"2 * (({lt}) - acc.l) + 8 * acc.b", 10)
    fold = xs.select(
        F.size("xs").alias("tmax"),
        F.expr(
            f"""
            aggregate(
              slice(xs, 3, size(xs) - 2),
              named_struct(
                'l', xs[1], 'b', xs[1] - xs[0], 'e', CAST(0 AS BIGINT)),
              (acc, x) -> named_struct(
                'l', {lt},
                'b', {bt},
                'e', acc.e + abs(x - (acc.l + acc.b))))
            """
        ).alias("st"),
    )
    h = spark.range(1, 4).select(F.col("id").cast("bigint").alias("horizon"))
    return (
        fold.crossJoin(F.broadcast(h))
        .select(
            "horizon",
            F.round(
                (F.col("st.l") + F.col("horizon") * F.col("st.b")) / 100.0, 2
            ).alias("forecast"),
            F.round(F.col("st.l") / 100.0, 2).alias("final_level"),
            F.round(F.col("st.b") / 100.0, 2).alias("final_trend"),
            F.round(
                F.col("st.e") / (F.col("tmax") - 2) / 100.0, 2
            ).alias("fit_mae"),
        )
        .orderBy("horizon")
    )


@register(
    "q221_acf_ljung_box",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY day
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    pairs AS (
      SELECT l.lag AS lag, a.cents AS x, b.cents AS y
      FROM unnest(range(1, 11)) AS l(lag)
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + l.lag
    ), acf AS (
      SELECT lag, round(corr(x, y), 4) AS r,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, r AS acf,
           n_pairs,
           round(sum(n.n * (n.n + 2) * r * r / (n.n - lag))
                 OVER (ORDER BY lag), 4) AS ljung_box_q
    FROM acf, n ORDER BY lag
    """,
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1-10 with the
    cumulative Ljung-Box portmanteau statistic
    Q(k) = n(n+2) * sum_{j<=k} r_j^2 / (n-j) - "is this series white
    noise" in one table.  q148 answers which OTHER series leads this
    one; this answers whether the series predicts ITSELF.

    Correlation at each lag is computed over the exact integer
    (cents, cents) pairs of the lag-aligned self-join, then ROUNDED to
    4 decimals BEFORE the Q accumulation, so both engines fold
    identical rational values (the q148 rounded-rank discipline,
    applied to a sum).  100 TB shape: one partial agg to ~2400 daily
    cells, a broadcast 10-row lag expansion, equi-join on shifted day,
    10 output groups - everything past the first agg is metadata-
    sized."""
    o = load(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(
        F.floor(F.col("o_orderdate").cast("double") / 86400)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    n_days = daily.agg(F.count("*").cast("bigint").alias("n"))
    lags = spark.range(1, 11).select(F.col("id").cast("bigint").alias("lag"))
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    b = daily.alias("b")
    acf = (
        a.join(b, F.col("b.day") == F.col("a.day") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.round(F.corr(F.col("a.cents"), F.col("b.cents")), 4).alias("r"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
    )
    w = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return (
        acf.crossJoin(F.broadcast(n_days))
        .select(
            "lag",
            F.col("r").alias("acf"),
            "n_pairs",
            F.round(
                F.sum(
                    F.col("n")
                    * (F.col("n") + 2)
                    * F.col("r")
                    * F.col("r")
                    / (F.col("n") - F.col("lag"))
                ).over(w),
                4,
            ).alias("ljung_box_q"),
        )
        .orderBy("lag")
    )


@register(
    "q222_seasonal_decomposition",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY mon
    ), idx AS (
      SELECT mon, cents,
             CAST(month(mon) AS BIGINT) AS cal_month,
             row_number() OVER (ORDER BY mon) AS t,
             CAST(count(*) OVER () AS BIGINT) AS tmax
      FROM monthly
    ), trend AS (
      -- centered 12-term MA: half-weight endpoints, exact in
      -- half-cents (x2 scaling keeps everything integral)
      SELECT i.mon, i.cents, i.cal_month,
             CAST(sum(CASE WHEN j.t IN (i.t - 6, i.t + 6)
                           THEN j.cents ELSE 2 * j.cents END)
                  AS BIGINT) AS tr_halfcents_x24
      FROM idx i JOIN idx j ON j.t BETWEEN i.t - 6 AND i.t + 6
      WHERE i.t > 6 AND i.t <= i.tmax - 6
      GROUP BY i.mon, i.cents, i.cal_month
      HAVING count(*) = 13
    ), ratio AS (
      SELECT cal_month,
             round(avg(cents * 24.0 / tr_halfcents_x24), 4) AS seasonal_idx,
             CAST(count(*) AS BIGINT) AS n_obs,
             round(stddev_samp(cents * 24.0 / tr_halfcents_x24), 4)
               AS remainder_sd
      FROM trend GROUP BY cal_month
    )
    SELECT cal_month, seasonal_idx, n_obs, remainder_sd
    FROM ratio ORDER BY cal_month
    """,
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative decomposition of monthly revenue:
    detrend by the centered 12-month moving average (the standard
    2x12 MA - half-weight on the two endpoint months so the window
    stays calendar-centered), then the per-calendar-month mean of the
    detrended ratio is the seasonal index and its spread is the
    remainder volatility.  q180 rates days-of-week against a global
    mean; this isolates ANNUAL seasonality from a multi-year trend,
    which a global-mean ratio conflates.

    Determinism: the MA numerator stays an exact BIGINT (x24 scaling
    absorbs both the half-weights and the /12), each month's
    detrended ratio is one double division of two integers, and
    avg/stddev run over <=7 such values per calendar month - rounded
    at 4 decimals with no large-fold ambiguity.  100 TB shape: one
    partial agg to ~80 cells, then a self-join over a broadcast-sized
    table; everything after the first agg is metadata-sized."""
    monthly = _monthly_cents(spark, sf_dir)
    idx = monthly.select(
        "mon",
        "cents",
        F.month("mon").cast("bigint").alias("cal_month"),
        F.row_number().over(Window.orderBy("mon")).alias("t"),
        F.count("*").over(
            Window.partitionBy()
        ).cast("bigint").alias("tmax"),
    )
    i = idx.alias("i")
    j = idx.alias("j")
    trend = (
        i.join(
            j,
            (F.col("j.t") >= F.col("i.t") - 6)
            & (F.col("j.t") <= F.col("i.t") + 6),
        )
        .filter((F.col("i.t") > 6) & (F.col("i.t") <= F.col("i.tmax") - 6))
        .groupBy(
            F.col("i.mon").alias("mon"),
            F.col("i.cents").alias("cents"),
            F.col("i.cal_month").alias("cal_month"),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("j.t") == F.col("i.t") - 6)
                    | (F.col("j.t") == F.col("i.t") + 6),
                    F.col("j.cents"),
                ).otherwise(2 * F.col("j.cents"))
            )
            .cast("bigint")
            .alias("tr_halfcents_x24"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") == 13)
    )
    ratio = F.col("cents") * 24.0 / F.col("tr_halfcents_x24")
    return (
        trend.groupBy("cal_month")
        .agg(
            F.round(F.avg(ratio), 4).alias("seasonal_idx"),
            F.count("*").cast("bigint").alias("n_obs"),
            F.round(F.stddev_samp(ratio), 4).alias("remainder_sd"),
        )
        .orderBy("cal_month")
    )


# ---- Q232: Holt-Winters additive (level + trend + 12-month seasonal) --

_HW_LT = _fdiv("3 * (x - element_at(acc.s, 1)) + 7 * (acc.l + acc.b)", 10)
_HW_BT = _fdiv(f"2 * (({_HW_LT}) - acc.l) + 8 * acc.b", 10)
_HW_ST = _fdiv(f"(x - ({_HW_LT})) + 9 * element_at(acc.s, 1)", 10)

_HW_LT_D = _fdiv_duck("3 * (x.cents - f.s[1]) + 7 * (f.l + f.b)", 10)
_HW_BT_D = _fdiv_duck(f"2 * (({_HW_LT_D}) - f.l) + 8 * f.b", 10)
_HW_ST_D = _fdiv_duck(f"(x.cents - ({_HW_LT_D})) + 9 * f.s[1]", 10)


@register(
    "q232_holt_winters",
    oracle=f"""
    WITH RECURSIVE monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY mon
    ), m AS (
      SELECT row_number() OVER (ORDER BY mon) AS t, cents FROM monthly
    ), xs AS (
      SELECT list(cents ORDER BY t) AS a, CAST(count(*) AS BIGINT) AS tmax
      FROM m
    ), init1 AS (
      SELECT a, tmax,
             {_fdiv_duck('list_sum(a[1:12])', 12)} AS l0,
             {_fdiv_duck('list_sum(a[13:24]) - list_sum(a[1:12])', 144)}
               AS b0
      FROM xs
    ), init AS (
      SELECT tmax, l0, b0,
             list_transform(a[1:12], v -> v - l0) AS s0
      FROM init1
    ), fold AS (
      SELECT CAST(12 AS BIGINT) AS t, l0 AS l, b0 AS b,
             CAST(0 AS BIGINT) AS e, s0 AS s, tmax
      FROM init
      UNION ALL
      SELECT f.t + 1,
             {_HW_LT_D},
             {_HW_BT_D},
             f.e + abs(x.cents - (f.l + f.b + f.s[1])),
             list_append(f.s[2:12], {_HW_ST_D}),
             f.tmax
      FROM fold f JOIN m x ON x.t = f.t + 1
      WHERE f.t < f.tmax
    ), final AS (
      SELECT l, b, e, s, tmax FROM fold WHERE t = tmax
    )
    SELECT CAST(h.h AS BIGINT) AS horizon,
           round((f.l + h.h * f.b + f.s[h.h]) / 100.0, 2) AS forecast,
           round(f.s[h.h] / 100.0, 2) AS seasonal,
           round(f.l / 100.0, 2) AS final_level,
           round(f.b / 100.0, 2) AS final_trend,
           round(f.e / (f.tmax - 12) / 100.0, 2) AS fit_mae
    FROM final f JOIN unnest([1, 2, 3, 4, 5, 6]) AS h(h) ON TRUE
    ORDER BY horizon
    """,
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive forecast (level + trend + 12-month
    seasonality) of monthly revenue, horizons 1-6 - the full seasonal
    upgrade of q220, and the hardest recurrence in the inventory: the
    fold state is a STRUCT CARRYING A 12-ELEMENT SEASONAL ARRAY that
    rotates every step.

    alpha=3/10, beta=2/10, gamma=1/10 as exact rationals; every state
    component stays BIGINT cents via pmod-floor division; the seasonal
    ring buffer rotates by slice-and-append on both engines (Spark
    ``aggregate`` lambda vs DuckDB recursive CTE with list_append), so
    the engines march through identical (level, trend, seasonal[12])
    states.  Init: l = mean of year 1, b = (year-2 mean - year-1
    mean)/12, s_i = x_i - l (all floor-exact).  One-step-ahead MAE
    accumulates alongside.  100 TB shape: identical to q220 - the
    only full-data pass is the monthly partial agg; the fold is one
    task over a calendar-bounded array."""
    monthly = _monthly_cents(spark, sf_dir)
    xs = monthly.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("mon"), F.col("cents")))
        ).alias("cells")
    ).select(F.expr("transform(cells, c -> c.cents)").alias("xs"))
    prep = (
        xs.withColumn("tmax", F.size("xs"))
        .withColumn(
            "l0",
            F.expr(
                _fdiv(
                    "aggregate(slice(xs, 1, 12), CAST(0 AS BIGINT),"
                    " (acc, x) -> acc + x)",
                    12,
                )
            ),
        )
        .withColumn(
            "b0",
            F.expr(
                _fdiv(
                    "aggregate(slice(xs, 13, 12), CAST(0 AS BIGINT),"
                    " (acc, x) -> acc + x)"
                    " - aggregate(slice(xs, 1, 12), CAST(0 AS BIGINT),"
                    " (acc, x) -> acc + x)",
                    144,
                )
            ),
        )
        .withColumn("s0", F.expr("transform(slice(xs, 1, 12), v -> v - l0)"))
    )
    fold = prep.select(
        "tmax",
        F.expr(
            f"""
            aggregate(
              slice(xs, 13, size(xs) - 12),
              named_struct('l', l0, 'b', b0, 'e', CAST(0 AS BIGINT),
                           's', s0),
              (acc, x) -> named_struct(
                'l', {_HW_LT},
                'b', {_HW_BT},
                'e', acc.e + abs(x - (acc.l + acc.b + element_at(acc.s, 1))),
                's', concat(slice(acc.s, 2, 11), array({_HW_ST}))))
            """
        ).alias("st"),
    )
    h = spark.range(1, 7).select(F.col("id").cast("bigint").alias("horizon"))
    return (
        fold.crossJoin(F.broadcast(h))
        .select(
            "horizon",
            F.round(
                (
                    F.col("st.l")
                    + F.col("horizon") * F.col("st.b")
                    + F.expr("element_at(st.s, CAST(horizon AS INT))")
                )
                / 100.0,
                2,
            ).alias("forecast"),
            F.round(
                F.expr("element_at(st.s, CAST(horizon AS INT))") / 100.0, 2
            ).alias("seasonal"),
            F.round(F.col("st.l") / 100.0, 2).alias("final_level"),
            F.round(F.col("st.b") / 100.0, 2).alias("final_trend"),
            F.round(F.col("st.e") / (F.col("tmax") - 12) / 100.0, 2).alias(
                "fit_mae"
            ),
        )
        .orderBy("horizon")
    )
