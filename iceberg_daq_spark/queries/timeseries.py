"""Q116/Q118: time-series resampling and trend fitting.

The two ops every metrics store ships over an event stream: resample
to a regular grid (scaffold the missing buckets, zero the counts,
forward-fill the last observation) and fit a per-series linear trend
(``regr_slope``-family one-pass aggregates).  Both pre-reduce the raw
stream to (series, bucket) cells first, so every later stage is sized
by series-count x time-span - independent of input row count - and
both keep all arithmetic in epoch-second integer space so no
timezone- or calendar-dependent truncation can disagree across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows


@register(
    "q116_gapfill_resample",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             avg(value) AS av
      FROM events GROUP BY event_type, hr
    ), r AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM d GROUP BY event_type
    ), s AS (
      SELECT r.event_type, CAST(u.hr AS BIGINT) AS hr
      FROM r, unnest(range(r.lo, r.hi + 1)) AS u(hr)
    ), j AS (
      SELECT s.event_type, s.hr, d.n, d.av
      FROM s LEFT JOIN d ON d.event_type = s.event_type AND d.hr = s.hr
    )
    SELECT event_type, hr,
           coalesce(n, 0) AS n_events,
           round(last_value(av IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS filled_avg,
           n IS NULL AS is_gap
    FROM j ORDER BY event_type, hr
    """,
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample with forward fill: each event
    type's activity on a dense hourly grid - empty hours appear with
    a zero count and carry the last observed hourly average forward
    (the dashboard-friendly step-interpolation every metrics UI
    draws).

    100 TB shape: the stream pre-reduces to (type, hour) cells (one
    partial-agg shuffle; output is types x span-hours rows however
    large the input).  The scaffold is ``sequence(min_hr, max_hr)``
    exploded PER TYPE - generated, never read - and the fill is one
    window partitioned by type over the bounded cell table, so even
    a decade-long series is ~90k rows per series.  Hour indexes are
    epoch-second division (no timezone truncation to disagree
    across engines); the fill rounds AFTER propagation on both
    sides so the carried value is bit-identical to the source
    row's."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600).cast("bigint").alias("hr"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("value").alias("av"),
    )
    scaffold = (
        d.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hr"),
        )
    )
    j = scaffold.join(d, ["event_type", "hr"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "hr",
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events"),
        F.round(F.last("av", ignorenulls=True).over(w), 4).alias("filled_avg"),
        F.col("n").isNull().alias("is_gap"),
    ).orderBy("event_type", "hr")


@register(
    "q118_trend_slope",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             count(*) AS n
      FROM events GROUP BY event_type, day
    )
    SELECT event_type,
           round(regr_slope(n, day), 4)     AS slope_per_day,
           round(regr_r2(n, day), 4)        AS r2,
           round(avg(n), 2)                 AS mean_daily,
           CAST(count(*) AS BIGINT)         AS n_days
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear trend: is each event type's daily volume
    growing or shrinking, and how linear is the trend - the
    metric-drift detector behind every "traffic down 3%/week"
    alert.

    100 TB shape: regr_slope/regr_r2 are one-pass COMBINABLE
    aggregates (sum / sum-of-squares / cross-moment partials merge
    associatively), so the whole query is the (type, day) pre-reduce
    plus a second partial-agg shuffle down to one row per series -
    no series is ever materialized in one place, no window, no
    sort.  Day indexes are epoch-day arithmetic on both engines."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("day"),
    ).agg(F.count("*").alias("n"))
    return (
        d.groupBy("event_type")
        .agg(
            F.round(F.regr_slope(F.col("n"), F.col("day")), 4).alias(
                "slope_per_day"
            ),
            F.round(F.regr_r2(F.col("n"), F.col("day")), 4).alias("r2"),
            F.round(F.avg("n"), 2).alias("mean_daily"),
            F.count("*").cast("bigint").alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "q129_cusum_changepoint",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             event_id, ts, value
      FROM events
    ), s AS (
      SELECT event_type, d, avg(value) AS mu, stddev_samp(value) AS sd
      FROM b GROUP BY event_type, d
    ), z AS (
      SELECT b.event_type, b.d, b.event_id, b.ts,
             (b.value - s.mu) / s.sd AS z
      FROM b JOIN s USING (event_type, d)
      WHERE s.sd > 0
    ), c AS (
      SELECT event_type, d, event_id,
             round(abs(sum(z) OVER (
               PARTITION BY event_type, d ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 2) AS dev
      FROM z
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY event_type, d ORDER BY dev DESC, event_id) AS rn
      FROM c
    )
    SELECT event_type, d, event_id AS peak_event_id, dev AS peak_dev
    FROM r WHERE rn = 1
    ORDER BY event_type, d
    """,
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint probe per (event_type, day): standardize
    each day's values against that day's own mean/std, accumulate the
    standardized deviations in time order, and report where the
    cumulative sum peaks - the classic Page CUSUM statistic whose
    peak position estimates WHERE a mean shift happened and whose
    peak magnitude (vs the ~sqrt(n) random-walk envelope) says
    whether one happened at all.  The monitoring-plane companion of
    q103's pointwise z-score detector (A44).

    100 TB shape: the day-scoped reset bounds every window partition
    to one day of one series - the hypertable-chunk shape - so the
    running sum streams in bounded partitions (no few-giant-group
    window; for a single day too big for one task the rolling
    substrate of q103 applies).  Day stats are one partial-agg
    shuffle joined back on the same (type, day) key the windows
    partition by, so the join and both windows reuse one exchange.
    The peak row per group comes from a rank + rn=1 filter, which
    compiles to WindowGroupLimit (per-partition top-1, no full
    sort)."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("d"),
        "event_id",
        "ts",
        "value",
    )
    s = e.groupBy("event_type", "d").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (
        e.join(s, ["event_type", "d"])
        .filter(F.col("sd") > 0)
        .withColumn("z", (F.col("value") - F.col("mu")) / F.col("sd"))
    )
    wc = (
        Window.partitionBy("event_type", "d")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = z.select(
        "event_type",
        "d",
        "event_id",
        F.round(F.abs(F.sum("z").over(wc)), 2).alias("dev"),
    )
    wr = Window.partitionBy("event_type", "d").orderBy(F.desc("dev"), "event_id")
    return (
        c.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "d",
            F.col("event_id").alias("peak_event_id"),
            F.col("dev").alias("peak_dev"),
        )
        .orderBy("event_type", "d")
    )


@register(
    "q131_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev
      GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(d.med), 2) AS med,
           round(max(m.mad), 2) AS mad,
           CAST(count(*) FILTER (WHERE d.ad > 3 * 1.4826 * m.mad) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per series: flag values more than 3
    scaled-MADs from the median (MAD * 1.4826 estimates sigma under
    normality) - the robust sibling of q103's z-score detector.  A
    mean/std detector lets the outliers it hunts inflate its own
    threshold (masking); median/MAD have a 50% breakdown point, which
    is why monitoring planes use them for alarm baselines (A44).

    Plan: two exact grouped percentiles (median, then median absolute
    deviation) with the intermediate joined back on the same
    event_type key, then one counting agg - three shuffles total on
    one key.  Exact percentile interpolation is the identical
    (lo + (hi-lo)*frac) arithmetic in Spark and DuckDB, so med/mad
    agree bit-for-bit and the strict > flag cannot diverge.  Scale
    note: exact grouped percentiles sort within groups (the q74
    caveat); at 100 TB the same plan runs with approx_percentile(
    value, 0.5, 10000) - the registered form keeps the exact
    aggregate so the oracle hash-checks the semantics."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = e.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("ad", 0.5).alias("mad"))
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.max("med"), 2).alias("med"),
            F.round(F.max("mad"), 2).alias("mad"),
            F.count(F.when(F.col("ad") > 3 * 1.4826 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "q138_trailing_actives",
    oracle="""
    WITH cells AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      FROM events
    ), span AS (
      SELECT min(d) AS lo, max(d) AS hi FROM cells
    ), grid AS (
      SELECT CAST(u.d AS BIGINT) AS d
      FROM span, unnest(range(span.lo, span.hi + 1)) AS u(d)
    ), daily AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n_active_1d
      FROM cells GROUP BY d
    ), trail AS (
      SELECT g.d, CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active_7d
      FROM grid g JOIN cells c ON c.d BETWEEN g.d - 6 AND g.d
      GROUP BY g.d
    )
    SELECT t.d AS d, t.n_active_7d AS n_active_7d,
           coalesce(dl.n_active_1d, 0) AS n_active_1d
    FROM trail t LEFT JOIN daily dl ON dl.d = t.d
    ORDER BY d
    """,
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day (the WAU curve) -
    the rolling COUNT DISTINCT that window frames cannot express
    (neither engine supports DISTINCT aggregates over a sliding
    frame), solved by the day-grid range join.

    100 TB shape: the raw stream first collapses to DISTINCT (user,
    day) cells - one partial-agg shuffle, output bounded by users x
    days, orders of magnitude below event count.  Each cell then
    EMITS the <= 7 trailing grid days it is active for (explode of a
    7-element sequence, capped at the span's last day - a map-side
    constant fan-out), so the whole window is one equi-keyed count
    distinct on day; the former grid range join planned as a
    BroadcastNestedLoopJoin whose predicate evaluated every cell
    against every grid day (cells x days work - the term behind the
    r13 stress screen).  A day appears iff some user was active in
    its trailing window - exactly the oracle's inner grid join.  Day
    indexes are epoch-day integer division on both sides; no calendar
    truncation."""
    e = load(spark, sf_dir, "events")
    cells = e.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("d"),
    ).distinct()
    span = cells.agg(F.max("d").alias("hi"))
    daily = cells.groupBy("d").agg(
        F.count("*").cast("bigint").alias("n_active_1d")
    )
    trailing = (
        cells.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.least(F.col("d") + 6, F.col("hi")))
            ).alias("d"),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active_7d"))
    )
    return (
        trailing.join(daily, "d", "left")
        .select(
            "d",
            "n_active_7d",
            F.coalesce("n_active_1d", F.lit(0).cast("bigint")).alias(
                "n_active_1d"
            ),
        )
        .orderBy("d")
    )


@register(
    "q145_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT event_type, value,
             CAST(epoch_us(lead(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             )) - epoch_us(ts) AS BIGINT) AS dt_us
      FROM events
    )
    SELECT event_type,
           CAST(count(dt_us) AS BIGINT) AS n_intervals,
           round(sum(dt_us) / 1e6, 2) AS total_secs,
           round(sum(value * dt_us) / sum(CAST(dt_us AS DOUBLE)), 4)
             AS twap,
           round(avg(value), 4) AS raw_avg
    FROM seq
    WHERE dt_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per event type: each observation's value
    holds until the next observation, so the mean weights each value
    by its holding interval - the TWAP/sensor-average semantics that
    a plain avg() silently gets wrong on irregularly-sampled streams
    (reported alongside raw_avg to expose exactly that gap).

    Holding intervals are EXACT integer microseconds (epoch_us
    lead-minus-current on both engines - no double time arithmetic),
    so interval sums are exact; only the value x dt fold is a double
    reduction, rounded at 4.  The last observation of each series
    has no interval and is excluded on both sides.

    100 TB shape: the lead() window is SEGMENTED by (type, day) -
    millions of bounded partitions instead of one giant partition per
    type (the q103 caveat this plan used to carry) - and the one
    boundary interval per segment is stitched from a (type, day)
    summary table via a GRID-sized lead window: the union of
    within-segment and boundary intervals is interval-for-interval
    identical to the unsegmented plan (same dt multiset, same
    values), so the oracle is unchanged.  No fact-table join, one
    scan + one grid pass."""
    e = load(spark, sf_dir, "events")
    us = (F.col("ts").cast("double") * 1e6).cast("bigint")
    day = F.floor(us / F.lit(86_400_000_000)).cast("bigint")
    rows = e.select(
        "event_type",
        "value",
        "ts",
        "event_id",
        us.alias("us"),
        day.alias("d"),
    )
    wseg = Window.partitionBy("event_type", "d").orderBy("ts", "event_id")
    within = rows.select(
        "event_type",
        "value",
        (F.lead("us").over(wseg) - F.col("us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    summary = rows.groupBy("event_type", "d").agg(
        F.max(F.struct("us", "event_id", "value")).alias("last"),
        F.min(F.struct("us", "event_id")).alias("first"),
    )
    wtype = Window.partitionBy("event_type").orderBy("d")
    boundary = summary.select(
        "event_type",
        F.col("last.value").alias("value"),
        (F.lead("first.us").over(wtype) - F.col("last.us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    seq = within.unionByName(boundary)
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("dt_us").cast("bigint").alias("n_intervals"),
            F.round(F.sum("dt_us") / 1e6, 2).alias("total_secs"),
            F.round(
                F.sum(F.col("value") * F.col("dt_us"))
                / F.sum(F.col("dt_us").cast("double")),
                4,
            ).alias("twap"),
            F.round(F.avg("value"), 4).alias("raw_avg"),
        )
        .orderBy("event_type")
    )


@register(
    "q147_psi_drift",
    oracle="""
    WITH b AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi,
             (min(epoch(ts)) + max(epoch(ts))) / 2.0 AS mid
      FROM events GROUP BY event_type
    ), binned AS (
      SELECT e.event_type,
             CASE WHEN epoch(e.ts) < b.mid THEN 1 ELSE 2 END AS half,
             CAST(least(greatest(floor((e.value - b.lo)
                                       / (b.hi - b.lo) * 10), 0), 9)
                  AS BIGINT) AS bin
      FROM events e JOIN b ON b.event_type = e.event_type
    ), counts AS (
      SELECT event_type, half, bin, CAST(count(*) AS BIGINT) AS n
      FROM binned GROUP BY event_type, half, bin
    ), props AS (
      SELECT event_type, bin,
             greatest(CAST(sum(CASE WHEN half = 1 THEN n ELSE 0 END)
                           AS DOUBLE)
                      / sum(sum(CASE WHEN half = 1 THEN n ELSE 0 END))
                          OVER (PARTITION BY event_type), 1e-4) AS p1,
             greatest(CAST(sum(CASE WHEN half = 2 THEN n ELSE 0 END)
                           AS DOUBLE)
                      / sum(sum(CASE WHEN half = 2 THEN n ELSE 0 END))
                          OVER (PARTITION BY event_type), 1e-4) AS p2
      FROM counts GROUP BY event_type, bin
    )
    SELECT event_type,
           round(sum((p1 - p2) * ln(p1 / p2)), 4) AS psi,
           CAST(count(*) AS BIGINT) AS n_bins
    FROM props GROUP BY event_type ORDER BY event_type
    """,
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per event type: split each series at
    its temporal midpoint, decile-bin the metric on the type's full
    range, and sum (p1-p2)*ln(p1/p2) across bins - the drift score
    model-monitoring uses to decide when a feature's distribution has
    moved enough to retrain (PSI > 0.2 is the classic alarm).

    Binning is the explicit floor((v-lo)/(hi-lo)*10) clamp - identical
    arithmetic on both engines, no width_bucket semantics to differ -
    and empty-bin proportions clamp at 1e-4 on both sides so ln stays
    finite.  100 TB shape: one agg pass for per-type range/midpoint
    (broadcast back - the q146 two-pass band pattern), map-side
    binning, then everything downstream is types x 2 x 10 cells.  The
    per-bin PSI terms are fixed-shape doubles over exact counts; the
    final per-type sum runs over <=10 rounded terms."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        (
            (
                F.min(F.col("ts").cast("double"))
                + F.max(F.col("ts").cast("double"))
            )
            / 2.0
        ).alias("mid"),
    )
    binned = e.join(F.broadcast(b), "event_type").select(
        "event_type",
        F.when(F.col("ts").cast("double") < F.col("mid"), 1)
        .otherwise(2)
        .alias("half"),
        F.least(
            F.greatest(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * 10
                ),
                F.lit(0),
            ),
            F.lit(9),
        )
        .cast("bigint")
        .alias("bin"),
    )
    counts = binned.groupBy("event_type", "half", "bin").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wt = Window.partitionBy("event_type")
    props = (
        counts.groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("half") == 1, F.col("n")).otherwise(0)).alias(
                "n1"
            ),
            F.sum(F.when(F.col("half") == 2, F.col("n")).otherwise(0)).alias(
                "n2"
            ),
        )
        .select(
            "event_type",
            "bin",
            F.greatest(
                F.col("n1").cast("double") / F.sum("n1").over(wt), F.lit(1e-4)
            ).alias("p1"),
            F.greatest(
                F.col("n2").cast("double") / F.sum("n2").over(wt), F.lit(1e-4)
            ).alias("p2"),
        )
    )
    return (
        props.groupBy("event_type")
        .agg(
            F.round(
                F.sum(
                    (F.col("p1") - F.col("p2"))
                    * F.log(F.col("p1") / F.col("p2"))
                ),
                4,
            ).alias("psi"),
            F.count("*").cast("bigint").alias("n_bins"),
        )
        .orderBy("event_type")
    )


@register(
    "q148_lead_lag_xcorr",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day
    ), lagged AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(l.lag AS BIGINT) AS lag,
             round(corr(a.n, b.n), 4) AS xcorr,
             CAST(count(*) AS BIGINT) AS n_days
      FROM d a
      JOIN unnest(range(0, 8)) AS l(lag) ON TRUE
      JOIN d b ON b.event_type > a.event_type
              AND b.day = a.day + l.lag
      GROUP BY type_a, type_b, lag
      HAVING count(*) >= 10
    )
    SELECT type_a, type_b, lag AS best_lag, xcorr, n_days
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY type_a, type_b
        ORDER BY abs(xcorr) DESC, lag
      ) AS rk
      FROM lagged
    ) WHERE rk = 1
    ORDER BY type_a, type_b
    """,
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: for every ordered event-type pair,
    correlate type A's daily count against type B's count LAG days
    later (lags 0-7) and report the lag with the strongest
    correlation - the "does signup activity predict purchases three
    days out" question that q115's same-day correlation matrix
    cannot answer.

    100 TB shape: the stream reduces once to (type, day) cells;
    the lag expansion is cells x 8 (generated, tiny) feeding an
    equi-join on the shifted day; corr() folds per (pair, lag) -
    at most types^2/2 x 8 groups.  The argmax-by-|corr| rank runs
    over that bounded table, ordering by the ROUNDED correlation
    (both engines rank identical 4-decimal values; ties break by
    smallest lag) so an ulp-level corr difference can never flip
    the winner.  Pairs with under 10 overlapping days are dropped
    as statistically meaningless on both sides."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    a = d.alias("a").crossJoin(
        F.broadcast(
            spark.range(0, 8).select(F.col("id").cast("bigint").alias("lag"))
        )
    )
    b = d.alias("b")
    lagged = (
        a.join(
            b,
            (F.col("b.event_type") > F.col("a.event_type"))
            & (F.col("b.day") == F.col("a.day") + F.col("lag")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            "lag",
        )
        .agg(
            F.round(F.corr(F.col("a.n"), F.col("b.n")), 4).alias("xcorr"),
            F.count("*").cast("bigint").alias("n_days"),
        )
        .filter(F.col("n_days") >= 10)
    )
    rk = Window.partitionBy("type_a", "type_b").orderBy(
        F.abs(F.col("xcorr")).desc(), "lag"
    )
    return (
        lagged.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "type_a",
            "type_b",
            F.col("lag").alias("best_lag"),
            "xcorr",
            "n_days",
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q159_qq_table",
    oracle="""
    WITH q AS (
      SELECT quantile_cont(CASE WHEN event_type = 'purchase'
                                THEN value END,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               AS qa,
             quantile_cont(CASE WHEN event_type = 'view'
                                THEN value END,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               AS qb
      FROM events
    )
    SELECT CAST(r.i AS BIGINT) AS decile,
           round(q.qa[r.i], 4) AS purchase_val,
           round(q.qb[r.i], 4) AS view_val,
           round(q.qa[r.i] - q.qb[r.i], 4) AS qq_gap
    FROM q, unnest(range(1, 10)) AS r(i)
    ORDER BY decile
    """,
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile comparison table: the nine deciles of the
    purchase-value distribution laid against the view-value deciles
    - the QQ read that says WHERE two distributions diverge (PSI
    q147 scores THAT they drifted; the QQ table shows the shape of
    the gap, e.g. heavy right tail vs uniform shift).

    The decile vectors run through the size-aware
    ``grouped_exact_percentile`` over ONE global group per
    distribution (conditional projections - percentile ignores the
    nulls of the other type).  While the corpus fits one task's sort
    that is a single buffered aggregate pass; above the threshold it
    switches to the distributed two-pass rank selection, because a
    GLOBAL exact percentile is the canonical giant-group case (n =
    the whole stream).  Deciles are generated, not read."""
    e = load(spark, sf_dir, "events")
    vals = e.select(
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("vv"),
    )
    specs = [("pv", d / 10.0, f"qa{d}") for d in range(1, 10)] + [
        ("vv", d / 10.0, f"qb{d}") for d in range(1, 10)
    ]
    q = grouped_exact_percentile(
        vals, [], specs, input_rows=table_rows(sf_dir, "events")
    )
    z = q.select(
        F.posexplode(
            F.arrays_zip(
                F.array(*[F.col(f"qa{d}") for d in range(1, 10)]).alias("qa"),
                F.array(*[F.col(f"qb{d}") for d in range(1, 10)]).alias("qb"),
            )
        )
    )
    return z.select(
        (F.col("pos") + 1).cast("bigint").alias("decile"),
        F.round(F.col("col.qa"), 4).alias("purchase_val"),
        F.round(F.col("col.qb"), 4).alias("view_val"),
        F.round(F.col("col.qa") - F.col("col.qb"), 4).alias("qq_gap"),
    ).orderBy("decile")


@register("q160_sliding_hll_wau")
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day distinct actives from MERGEABLE HLL sketches:
    one DataSketches HLL partial per day, unioned across each
    7-day window - the 100 TB production path for q138's exact WAU.
    The exact plan re-scans the (user, day) cell table per window
    position; the sketch plan reduces the stream ONCE to a
    days-sized sketch table (a few KB per day), and every window
    union touches only 7 sketches - the classic
    pre-aggregate-then-merge pattern that exact COUNT DISTINCT can
    never use because distinct counts don't merge.

    Rows-only for the driver (sketch estimates have no SQL oracle);
    tests assert <2% relative error against exact q138 counts and
    that the estimate is day-monotone-consistent (wau >= dau)."""
    e = load(spark, sf_dir, "events")
    day_sketch = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("d")
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    grid = day_sketch.select(F.col("d").alias("g"))
    joined = F.broadcast(grid).join(
        day_sketch,
        (F.col("d") >= F.col("g") - 6) & (F.col("d") <= F.col("g")),
    )
    return (
        joined.groupBy(F.col("g").alias("d"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("bigint")
            .alias("wau_estimate"),
            F.sum("n_events").alias("n_events_7d"),
        )
        .orderBy("d")
    )
