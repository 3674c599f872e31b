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

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


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
