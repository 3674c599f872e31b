"""Q209-Q211: the SRE / reliability-analytics battery.

Error-budget burn rate, incident MTTR/MTBF, and traffic burstiness -
the service-health reads over the events stream that complete the
operational family (q103 anomalies, q158 double-fire QA, q187 bot
bursts).

Determinism: all rates divide exact BIGINT counts; incident
durations are exact BIGINT microseconds from islands over the error
stream; burstiness percentiles interpolate exactly over the bounded
minute grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q209_error_budget_burn",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_hours,
           round(sum(errs) * 1.0 / sum(n), 4) AS overall_rate,
           CAST(sum(CASE WHEN errs * 100 > n THEN 1 ELSE 0 END) AS BIGINT)
             AS n_burn_hours,
           round(max(errs * 1.0 / n), 4) AS worst_hour_rate,
           round(max(errs * 100.0 / n), 2) AS worst_burn_multiple
    FROM hourly
    """,
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn: against a 1% error-rate SLO, how many hours
    burned budget faster than allowed, the worst hour's rate, and its
    burn-rate multiple (rate / SLO) - the paging policy's input.

    The burn test is a pure integer cross-multiply (errs * 100 > n -
    no float threshold), rates divide exact BIGINT counts, and the
    hour grid is time-span-bounded.  One scan, one partial-agg
    shuffle to the grid, one summary row."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.floor(F.col("ts").cast("double") / 3600).cast("bigint").alias("h")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errs"),
    )
    return hourly.agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.round(F.sum("errs") * 1.0 / F.sum("n"), 4).alias("overall_rate"),
        F.sum(F.when(F.col("errs") * 100 > F.col("n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_burn_hours"),
        F.round(F.max(F.col("errs") * 1.0 / F.col("n")), 4).alias(
            "worst_hour_rate"
        ),
        F.round(F.max(F.col("errs") * 100.0 / F.col("n")), 2).alias(
            "worst_burn_multiple"
        ),
    )


@register(
    "q210_incident_mttr",
    oracle="""
    WITH errs AS (
      SELECT epoch_us(ts) AS us,
             row_number() OVER (ORDER BY ts, event_id) AS rn,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (ORDER BY ts, event_id) <= 60000000
                  THEN 0 ELSE 1 END AS new_inc
      FROM events WHERE event_type = 'error'
    ), marked AS (
      SELECT us,
             CAST(sum(new_inc) OVER (ORDER BY rn ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS inc
      FROM errs
    ), incidents AS (
      SELECT inc,
             CAST(count(*) AS BIGINT) AS n_errors,
             CAST(max(us) - min(us) AS BIGINT) AS dur_us,
             CAST(min(us) AS BIGINT) AS start_us
      FROM marked GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_incidents,
           round(quantile_cont(dur_us / 1e6, 0.5), 2) AS mttr_p50_s,
           round(quantile_cont(dur_us / 1e6, 0.9), 2) AS mttr_p90_s,
           round(sum(n_errors) * 1.0 / count(*), 2) AS errors_per_incident,
           round((max(start_us) - min(start_us))
                 / (1e6 * greatest(count(*) - 1, 1)), 2) AS mtbf_s
    FROM incidents
    """,
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident MTTR/MTBF: consecutive error events within 60s chain
    into one incident (gaps-and-islands on the global error stream);
    report incident count, repair-time percentiles, errors per
    incident, and mean time between incident starts.

    Durations are exact BIGINT microseconds; the first-of-incident
    flag sums cumulatively into incident ids (one global window over
    the ERROR substream - bounded by error volume, not traffic; the
    error filter pushes to the scan).  Exact percentiles over the
    incident table (q74 posture)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    us = F.unix_micros(F.col("ts"))
    worder = Window.orderBy("ts", "event_id")
    errs = e.select(
        "ts",
        "event_id",
        us.alias("us"),
        F.when(us - F.lag(us).over(worder) <= 60_000_000, 0)
        .otherwise(1)
        .alias("new_inc"),
    )
    wcum = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = errs.select(
        "us",
        F.sum("new_inc").over(wcum).cast("bigint").alias("inc"),
    )
    incidents = marked.groupBy("inc").agg(
        F.count("*").cast("bigint").alias("n_errors"),
        (F.max("us") - F.min("us")).cast("bigint").alias("dur_us"),
        F.min("us").cast("bigint").alias("start_us"),
    )
    return incidents.agg(
        F.count("*").cast("bigint").alias("n_incidents"),
        F.round(F.percentile(F.col("dur_us") / 1e6, 0.5), 2).alias(
            "mttr_p50_s"
        ),
        F.round(F.percentile(F.col("dur_us") / 1e6, 0.9), 2).alias(
            "mttr_p90_s"
        ),
        F.round(F.sum("n_errors") * 1.0 / F.count("*"), 2).alias(
            "errors_per_incident"
        ),
        F.round(
            (F.max("start_us") - F.min("start_us"))
            / (1e6 * F.greatest(F.count("*") - 1, F.lit(1))),
            2,
        ).alias("mtbf_s"),
    )


@register(
    "q211_traffic_burstiness",
    oracle="""
    WITH minutely AS (
      SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_minutes,
           round(sum(n) * 1.0 / count(*), 2) AS mean_rpm,
           round(quantile_cont(n, 0.5), 1) AS p50_rpm,
           round(quantile_cont(n, 0.99), 1) AS p99_rpm,
           round(quantile_cont(n, 0.99) / (sum(n) * 1.0 / count(*)), 3)
             AS p99_to_mean,
           round(max(n) * count(*) * 1.0 / sum(n), 3) AS peak_to_mean
    FROM minutely
    """,
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness: requests-per-minute distribution and its
    p99/mean and peak/mean ratios - the capacity-planning numbers
    that size a cluster for the spikes, not the average.

    The minute grid is time-span-bounded; means and ratios derive
    from exact BIGINT counts (peak/mean cross-multiplies max*count
    before the one division); percentiles interpolate exactly over
    the grid.  One scan, one partial-agg shuffle, one row."""
    e = load(spark, sf_dir, "events")
    minutely = e.groupBy(
        F.floor(F.col("ts").cast("double") / 60).cast("bigint").alias("m")
    ).agg(F.count("*").cast("bigint").alias("n"))
    mean = F.sum("n") * 1.0 / F.count("*")
    return minutely.agg(
        F.count("*").cast("bigint").alias("n_minutes"),
        F.round(mean, 2).alias("mean_rpm"),
        F.round(F.percentile("n", 0.5), 1).alias("p50_rpm"),
        F.round(F.percentile("n", 0.99), 1).alias("p99_rpm"),
        F.round(F.percentile("n", 0.99) / mean, 3).alias("p99_to_mean"),
        F.round(F.max("n") * F.count("*") * 1.0 / F.sum("n"), 3).alias(
            "peak_to_mean"
        ),
    )
