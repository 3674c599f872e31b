"""Q110-Q111: behavioral event analytics (cohorts, funnels).

The classic product-analytics pair every OLAP engine ships, over the
events table: weekly cohort retention (first-seen week x activity
age) and a strictly-ordered conversion funnel (each step's FIRST
occurrence after the previous step's).  Both are pure
DataFrame-declarative plans - every stage is a hash agg or an
equi-join on ``user_id``, so consecutive stages reuse the same key
partitioning and nothing ever needs a global window or a driver
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows

_EPOCH = "2024-01-01"  # cohort origin (the corpus's first day)


@register(
    "q110_cohort_retention",
    oracle=f"""
    WITH wks AS (
      SELECT DISTINCT user_id,
             CAST(floor(date_diff('day', TIMESTAMP '{_EPOCH}', ts) / 7.0)
                  AS BIGINT) AS wk
      FROM events
    ), f AS (
      SELECT user_id, min(wk) AS cohort_wk FROM wks GROUP BY user_id
    ), cs AS (
      SELECT cohort_wk, CAST(count(*) AS BIGINT) AS n_users
      FROM f GROUP BY cohort_wk
    )
    SELECT f.cohort_wk AS cohort_wk,
           w.wk - f.cohort_wk AS age_weeks,
           CAST(count(*) AS BIGINT) AS n_active,
           round(count(*) * 100.0 / max(cs.n_users), 2) AS retention_pct
    FROM wks w JOIN f USING (user_id)
    JOIN cs ON cs.cohort_wk = f.cohort_wk
    GROUP BY f.cohort_wk, age_weeks
    ORDER BY f.cohort_wk, age_weeks
    """,
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    activity counted per (cohort, age-in-weeks), retention as percent
    of the cohort's size - the retention-triangle query.

    100 TB shape: reduce first (DISTINCT (user, week) collapses the
    event stream to at most users x weeks), then every stage is a
    partial-aggregated shuffle or equi-join on ``user_id`` /
    ``cohort_wk``; cohort sizes are a tiny table the final join
    broadcasts.  Week indexes are day-arithmetic (no timezone-
    dependent truncation to disagree across engines)."""
    e = load(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.to_date("ts"), F.to_date(F.lit(_EPOCH))) / 7
    ).cast("bigint")
    wks = e.select("user_id", wk.alias("wk")).distinct()
    first = wks.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    cs = first.groupBy("cohort_wk").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
    return (
        wks.join(first, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_weeks"))
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .join(F.broadcast(cs), "cohort_wk")
        .select(
            "cohort_wk",
            "age_weeks",
            "n_active",
            F.round(F.col("n_active") * 100.0 / F.col("n_users"), 2).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_wk", "age_weeks")
    )


_FUNNEL = [("signup", 1), ("view", 2), ("click", 3), ("purchase", 4)]


@register(
    "q111_event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s3 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
    ), counts AS (
      SELECT 1 AS step, 'signup' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'click', CAST(count(*) AS BIGINT) FROM s3
      UNION ALL
      SELECT 4, 'purchase', CAST(count(*) AS BIGINT) FROM s4
    ), base AS (
      SELECT n_users AS n0 FROM counts WHERE step = 1
    )
    SELECT CAST(step AS BIGINT) AS step, step_name, n_users,
           round(n_users * 100.0 / base.n0, 2) AS pct_of_first
    FROM counts CROSS JOIN base
    ORDER BY step
    """,
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel signup -> view -> click ->
    purchase: each step counts users whose FIRST qualifying event
    follows their previous step's first event (min-ts-after-previous,
    the sequential-funnel semantics, not mere set intersection).

    100 TB shape: each step is one equi-join on ``user_id`` (the
    previous step's per-user timestamps, shrinking monotonically)
    plus a partial-agg min - four same-key shuffles that AQE plans as
    broadcasts as the funnel narrows; the final percentages are a
    4-row cross join against the 1-row base count.  No windows, no
    per-user event-array materialization.  The funnel-type projection
    pins ONCE with localCheckpoint and every per-user stage pins its
    (shrinking) result, so the four step counts re-read materialized
    tables instead of re-deriving the whole chain - without the pins
    this plan scans events 11 times (4 chains x their prefixes)."""
    e = load(spark, sf_dir, "events")
    fe = (
        e.filter(F.col("event_type").isin([n for n, _ in _FUNNEL]))
        .select("user_id", "event_type", "ts")
        .localCheckpoint()
    )

    prev = (
        fe.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .localCheckpoint()
    )
    stages = [prev]
    for name, _step in _FUNNEL[1:]:
        p = stages[-1].select("user_id", F.col("t").alias("_pt"))
        nxt = (
            fe.filter(F.col("event_type") == name)
            .join(p, "user_id")
            .filter(F.col("ts") > F.col("_pt"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .localCheckpoint()
        )
        stages.append(nxt)

    counts = None
    for (name, step), st in zip(_FUNNEL, stages):
        c = st.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(step).cast("bigint").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
        counts = c if counts is None else counts.union(c)
    base = counts.filter(F.col("step") == 1).select(
        F.col("n_users").alias("n0")
    )
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            "step",
            "step_name",
            "n_users",
            F.round(F.col("n_users") * 100.0 / F.col("n0"), 2).alias(
                "pct_of_first"
            ),
        )
        .orderBy("step")
    )


@register(
    "q112_peak_concurrency",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS d, min(ts) AS s, max(ts) AS e
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), pts AS (
      SELECT d, s AS t, 1 AS delta, user_id FROM iv
      UNION ALL
      SELECT d, e AS t, -1 AS delta, user_id FROM iv
    ), run AS (
      SELECT d, CAST(sum(delta) OVER (
               ORDER BY t, delta DESC, user_id
             ) AS BIGINT) AS conc
      FROM pts
    )
    SELECT d AS day, max(conc) AS peak_concurrency
    FROM run GROUP BY d ORDER BY day
    """,
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency per day - the sweep-line query: each
    user's daily activity span [first event, last event] becomes a
    +1/-1 boundary pair, the global running sum of boundaries in time
    order is the live-session count, and the per-day max of that
    curve is the peak (ties order arrivals before departures, so
    touching spans count as concurrent).

    The oracle's running sum is an unpartitioned window (single task);
    the Spark plan is :func:`operators.ranking.prefix_sum` - the
    two-pass range-partitioned scan, so the sweep distributes at any
    event volume.  Spans never cross midnight by construction, so the
    curve returns to zero at each day boundary and the per-day max
    needs no day partitioning in the sweep itself."""
    from iceberg_daq_spark.operators.ranking import prefix_sum

    e = load(spark, sf_dir, "events")
    iv = e.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    pts = iv.select(
        "d", F.col("s").alias("t"), F.lit(1).cast("bigint").alias("delta"), "user_id"
    ).union(
        iv.select(
            "d", F.col("e").alias("t"), F.lit(-1).cast("bigint").alias("delta"), "user_id"
        )
    )
    run = prefix_sum(
        pts, [F.asc("t"), F.desc("delta"), F.asc("user_id")], "delta", out="conc"
    )
    return (
        run.groupBy(F.col("d").alias("day"))
        .agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
        .orderBy("day")
    )


@register(
    "q113_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ), pairs AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (
      SELECT cur, CAST(sum(n) AS BIGINT) AS n_out FROM pairs GROUP BY cur
    )
    SELECT p.cur, p.nxt, p.n,
           round(p.n * 1.0 / t.n_out, 4) AS p_next
    FROM pairs p JOIN tot t USING (cur)
    ORDER BY cur, nxt
    """,
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix between event types: each
    user's event stream in time order yields (current, next) bigrams,
    aggregated to transition counts and conditional probabilities -
    the user-journey model behind "what happens after a click".

    100 TB shape: the ONLY window is partitioned by user_id (bounded
    per-user state, millions of partitions - never a global order),
    then two partial-agg shuffles on the tiny (cur, nxt) / (cur) keys
    and a broadcast join of the 5x5 matrix against its marginals.
    Tiebreak on event_id makes the sequence a total order, so both
    engines see identical bigrams."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    pairs = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").cast("bigint").alias("n_out"))
    return (
        pairs.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n") * 1.0 / F.col("n_out"), 4).alias("p_next"),
        )
        .orderBy("cur", "nxt")
    )


@register(
    "q114_top_journeys",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ), heads AS (
      SELECT user_id,
             array_to_string(list(event_type ORDER BY rn), '>') AS path
      FROM seq WHERE rn <= 4 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM heads
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 15
    """,
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's FIRST FOUR events in time order
    joined into a path string, ranked by how many users share the
    path - the "most common onboarding flows" query.

    100 TB shape: rank within user (bounded per-user window), keep
    rank <= 4 BEFORE any aggregation (WindowGroupLimit pushes the
    top-4 below the shuffle), collect_list over at most 4 elements
    per user with an explicit sort (array_sort on (rn, type) pairs -
    collect_list order is partition-dependent, sorting makes it
    deterministic), then one partial-agg count on the path string and
    a TakeOrdered top-15."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    heads = (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 4)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        heads.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(15)
    )


@register(
    "q115_metric_correlation",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY day, event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round(corr(a.n, b.n), 4) AS pearson_r,
           CAST(count(*) AS BIGINT) AS n_days
    FROM d a JOIN d b
      ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' daily
    activity series - "do errors co-move with purchases?" - the
    metric-correlation matrix an ops dashboard computes.

    100 TB shape: the event stream pre-reduces to (day, type) counts
    (one partial-agg shuffle; output is days x types rows however
    large the input), the pair join is an equi-join on day over that
    reduced table, and corr() is a single-pass combinable aggregate
    (sum/sum-sq/cross-moment partials) in both engines - no
    per-series materialization anywhere."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.round(F.corr(F.col("a.n"), F.col("b.n")), 4).alias("pearson_r"),
            F.count("*").cast("bigint").alias("n_days"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q121_funnel_timing",
    oracle="""
    WITH s AS (
      SELECT user_id, min(epoch(ts)) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT s.user_id, s.t0, min(epoch(e.ts)) AS t1
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch(e.ts) >= s.t0
      GROUP BY s.user_id, s.t0
    ), g AS (
      SELECT CAST(floor(t0 / 86400) AS BIGINT) AS signup_day,
             (t1 - t0) / 3600.0 AS gap_h
      FROM p
    )
    SELECT signup_day,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(CAST(quantile_cont(gap_h, 0.5) AS DOUBLE), 2) AS p50_h,
           round(CAST(quantile_cont(gap_h, 0.9) AS DOUBLE), 2) AS p90_h,
           round(avg(gap_h), 2) AS mean_h
    FROM g GROUP BY signup_day ORDER BY signup_day
    """,
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per signup day, the median /
    p90 / mean hours between a user's first signup and their first
    purchase at-or-after it - the follow-on every funnel (q111)
    report gets asked for next.

    100 TB shape: first-signup is a partial-agg min per user; the
    conversion probe is one user_id equi-join against the (already
    reduced) signup table with the time predicate as a residual;
    per-day percentiles run through the size-aware
    ``grouped_exact_percentile`` (buffered exact aggregate for small
    day groups, distributed two-pass rank selection if a day's
    conversions outgrow one task's sort).  Seconds arithmetic, no
    timezone truncation."""
    e = load(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(sec).alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", sec.alias("t1"))
        .join(s, "user_id")
        .where(F.col("t1") >= F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("t1").alias("t1"))
    )
    g = p.select(
        F.floor(F.col("t0") / 86400).cast("bigint").alias("signup_day"),
        ((F.col("t1") - F.col("t0")) / 3600.0).alias("gap_h"),
    )
    res = grouped_exact_percentile(
        g,
        ["signup_day"],
        [("gap_h", 0.5, "_p50"), ("gap_h", 0.9, "_p90")],
        extra_aggs=[
            F.count("*").cast("bigint").alias("n_converted"),
            F.round(F.avg("gap_h"), 2).alias("mean_h"),
        ],
        input_rows=table_rows(sf_dir, "events"),
    )
    return res.select(
        "signup_day",
        "n_converted",
        F.round("_p50", 2).alias("p50_h"),
        F.round("_p90", 2).alias("p90_h"),
        "mean_h",
    ).orderBy("signup_day")


@register(
    "q122_ab_welch",
    oracle="""
    WITH m AS (
      SELECT event_type, user_id % 2 AS grp, value FROM events
    ), s AS (
      SELECT event_type,
             count(CASE WHEN grp = 0 THEN 1 END) AS na,
             count(CASE WHEN grp = 1 THEN 1 END) AS nb,
             avg(CASE WHEN grp = 0 THEN value END) AS ma,
             avg(CASE WHEN grp = 1 THEN value END) AS mb,
             var_samp(CASE WHEN grp = 0 THEN value END) AS va,
             var_samp(CASE WHEN grp = 1 THEN value END) AS vb
      FROM m GROUP BY event_type
    )
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
           round((ma - mb) / sqrt(va / na + vb / nb), 4) AS t_welch,
           round(pow(va / na + vb / nb, 2)
                 / (pow(va / na, 2) / (na - 1)
                    + pow(vb / nb, 2) / (nb - 1)), 2) AS df_welch
    FROM s ORDER BY event_type
    """,
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per event type between the
    two experiment arms (deterministic user_id parity split): the
    A/B-test readout - group means, the t statistic, and the
    Welch-Satterthwaite degrees of freedom.

    100 TB shape: the entire test is count/avg/var_samp - one-pass
    COMBINABLE aggregates with conditional projection, so the plan
    is a single partial+final agg pair over the raw stream and a
    map-side formula on the 5-row result.  No window, no join, no
    second scan; a trillion-event experiment costs exactly one
    shuffle of 5 x #partitions partial rows."""
    e = load(spark, sf_dir, "events")
    grp = (F.col("user_id") % 2).alias("grp")
    m = e.select("event_type", grp, "value")
    va_na = F.col("va") / F.col("na")
    vb_nb = F.col("vb") / F.col("nb")
    s = m.groupBy("event_type").agg(
        F.count(F.when(F.col("grp") == 0, 1)).alias("na"),
        F.count(F.when(F.col("grp") == 1, 1)).alias("nb"),
        F.avg(F.when(F.col("grp") == 0, F.col("value"))).alias("ma"),
        F.avg(F.when(F.col("grp") == 1, F.col("value"))).alias("mb"),
        F.var_samp(F.when(F.col("grp") == 0, F.col("value"))).alias("va"),
        F.var_samp(F.when(F.col("grp") == 1, F.col("value"))).alias("vb"),
    )
    return s.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round("ma", 4).alias("mean_a"),
        F.round("mb", 4).alias("mean_b"),
        F.round(
            (F.col("ma") - F.col("mb")) / F.sqrt(va_na + vb_nb), 4
        ).alias("t_welch"),
        F.round(
            F.pow(va_na + vb_nb, 2)
            / (
                F.pow(va_na, 2) / (F.col("na") - 1)
                + F.pow(vb_nb, 2) / (F.col("nb") - 1)
            ),
            2,
        ).alias("df_welch"),
    ).orderBy("event_type")


@register(
    "q125_association_rules",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             event_type
      FROM events
    ), nb AS (
      SELECT count(*) AS n FROM (
        SELECT DISTINCT user_id, day FROM basket
      )
    ), supp AS (
      SELECT event_type, count(*) AS s FROM basket GROUP BY event_type
    ), pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons,
             count(*) AS s_ab
      FROM basket a
      JOIN basket b ON a.user_id = b.user_id AND a.day = b.day
                   AND a.event_type < b.event_type
      GROUP BY ante, cons
    )
    SELECT p.ante, p.cons,
           CAST(p.s_ab AS BIGINT)                    AS n_both,
           round(p.s_ab * 1.0 / sa.s, 4)             AS conf_ante_cons,
           round(p.s_ab * 1.0 / sb.s, 4)             AS conf_cons_ante,
           round(p.s_ab * 1.0 * nb.n / (sa.s * sb.s), 4) AS lift
    FROM pair p
    JOIN supp sa ON sa.event_type = p.ante
    JOIN supp sb ON sb.event_type = p.cons
    CROSS JOIN nb
    ORDER BY ante, cons
    """,
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over daily activity baskets
    (basket = the set of event types a user touched in a day):
    pair support, both conditional confidences, and lift - the
    "users who view also purchase?" co-occurrence readout.

    100 TB shape: baskets pre-reduce to DISTINCT (user, day, type)
    cells; pair support is a basket-keyed self-join whose per-basket
    fan-out is bounded by C(#item-types, 2) - item vocabularies are
    small by construction, so this never approaches the d^2-in-rows
    blowup - and the single-item supports plus the basket count are
    tiny tables broadcast into the final projection.  Day indexes
    are epoch-day arithmetic (timezone-proof)."""
    e = load(spark, sf_dir, "events")
    basket = e.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("day"),
        "event_type",
    ).distinct()
    n_baskets = basket.select("user_id", "day").distinct().count()
    supp = basket.groupBy("event_type").agg(F.count("*").alias("s"))
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ante"),
            F.col("b.event_type").alias("cons"),
        )
        .agg(F.count("*").alias("s_ab"))
    )
    sa = F.broadcast(supp.select(F.col("event_type").alias("ante"), F.col("s").alias("_sa")))
    sb = F.broadcast(supp.select(F.col("event_type").alias("cons"), F.col("s").alias("_sb")))
    return (
        pair.join(sa, "ante")
        .join(sb, "cons")
        .select(
            "ante",
            "cons",
            F.col("s_ab").cast("bigint").alias("n_both"),
            F.round(F.col("s_ab") / F.col("_sa"), 4).alias("conf_ante_cons"),
            F.round(F.col("s_ab") / F.col("_sb"), 4).alias("conf_cons_ante"),
            F.round(
                F.col("s_ab") * F.lit(float(n_baskets)) / (F.col("_sa") * F.col("_sb")),
                4,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )


@register(
    "q126_last_touch_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value, ts, event_id,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    ), attr AS (
      SELECT coalesce(touch, 'direct') AS touch_type, value
      FROM seq WHERE event_type = 'purchase'
    ), tot AS (
      SELECT count(*) AS n FROM attr
    )
    SELECT a.touch_type,
           CAST(count(*) AS BIGINT)              AS n_purchases,
           round(sum(a.value), 2)                AS attributed_value,
           round(count(*) * 100.0 / max(t.n), 2) AS pct
    FROM attr a CROSS JOIN tot t
    GROUP BY a.touch_type ORDER BY touch_type
    """,
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event type ('direct' when none) -
    the marketing-attribution query behind every channel-ROI
    report.

    100 TB shape: ONE user-partitioned window (bounded per-user
    state, no global sort) carries the last non-purchase touch
    forward; everything after is a partial-agg shuffle on the
    ~#channels-row result plus a broadcast of the 1-row total.
    Ties broken by (ts, event_id) so both engines walk the same
    sequence."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.withColumn(
        "touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    attr = seq.filter(F.col("event_type") == "purchase").select(
        F.coalesce(F.col("touch"), F.lit("direct")).alias("touch_type"),
        "value",
    )
    tot = attr.agg(F.count("*").alias("n"))
    return (
        attr.crossJoin(F.broadcast(tot))
        .groupBy("touch_type")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
            F.round(F.count("*") * 100.0 / F.max("n"), 2).alias("pct"),
        )
        .orderBy("touch_type")
    )


@register(
    "q130_decayed_engagement",
    oracle="""
    WITH t AS (SELECT max(epoch(ts)) AS tmax FROM events)
    SELECT user_id,
           round(sum(value * exp(-(t.tmax - epoch(ts)) / 604800.0)), 2) AS score,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events, t
    GROUP BY user_id
    ORDER BY score DESC, user_id
    LIMIT 100
    """,
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement scoring: each user's
    events contribute value * exp(-age / 7d) against the corpus
    horizon, top-100 users by decayed score - the recency-weighted
    ranking every feed/recommendation/lead-scoring pipeline computes
    (a plain sum over-weights dead accounts; a hard window forgets
    loyal ones; the exponential kernel is the standard compromise,
    and unlike a sliding window it folds associatively, so it
    partial-aggregates).

    100 TB shape: the horizon is ONE max-aggregate row cross-joined
    (broadcast) into the scan; the score is a single partial+final
    hash agg over user_id - decay weighting adds zero shuffles over
    a plain sum - and top-100 is TakeOrderedAndProject, never a
    global sort.  Epoch-seconds arithmetic; the ROUNDED score is the
    ranking key on both engines (summation-order ulps cannot reorder
    the cross-engine result except at the quantized boundary the
    hash itself checks)."""
    e = load(spark, sf_dir, "events")
    tmax = e.agg(F.max(F.col("ts").cast("double")).alias("tmax"))
    return (
        e.crossJoin(F.broadcast(tmax))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.col("value")
                    * F.exp(-(F.col("tmax") - F.col("ts").cast("double")) / 604800.0)
                ),
                2,
            ).alias("score"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy(F.desc("score"), "user_id")
        .limit(100)
    )


@register(
    "q132_rfm_segmentation",
    oracle="""
    WITH horizon AS (SELECT max(o_orderdate) AS dmax FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), max(h.dmax)) AS rec,
             CAST(count(*) AS BIGINT) AS freq,
             round(sum(o_totalprice), 2) AS mon
      FROM orders, horizon h
      GROUP BY o_custkey
    ), q AS (
      SELECT quantile_cont(rec, 0.2) AS r20, quantile_cont(rec, 0.4) AS r40,
             quantile_cont(rec, 0.6) AS r60, quantile_cont(rec, 0.8) AS r80,
             quantile_cont(freq, 0.2) AS f20, quantile_cont(freq, 0.4) AS f40,
             quantile_cont(freq, 0.6) AS f60, quantile_cont(freq, 0.8) AS f80,
             quantile_cont(mon, 0.2) AS m20, quantile_cont(mon, 0.4) AS m40,
             quantile_cont(mon, 0.6) AS m60, quantile_cont(mon, 0.8) AS m80
      FROM rfm
    ), scored AS (
      SELECT o_custkey, rec, freq, mon,
             5 - ((rec > q.r20)::INT + (rec > q.r40)::INT
                + (rec > q.r60)::INT + (rec > q.r80)::INT) AS r_score,
             1 + ((freq > q.f20)::INT + (freq > q.f40)::INT
                + (freq > q.f60)::INT + (freq > q.f80)::INT) AS f_score,
             1 + ((mon > q.m20)::INT + (mon > q.m40)::INT
                + (mon > q.m60)::INT + (mon > q.m80)::INT) AS m_score
      FROM rfm, q
    )
    SELECT CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
             WHEN f_score >= 4 THEN 'loyal'
             WHEN m_score >= 4 THEN 'big_spender'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
             ELSE 'regular'
           END AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(rec), 2) AS avg_recency_days,
           round(avg(freq), 2) AS avg_orders,
           round(avg(mon), 2) AS avg_spend
    FROM scored
    GROUP BY segment
    ORDER BY segment
    """,
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days since
    last order vs the corpus horizon), frequency (order count), and
    monetary (total spend) quintile-scored against the population and
    bucketed into the classic marketing segments - the
    customer-equity census every commerce warehouse runs nightly.

    100 TB shape: one partial-agg shuffle builds the per-customer RFM
    table (customer-sized, orders of magnitude below the fact
    table); the twelve quintile thresholds are ONE aggregate row
    cross-joined (broadcast) back - scoring is then a map-only CASE
    battery and the segment census a second tiny agg.  No global
    sort, no per-customer window.  Monetary is rounded to cents
    BEFORE the quantiles so float summation order cannot move a
    threshold; quintile scores compare with the identical
    (lo + (hi-lo)*frac) interpolated thresholds on both engines.
    Exact population quantiles at 100 TB would swap in
    approx_percentile (the q131/q74 caveat); the registered form
    keeps them exact so the oracle hash-checks the scoring."""
    o = load(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("dmax"))
    rfm = (
        o.crossJoin(F.broadcast(horizon))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("dmax"), F.max("o_orderdate")).alias("rec"),
            F.count("*").cast("bigint").alias("freq"),
            F.round(F.sum("o_totalprice"), 2).alias("mon"),
        )
    )
    q = rfm.agg(
        *[
            F.percentile(c, p).alias(f"{c[0]}{int(p * 100)}")
            for c in ("rec", "freq", "mon")
            for p in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def steps(col: str, pfx: str) -> F.Column:
        return sum(
            F.when(F.col(col) > F.col(f"{pfx}{p}"), 1).otherwise(0)
            for p in (20, 40, 60, 80)
        )

    scored = rfm.crossJoin(F.broadcast(q)).select(
        "o_custkey",
        "rec",
        "freq",
        "mon",
        (F.lit(5) - steps("rec", "r")).alias("r_score"),
        (F.lit(1) + steps("freq", "f")).alias("f_score"),
        (F.lit(1) + steps("mon", "m")).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("m_score") >= 4, "big_spender")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating")
        .otherwise("regular")
    )
    return (
        scored.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.avg("rec"), 2).alias("avg_recency_days"),
            F.round(F.avg("freq"), 2).alias("avg_orders"),
            F.round(F.avg("mon"), 2).alias("avg_spend"),
        )
        .orderBy("segment")
    )


@register(
    "q136_session_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             substr(event_type, 1, 1) AS sym,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) > 1800 THEN 1 ELSE 0 END AS brk
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id, sym,
             sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_idx
      FROM seq
    ), strs AS (
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             CAST(count(*) AS BIGINT) AS n_events,
             string_agg(sym, '' ORDER BY ts, event_id) AS symbols
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT user_id, session_idx, n_events,
           CAST(len(regexp_split_to_array(symbols, 'vc*p')) - 1 AS BIGINT)
             AS n_funnels,
           regexp_extract(symbols, 'vc*p') AS first_funnel
    FROM strs
    WHERE n_events >= 3
    ORDER BY user_id, session_idx
    """,
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized event-pattern matching (MATCH_RECOGNIZE-lite):
    split each user's stream into inactivity sessions (>30 min gap),
    encode the session as a symbol string (one char per event type,
    time-ordered), and run a regex over it - here the browse-to-buy
    funnel ``vc*p`` (a view, any clicks, then a purchase).  Counting
    NON-OVERLAPPING matches per session is the sequence-pattern
    analytic that plain funnel queries (q111) can't express: the
    regex engine handles optionality/repetition for free.

    100 TB shape: sessionization is the standard lag + running-sum
    pair over ONE per-user sort (both windows share the partition
    and order, so Catalyst plans a single Window node chain over one
    shuffle); the symbol string is built per session by an ordered
    in-group sort (array_sort over (rn, sym) structs - bounded by
    session length, never data-sized), and the regex runs once per
    SESSION, JVM-side.  Match counting uses the split-length trick -
    size(split(s, pat)) - 1 - whose trailing-empty-string semantics
    agree between Spark (limit -1) and DuckDB's
    regexp_split_to_array, and the pattern cannot match empty so the
    count is well-defined on both."""
    e = load(spark, sf_dir, "events")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("sym"),
        F.when(
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(worder)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = seq.select(
        "user_id",
        "ts",
        "event_id",
        "sym",
        F.sum("brk")
        .over(worder.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_idx"),
    )
    wsess = Window.partitionBy("user_id", "session_idx").orderBy(
        "ts", "event_id"
    )
    strs = (
        sess.withColumn("rn", F.row_number().over(wsess))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "sym"))),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("symbols"),
        )
    )
    return (
        strs.filter(F.col("n_events") >= 3)
        .select(
            "user_id",
            "session_idx",
            "n_events",
            (F.size(F.split("symbols", "vc*p")) - 1)
            .cast("bigint")
            .alias("n_funnels"),
            F.regexp_extract("symbols", "vc*p", 0).alias("first_funnel"),
        )
        .orderBy("user_id", "session_idx")
    )


@register(
    "q149_user_feature_matrix",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors,
             round(sum(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END), 2) AS monetary,
             CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST(count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT))
                  AS BIGINT) AS active_days,
             min(epoch(ts)) AS first_s,
             max(epoch(ts)) AS last_s
      FROM events GROUP BY user_id
    ), obs AS (
      SELECT max(last_s) AS obs_end FROM per_user
    )
    SELECT user_id, n_events, n_purchases, n_errors, monetary, n_types,
           active_days,
           CAST(floor((obs.obs_end - last_s) / 86400) AS BIGINT)
             AS recency_days,
           CAST(floor((last_s - first_s) / 86400) AS BIGINT) AS span_days,
           round(CAST(n_events AS DOUBLE) / active_days, 4)
             AS events_per_active_day
    FROM per_user, obs
    ORDER BY user_id
    """,
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature matrix: the feature-engineering pass that
    turns a raw event stream into an ML training table - RFM-style
    recency/frequency/monetary plus behavioral breadth (distinct
    types, active days, events per active day) in ONE reduction.
    This is the feature-store materialization every churn/LTV model
    starts from (q132 consumes exactly these shapes downstream).

    100 TB shape: a single partial+final aggregate over the stream
    (count-distincts expand in the same pass), checkpointed so the
    observation-end scalar derives from the reduction instead of a
    second scan - the q142 pattern.  Monetary sums round at 2 on
    both sides; day arithmetic is epoch-integer division."""
    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("monetary"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.countDistinct(
                F.floor(F.col("ts").cast("double") / 86400).cast("bigint")
            )
            .cast("bigint")
            .alias("active_days"),
            F.min(F.col("ts").cast("double")).alias("first_s"),
            F.max(F.col("ts").cast("double")).alias("last_s"),
        )
        .localCheckpoint()
    )
    obs = per_user.agg(F.max("last_s").alias("obs_end"))
    return (
        per_user.crossJoin(F.broadcast(obs))
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "n_errors",
            "monetary",
            "n_types",
            "active_days",
            F.floor((F.col("obs_end") - F.col("last_s")) / 86400)
            .cast("bigint")
            .alias("recency_days"),
            F.floor((F.col("last_s") - F.col("first_s")) / 86400)
            .cast("bigint")
            .alias("span_days"),
            F.round(
                F.col("n_events").cast("double") / F.col("active_days"), 4
            ).alias("events_per_active_day"),
        )
        .orderBy("user_id")
    )


@register(
    "q150_session_summary",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                  ) > 1800 THEN 1 ELSE 0 END AS brk
      FROM events
    ), sess AS (
      SELECT *, sum(brk) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_idx
      FROM seq
    ), per_session AS (
      SELECT user_id, session_idx,
             CAST(count(*) AS BIGINT) AS n_events,
             max(epoch(ts)) - min(epoch(ts)) AS duration_s,
             first(event_type ORDER BY ts, event_id) AS entry_type
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT entry_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           round(avg(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 4)
             AS bounce_rate,
           round(avg(n_events), 2) AS avg_events,
           round(avg(duration_s), 2) AS avg_duration_s
    FROM per_session
    GROUP BY entry_type
    ORDER BY entry_type
    """,
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session summary by entry point: sessionize (30-min gap, the
    q136 substrate), then profile sessions by their FIRST event type
    - session count, bounce rate (single-event sessions), mean
    length and duration.  The landing-page analytics read: which
    entry points start engaged sessions and which bounce.

    100 TB shape: the sessionization windows share one per-user
    sort; the entry type rides the SAME per-session aggregate as
    min-by-(ts, event_id) (no extra window pass), and the final
    reduction is entry-type-sized.  Durations are epoch-second
    doubles of exact microsecond ticks (exactly representable);
    averages round at 2/4."""
    e = load(spark, sf_dir, "events")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(worder)
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    ).select(
        "*",
        F.sum("brk")
        .over(worder.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    per_session = sess.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (
            F.max(F.col("ts").cast("double"))
            - F.min(F.col("ts").cast("double"))
        ).alias("duration_s"),
        F.min_by(
            "event_type", F.struct(F.col("ts"), F.col("event_id"))
        ).alias("entry_type"),
    )
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.round(
                F.avg(F.when(F.col("n_events") == 1, 1.0).otherwise(0.0)), 4
            ).alias("bounce_rate"),
            F.round(F.avg("n_events"), 2).alias("avg_events"),
            F.round(F.avg("duration_s"), 2).alias("avg_duration_s"),
        )
        .orderBy("entry_type")
    )


@register(
    "q155_cohort_ltv",
    oracle="""
    WITH pur AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, day
    ), aged AS (
      SELECT user_id,
             min(day) OVER (PARTITION BY user_id) AS cohort_day,
             day - min(day) OVER (PARTITION BY user_id) AS age,
             cents
      FROM pur
    ), cells AS (
      SELECT cohort_day, age,
             sum(cents) AS cents,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers
      FROM aged GROUP BY cohort_day, age
    )
    SELECT cohort_day, age,
           CAST(first_value(n_buyers) OVER (
             PARTITION BY cohort_day ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cohort_size,
           n_buyers,
           CAST(sum(cents) OVER (
             PARTITION BY cohort_day ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_cents,
           CAST(sum(cents) OVER (
             PARTITION BY cohort_day ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) // first_value(n_buyers) OVER (
             PARTITION BY cohort_day ORDER BY age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS ltv_cents_per_user
    FROM cells
    ORDER BY cohort_day, age
    """,
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by FIRST purchase day, each
    cohort's cumulative revenue per member tracked over cohort age -
    the payback-period read that q110's retention counts can't give
    (retention says who came back; LTV says what they were worth).

    100 TB shape: ONE scan (purchase filter pushed to parquet),
    reduced to (user, day) cents cells; the cohort day is a bounded
    per-user window over THAT reduction (days-per-user-sized, never
    event-sized); then (cohort, age) cells and a per-cohort
    cumulative window over the span-bounded curve table.  The cohort
    SIZE rides the same window as first_value(n_buyers) - every
    member purchases at age 0 by construction, so no second pass /
    second scan for a size table (Spark would re-execute the whole
    reduction for it).  Exact BIGINT cents end-to-end INCLUDING the
    output: per-user LTV is integer-floored cents (a half-cent
    boundary under round() is exactly where Spark's shortest-
    decimal-repr HALF_UP and DuckDB's binary rounding disagree -
    62355/200 = 311.775 rounds to .78 vs .77)."""
    e = load(spark, sf_dir, "events")
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.floor(F.col("ts").cast("double") / 86400)
            .cast("bigint")
            .alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
        )
    )
    wu = Window.partitionBy("user_id")
    aged = pur.select(
        "user_id",
        F.min("day").over(wu).alias("cohort_day"),
        (F.col("day") - F.min("day").over(wu)).alias("age"),
        "cents",
    )
    cells = aged.groupBy("cohort_day", "age").agg(
        F.sum("cents").alias("cents"),
        F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
    )
    cum = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    size = F.first("n_buyers").over(cum)
    return (
        cells.select(
            "cohort_day",
            "age",
            size.alias("cohort_size"),
            "n_buyers",
            F.sum("cents").over(cum).alias("cum_cents"),
        )
        .withColumn(
            "ltv_cents_per_user", F.expr("cum_cents div cohort_size")
        )
        .orderBy("cohort_day", "age")
    )


@register(
    "q158_event_doublefire",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             epoch(ts) - lag(epoch(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap_s) AS BIGINT) AS n_repeats,
           CAST(sum(CASE WHEN gap_s <= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_doublefire,
           round(CAST(sum(CASE WHEN gap_s <= 5 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS doublefire_rate,
           round(quantile_cont(gap_s, 0.5), 2) AS median_gap_s
    FROM seq GROUP BY event_type ORDER BY event_type
    """,
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-fire detection: consecutive same-type events from the
    same user within 5 seconds - the instrumentation-bug / double-
    click signature every event-pipeline QA suite screens for,
    reported per type with the repeat-gap median for context.

    100 TB shape: one per-(user, type) window (bounded partitions -
    the two-column key fans out far wider than per-user alone), gap
    arithmetic on exact epoch seconds of microsecond ticks, one
    grouped agg; the median folds per type (bounded group count, the
    q74 exact-percentile pattern)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap_s"),
    )
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count("gap_s").cast("bigint").alias("n_repeats"),
            F.sum(F.when(F.col("gap_s") <= 5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_doublefire"),
            F.round(
                F.sum(F.when(F.col("gap_s") <= 5, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                4,
            ).alias("doublefire_rate"),
            F.round(F.percentile("gap_s", 0.5), 2).alias("median_gap_s"),
        )
        .orderBy("event_type")
    )
