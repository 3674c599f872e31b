"""Q233-Q234: model-evaluation and tree-induction battery.

q233 closes the q87/q225/q228 modeling loop with the metrics a model
SHIPS with: ROC-AUC (rank-sum form - the threshold-free twin of
q164's Mann-Whitney U), Brier score, expected calibration error over
10 score bins, and top-decile lift.  Every metric reduces to exact
integer sums (milli-unit scores, doubled average ranks) before one
fixed-shape double expression, so the numbers are engine-identical.

q234 trains the C4.5 PRIMITIVE - a depth-1 decision stump: one
combinable pass reduces the data to per-(feature, value) label
counts, a running cumulative sum turns the 61-cell grid into every
candidate split's left/right contingency table, and the argmax of
information gain (micro-nat entropies, rounded before ranking) picks
the stump.  At 100 TB the search cost is the single partial-agg scan;
the split evaluation is metadata-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q233_model_eval",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ), z AS (
      SELECT doc_id, y, len(ws) AS n_tok,
             list_sum(list_transform(ws, w ->
               ((((length(w) * 7 + ascii(substr(w, 1, 1))) % 64)
                  * 37 + 11) % 97) / 97.0 - 0.5
             )) AS acc
      FROM t
    ), s AS (
      SELECT doc_id, y,
             CAST(round(1000.0 /
               (1.0 + exp(-(acc / n_tok * 8.0 + 0.2)))) AS BIGINT) AS sm
      FROM z WHERE n_tok > 0
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
             CAST(sum((sm - 1000 * y) * (sm - 1000 * y)) AS BIGINT)
               AS brier_u
      FROM s
    ), grid AS (
      SELECT sm, CAST(sum(y) AS BIGINT) AS cp, CAST(count(*) AS BIGINT) AS cn
      FROM s GROUP BY sm
    ), ranked AS (
      SELECT sm, cp, cn,
             CAST(2 * (sum(cn) OVER (ORDER BY sm) - cn) + cn + 1
                  AS BIGINT) AS ar2
      FROM grid
    ), rsum AS (
      SELECT CAST(sum(cp * ar2) AS BIGINT) AS r2_pos FROM ranked
    ), bins AS (
      SELECT least(sm // 100, 9) AS bin,
             CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(sm) AS BIGINT) AS ssum,
             CAST(sum(y) AS BIGINT) AS pb
      FROM s GROUP BY bin
    ), ece AS (
      SELECT sum(nb * abs(ssum / (nb * 1000.0) - pb * 1.0 / nb)) AS ece_n
      FROM bins
    ), dec AS (
      SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(y) AS BIGINT) AS pd
      FROM (SELECT y, ntile(10) OVER (ORDER BY sm DESC, doc_id) AS dc
            FROM s)
      WHERE dc = 1
    )
    SELECT tot.n AS n_docs, tot.n_pos, tot.n_neg,
           round((rsum.r2_pos / 2.0
                  - tot.n_pos * (tot.n_pos + 1) / 2.0)
                 / (tot.n_pos * 1.0 * tot.n_neg), 4) AS auc,
           round(tot.brier_u / (tot.n * 1000000.0), 4) AS brier,
           round(ece.ece_n / tot.n, 4) AS ece,
           round((dec.pd * 1.0 / dec.nd) / (tot.n_pos * 1.0 / tot.n), 4)
             AS top_decile_lift
    FROM tot, rsum, ece, dec
    """,
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation battery over q87's hashed-feature classifier
    scores against an 'is-English' label: rank-sum ROC-AUC with exact
    tie handling (doubled average ranks stay integer), Brier score
    from milli-unit integer scores, 10-bin expected calibration
    error, and top-decile lift (ntile over the total order
    (score desc, doc_id)).

    Label and score are deliberately near-independent on this corpus
    (AUC ~0.5): the battery certifies the METRIC computation, which
    is what has to be engine-exact.  100 TB shape: one map-only
    scoring pass, a partial agg onto the ~1000-value score grid for
    the rank sum, a 10-bin agg for calibration - everything after the
    scan is metadata-sized except the ntile window, which rides the
    same range layout as q105's percentile rank."""
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")

    def _weight(w):
        bucket = (F.length(w) * 7 + F.ascii(F.substring(w, 1, 1))) % 64
        return ((bucket * 37 + 11) % 97) / F.lit(97.0) - 0.5

    acc = F.aggregate(F.transform(ws, _weight), F.lit(0.0), lambda a, x: a + x)
    z = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.size(ws).alias("n_tok"),
        acc.alias("acc"),
    ).filter(F.col("n_tok") > 0)
    logit = F.col("acc") / F.col("n_tok") * 8.0 + 0.2
    s = z.select(
        "doc_id",
        "y",
        F.round(1000.0 / (1.0 + F.exp(-logit))).cast("bigint").alias("sm"),
    ).localCheckpoint()

    tot = s.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
        F.sum(
            (F.col("sm") - 1000 * F.col("y"))
            * (F.col("sm") - 1000 * F.col("y"))
        )
        .cast("bigint")
        .alias("brier_u"),
    )
    grid = s.groupBy("sm").agg(
        F.sum("y").cast("bigint").alias("cp"),
        F.count("*").cast("bigint").alias("cn"),
    )
    wcum = Window.orderBy("sm").rowsBetween(Window.unboundedPreceding, 0)
    ranked = grid.select(
        "cp",
        (
            2 * (F.sum("cn").over(wcum) - F.col("cn")) + F.col("cn") + 1
        )
        .cast("bigint")
        .alias("ar2"),
    )
    rsum = ranked.agg(
        F.sum(F.col("cp") * F.col("ar2")).cast("bigint").alias("r2_pos")
    )
    bins = s.groupBy(
        F.least(F.expr("sm div 100"), F.lit(9)).alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("nb"),
        F.sum("sm").cast("bigint").alias("ssum"),
        F.sum("y").cast("bigint").alias("pb"),
    )
    ece = bins.agg(
        F.sum(
            F.col("nb")
            * F.abs(
                F.col("ssum") / (F.col("nb") * 1000.0)
                - F.col("pb") * 1.0 / F.col("nb")
            )
        ).alias("ece_n")
    )
    dec = (
        s.select(
            "y",
            F.ntile(10)
            .over(Window.orderBy(F.col("sm").desc(), "doc_id"))
            .alias("dc"),
        )
        .filter(F.col("dc") == 1)
        .agg(
            F.count("*").cast("bigint").alias("nd"),
            F.sum("y").cast("bigint").alias("pd"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(rsum))
        .crossJoin(F.broadcast(ece))
        .crossJoin(F.broadcast(dec))
        .select(
            F.col("n").alias("n_docs"),
            "n_pos",
            "n_neg",
            F.round(
                (
                    F.col("r2_pos") / 2.0
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos") * 1.0 * F.col("n_neg")),
                4,
            ).alias("auc"),
            F.round(F.col("brier_u") / (F.col("n") * 1_000_000.0), 4).alias(
                "brier"
            ),
            F.round(F.col("ece_n") / F.col("n"), 4).alias("ece"),
            F.round(
                (F.col("pd") * 1.0 / F.col("nd"))
                / (F.col("n_pos") * 1.0 / F.col("n")),
                4,
            ).alias("top_decile_lift"),
        )
    )


@register(
    "q234_decision_stump",
    oracle="""
    WITH x AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS f1,
             CAST(round(l_quantity) AS BIGINT) AS f2,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), cells AS (
      SELECT 'discount_pts' AS feature, f1 AS v,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
      FROM x GROUP BY v
      UNION ALL
      SELECT 'quantity', f2, CAST(count(*) AS BIGINT),
             CAST(sum(y) AS BIGINT)
      FROM x GROUP BY f2
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nn, CAST(sum(y) AS BIGINT) AS pp
      FROM x
    ), splits AS (
      SELECT feature, v AS thr,
             CAST(sum(n) OVER w AS BIGINT) AS nl,
             CAST(sum(p) OVER w AS BIGINT) AS pl
      FROM cells
      WINDOW w AS (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), scored AS (
      SELECT feature, thr, nl, pl,
             tot.nn - nl AS nr, tot.pp - pl AS pr, tot.nn, tot.pp,
             round(
               (CASE WHEN tot.pp IN (0, tot.nn) THEN 0.0 ELSE
                 -(tot.pp * 1.0 / tot.nn) * ln(tot.pp * 1.0 / tot.nn)
                 - ((tot.nn - tot.pp) * 1.0 / tot.nn)
                   * ln((tot.nn - tot.pp) * 1.0 / tot.nn) END)
               - (nl * 1.0 / tot.nn) *
                 (CASE WHEN pl IN (0, nl) THEN 0.0 ELSE
                   -(pl * 1.0 / nl) * ln(pl * 1.0 / nl)
                   - ((nl - pl) * 1.0 / nl) * ln((nl - pl) * 1.0 / nl) END)
               - ((tot.nn - nl) * 1.0 / tot.nn) *
                 (CASE WHEN tot.pp - pl IN (0, tot.nn - nl) THEN 0.0 ELSE
                   -((tot.pp - pl) * 1.0 / (tot.nn - nl))
                     * ln((tot.pp - pl) * 1.0 / (tot.nn - nl))
                   - ((tot.nn - nl - tot.pp + pl) * 1.0 / (tot.nn - nl))
                     * ln((tot.nn - nl - tot.pp + pl) * 1.0
                          / (tot.nn - nl)) END), 6) AS info_gain
      FROM splits, tot
      WHERE nl < tot.nn
    )
    SELECT feature AS best_feature, CAST(thr AS BIGINT) AS best_threshold,
           info_gain,
           nl AS n_left, nr AS n_right,
           round(pl * 1.0 / nl, 4) AS pos_rate_left,
           round(pr * 1.0 / nr, 4) AS pos_rate_right
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY info_gain DESC, feature, thr) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-1 decision stump (the C4.5 split primitive) for
    returnflag='R' over discount points and quantity: one combinable
    pass reduces lineitem to per-(feature, value) label counts, a
    cumulative window turns the ~61-cell grid into every candidate
    split's left/right contingency table, and the best split is the
    information-gain argmax (entropies as one fixed-shape double
    expression over exact integer counts, rounded to 6 before the
    rank; ties break (feature, threshold)).

    100 TB shape: the ONLY data-sized cost is the first partial agg;
    split search is a 61-row window + argmax.  This is why stump /
    tree induction distributes: candidate evaluation needs
    contingency COUNTS, not rows."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("f1"),
        F.round("l_quantity").cast("bigint").alias("f2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).localCheckpoint()
    c1 = li.groupBy(F.col("f1").alias("v")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("p"),
    ).select(F.lit("discount_pts").alias("feature"), "v", "n", "p")
    c2 = li.groupBy(F.col("f2").alias("v")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("p"),
    ).select(F.lit("quantity").alias("feature"), "v", "n", "p")
    cells = c1.unionByName(c2)
    tot = li.agg(
        F.count("*").cast("bigint").alias("nn"),
        F.sum("y").cast("bigint").alias("pp"),
    )
    wcum = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    splits = cells.select(
        "feature",
        F.col("v").alias("thr"),
        F.sum("n").over(wcum).cast("bigint").alias("nl"),
        F.sum("p").over(wcum).cast("bigint").alias("pl"),
    ).crossJoin(F.broadcast(tot)).filter(F.col("nl") < F.col("nn"))

    def _ent(p, n):
        frac = p * 1.0 / n
        return F.when(
            (p == 0) | (p == n), F.lit(0.0)
        ).otherwise(-frac * F.log(frac) - (1.0 - frac) * F.log(1.0 - frac))

    nn, pp = F.col("nn"), F.col("pp")
    nl, pl = F.col("nl"), F.col("pl")
    nr, pr = nn - nl, pp - pl
    ig = F.round(
        _ent(pp, nn)
        - (nl * 1.0 / nn) * _ent(pl, nl)
        - (nr * 1.0 / nn) * _ent(pr, nr),
        6,
    )
    scored = splits.select(
        "feature",
        "thr",
        "nl",
        "pl",
        nr.cast("bigint").alias("nr"),
        pr.cast("bigint").alias("pr"),
        ig.alias("info_gain"),
    )
    wtop = Window.orderBy(F.col("info_gain").desc(), "feature", "thr")
    return (
        scored.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") == 1)
        .select(
            F.col("feature").alias("best_feature"),
            F.col("thr").alias("best_threshold"),
            "info_gain",
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.round(F.col("pl") * 1.0 / F.col("nl"), 4).alias(
                "pos_rate_left"
            ),
            F.round(F.col("pr") * 1.0 / F.col("nr"), 4).alias(
                "pos_rate_right"
            ),
        )
    )
