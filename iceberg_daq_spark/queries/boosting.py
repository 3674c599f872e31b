"""Q237: AdaBoost with two decision stumps - distributed ENSEMBLE
training.

q234 trains the split primitive; this runs the actual boosting loop
on top of it: stump 1 by information gain, exponential reweighting of
its mistakes, stump 2 by MINIMUM WEIGHTED ERROR under the new
weights, ensemble vote weighted by the alphas.  The distributed-
systems point: after stump 1 every row's weight is one of exactly TWO
constants (correct / wrong), so the weighted split search still needs
only per-(feature, value) contingency COUNTS - four of them instead
of two - and the whole second round remains a single combinable
partial agg + a 61-cell window.  Boosting at 100 TB is one pass per
round, never a per-row weight table shuffle.

Determinism: weights quantize to micro-units (one sqrt from exact
integer counts), all masses are products of BIGINT counts with those
constants, argmin/argmax rank on ROUNDED scores with total
tie-breaks, and the final accuracy is a count ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_Q = 1_000_000

_ENT = """
  (CASE WHEN {p} IN (0, {n}) THEN 0.0 ELSE
    -({p} * 1.0 / {n}) * ln({p} * 1.0 / {n})
    - (({n} - {p}) * 1.0 / {n}) * ln(({n} - {p}) * 1.0 / {n}) END)
"""


def _ig(nn="tot.nn", pp="tot.pp", nl="nl", pl="pl"):
    parent = _ENT.format(p=pp, n=nn)
    left = _ENT.format(p=pl, n=nl)
    right = _ENT.format(p=f"({pp} - {pl})", n=f"({nn} - {nl})")
    return (
        f"round({parent} - ({nl} * 1.0 / {nn}) * {left}"
        f" - (({nn} - {nl}) * 1.0 / {nn}) * {right}, 6)"
    )


@register(
    "q237_adaboost_stumps",
    oracle=f"""
    WITH x AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS f1,
             CAST(round(l_quantity) AS BIGINT) AS f2,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y
      FROM lineitem
    ), cells1 AS (
      SELECT 'f1' AS feature, f1 AS v, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p
      FROM x GROUP BY v
      UNION ALL
      SELECT 'f2', f2, CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM x GROUP BY f2
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nn,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pp
      FROM x
    ), splits1 AS (
      SELECT feature, v AS thr,
             CAST(sum(n) OVER w AS BIGINT) AS nl,
             CAST(sum(p) OVER w AS BIGINT) AS pl
      FROM cells1
      WINDOW w AS (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), best1 AS (
      SELECT feature, thr,
             CASE WHEN 2 * pl >= nl THEN 1 ELSE -1 END AS lp,
             CASE WHEN 2 * (tot.pp - pl) >= (tot.nn - nl)
                  THEN 1 ELSE -1 END AS rp,
             CAST(CASE WHEN 2 * pl >= nl THEN nl - pl ELSE pl END
                + CASE WHEN 2 * (tot.pp - pl) >= (tot.nn - nl)
                       THEN (tot.nn - nl) - (tot.pp - pl)
                       ELSE tot.pp - pl END AS BIGINT) AS wrong1,
             tot.nn AS nn
      FROM splits1, tot
      WHERE nl < tot.nn
      ORDER BY {_ig()} DESC, feature, thr LIMIT 1
    ), w1 AS (
      SELECT feature, thr, lp, rp, wrong1, nn,
             wrong1 * 1.0 / nn AS err1,
             CAST(round({_Q} * sqrt(wrong1 * 1.0 / (nn - wrong1)))
                  AS BIGINT) AS wc_u,
             CAST(round({_Q} * sqrt((nn - wrong1) * 1.0 / wrong1))
                  AS BIGINT) AS ww_u
      FROM best1
    ), x1 AS (
      SELECT x.f1, x.f2, x.y,
             (CASE WHEN (CASE WHEN w1.feature = 'f1' THEN x.f1 ELSE x.f2
                         END) <= w1.thr
                   THEN w1.lp ELSE w1.rp END) = x.y AS c1
      FROM x, w1
    ), cells2 AS (
      SELECT 'f1' AS feature, f1 AS v,
             CAST(sum(CASE WHEN y = 1 AND c1 THEN 1 ELSE 0 END) AS BIGINT) AS pc,
             CAST(sum(CASE WHEN y = 1 AND NOT c1 THEN 1 ELSE 0 END) AS BIGINT) AS pw,
             CAST(sum(CASE WHEN y = -1 AND c1 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN y = -1 AND NOT c1 THEN 1 ELSE 0 END) AS BIGINT) AS nw
      FROM x1 GROUP BY v
      UNION ALL
      SELECT 'f2', f2,
             CAST(sum(CASE WHEN y = 1 AND c1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN y = 1 AND NOT c1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN y = -1 AND c1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN y = -1 AND NOT c1 THEN 1 ELSE 0 END) AS BIGINT)
      FROM x1 GROUP BY f2
    ), tot2 AS (
      SELECT CAST(sum(pc) AS BIGINT) AS tpc, CAST(sum(pw) AS BIGINT) AS tpw,
             CAST(sum(nc) AS BIGINT) AS tnc, CAST(sum(nw) AS BIGINT) AS tnw
      FROM cells2 WHERE feature = 'f1'
    ), splits2 AS (
      SELECT feature, v AS thr,
             CAST(sum(pc) OVER w AS BIGINT) AS cpc,
             CAST(sum(pw) OVER w AS BIGINT) AS cpw,
             CAST(sum(nc) OVER w AS BIGINT) AS cnc,
             CAST(sum(nw) OVER w AS BIGINT) AS cnw
      FROM cells2
      WINDOW w AS (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), scored2 AS (
      SELECT s.feature, s.thr,
             w1.wc_u * s.cpc + w1.ww_u * s.cpw AS plm,
             w1.wc_u * s.cnc + w1.ww_u * s.cnw AS nlm,
             w1.wc_u * (t.tpc - s.cpc) + w1.ww_u * (t.tpw - s.cpw) AS prm,
             w1.wc_u * (t.tnc - s.cnc) + w1.ww_u * (t.tnw - s.cnw) AS nrm,
             w1.wc_u * (t.tpc + t.tnc) + w1.ww_u * (t.tpw + t.tnw) AS wtot
      FROM splits2 s, tot2 t, w1
      WHERE s.cpc + s.cpw + s.cnc + s.cnw
            < t.tpc + t.tpw + t.tnc + t.tnw
    ), best2 AS (
      SELECT feature, thr,
             CASE WHEN plm >= nlm THEN 1 ELSE -1 END AS lp,
             CASE WHEN prm >= nrm THEN 1 ELSE -1 END AS rp,
             (least(plm, nlm) + least(prm, nrm)) * 1.0 / wtot AS err2
      FROM scored2
      ORDER BY least(plm, nlm) + least(prm, nrm), feature, thr
      LIMIT 1
    ), alphas AS (
      SELECT w1.feature AS feature1, w1.thr AS thr1, w1.lp AS lp1,
             w1.rp AS rp1, round(w1.err1, 6) AS err1,
             round(0.5 * ln((1.0 - w1.err1) / w1.err1), 4) AS alpha1,
             b2.feature AS feature2, b2.thr AS thr2, b2.lp AS lp2,
             b2.rp AS rp2, round(b2.err2, 6) AS err2,
             round(0.5 * ln((1.0 - b2.err2) / b2.err2), 4) AS alpha2
      FROM w1, best2 b2
    ), ens AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN
               (CASE WHEN a.alpha1 *
                 (CASE WHEN (CASE WHEN a.feature1 = 'f1' THEN x.f1
                             ELSE x.f2 END) <= a.thr1
                       THEN a.lp1 ELSE a.rp1 END)
                + a.alpha2 *
                 (CASE WHEN (CASE WHEN a.feature2 = 'f1' THEN x.f1
                             ELSE x.f2 END) <= a.thr2
                       THEN a.lp2 ELSE a.rp2 END) > 0
                 THEN 1 ELSE -1 END) = x.y
               THEN 1 ELSE 0 END) AS BIGINT) AS hits
      FROM x, alphas a
    )
    SELECT a.feature1, CAST(a.thr1 AS BIGINT) AS thr1, a.err1, a.alpha1,
           a.feature2, CAST(a.thr2 AS BIGINT) AS thr2, a.err2, a.alpha2,
           round(e.hits * 1.0 / e.n, 4) AS train_acc
    FROM alphas a, ens e
    """,
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round AdaBoost over decision stumps (returnflag='R' from
    discount points / quantity): stump 1 by information gain, stump 2
    by minimum weighted error under the exponential reweighting of
    stump 1's mistakes, final ensemble accuracy under the
    alpha-weighted vote (score > 0 predicts positive - the declared
    tie rule).

    After round 1 every weight is one of TWO micro-unit constants
    (sqrt(err/(1-err)) and its inverse), so round 2 still reduces to
    per-(feature, value) contingency counts - four per cell - and the
    weighted split search is a 61-cell window + argmin.  Each round
    is one combinable pass; model state moves as broadcast 1-row
    tables."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("f1"),
        F.round("l_quantity").cast("bigint").alias("f2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(-1).alias("y"),
    ).localCheckpoint()

    pos = F.when(F.col("y") == 1, 1).otherwise(0)
    # Both features' contingency cells in ONE pass: explode each row
    # into its (feature, value) pairs map-side and run a single
    # combinable groupBy - the partial agg reduces the doubled rows to
    # the ~61 cells before the exchange (was: one full groupBy pass
    # per feature, unioned).  Pinned: splits1 and tot both read it.
    feat_map = F.create_map(
        F.lit("f1"), F.col("f1"), F.lit("f2"), F.col("f2")
    )
    cells1 = (
        li.select(F.explode(feat_map).alias("feature", "v"), "y")
        .groupBy("feature", "v")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(pos).cast("bigint").alias("p"),
        )
        .localCheckpoint()
    )
    # round-1 totals fold from the pinned f1 cells (sum of per-value
    # counts == global counts, exact integers) - no second full scan;
    # the same move tot2 makes from cells2 below
    tot = cells1.filter(F.col("feature") == "f1").agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("p").cast("bigint").alias("pp"),
    )
    wcum = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    splits1 = (
        cells1.select(
            "feature",
            F.col("v").alias("thr"),
            F.sum("n").over(wcum).cast("bigint").alias("nl"),
            F.sum("p").over(wcum).cast("bigint").alias("pl"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("nn"))
    )
    ig = F.expr(_ig(nn="nn", pp="pp", nl="nl", pl="pl"))
    lp1 = F.when(2 * F.col("pl") >= F.col("nl"), 1).otherwise(-1)
    rp1 = F.when(
        2 * (F.col("pp") - F.col("pl")) >= (F.col("nn") - F.col("nl")), 1
    ).otherwise(-1)
    wrong1 = F.when(
        lp1 == 1, F.col("nl") - F.col("pl")
    ).otherwise(F.col("pl")) + F.when(
        rp1 == 1,
        (F.col("nn") - F.col("nl")) - (F.col("pp") - F.col("pl")),
    ).otherwise(F.col("pp") - F.col("pl"))
    best1 = (
        splits1.select(
            "feature",
            "thr",
            lp1.alias("lp"),
            rp1.alias("rp"),
            wrong1.cast("bigint").alias("wrong1"),
            "nn",
            ig.alias("ig"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("ig").desc(), "feature", "thr")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk", "ig")
    )
    err1 = F.col("wrong1") * 1.0 / F.col("nn")
    w1 = best1.select(
        "feature",
        "thr",
        "lp",
        "rp",
        "nn",
        err1.alias("err1"),
        F.round(
            _Q
            * F.sqrt(
                F.col("wrong1") * 1.0 / (F.col("nn") - F.col("wrong1"))
            )
        )
        .cast("bigint")
        .alias("wc_u"),
        F.round(
            _Q
            * F.sqrt(
                (F.col("nn") - F.col("wrong1")) * 1.0 / F.col("wrong1")
            )
        )
        .cast("bigint")
        .alias("ww_u"),
    ).localCheckpoint()  # 1-row model state; read by stump-2 scoring,
    # splits2 and alphas - without the pin each reference re-derives
    # the full cells1 + window + argmax subtree
    xf = F.when(F.col("feature") == "f1", F.col("f1")).otherwise(
        F.col("f2")
    )
    h1 = F.when(xf <= F.col("thr"), F.col("lp")).otherwise(F.col("rp"))
    x1 = li.crossJoin(F.broadcast(w1)).select(
        "f1", "f2", "y", (h1 == F.col("y")).alias("c1")
    )
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
    # same one-pass explode as cells1; pinned because tot2 AND splits2
    # consume it (each re-derivation re-ran the full 600k-row stump-1
    # scoring pass)
    cells2 = (
        x1.select(F.explode(feat_map).alias("feature", "v"), "y", "c1")
        .groupBy("feature", "v")
        .agg(
            cnt((F.col("y") == 1) & F.col("c1")).alias("pc"),
            cnt((F.col("y") == 1) & ~F.col("c1")).alias("pw"),
            cnt((F.col("y") == -1) & F.col("c1")).alias("nc"),
            cnt((F.col("y") == -1) & ~F.col("c1")).alias("nw"),
        )
        .localCheckpoint()
    )
    tot2 = cells2.filter(F.col("feature") == "f1").agg(
        F.sum("pc").cast("bigint").alias("tpc"),
        F.sum("pw").cast("bigint").alias("tpw"),
        F.sum("nc").cast("bigint").alias("tnc"),
        F.sum("nw").cast("bigint").alias("tnw"),
    )
    splits2 = (
        cells2.select(
            "feature",
            F.col("v").alias("thr"),
            F.sum("pc").over(wcum).cast("bigint").alias("cpc"),
            F.sum("pw").over(wcum).cast("bigint").alias("cpw"),
            F.sum("nc").over(wcum).cast("bigint").alias("cnc"),
            F.sum("nw").over(wcum).cast("bigint").alias("cnw"),
        )
        .crossJoin(F.broadcast(tot2))
        .crossJoin(
            F.broadcast(
                w1.select(
                    F.col("feature").alias("_bf"),
                    F.col("thr").alias("_bt"),
                    "wc_u",
                    "ww_u",
                )
            )
        )
        .filter(
            F.col("cpc") + F.col("cpw") + F.col("cnc") + F.col("cnw")
            < F.col("tpc") + F.col("tpw") + F.col("tnc") + F.col("tnw")
        )
    )
    plm = F.col("wc_u") * F.col("cpc") + F.col("ww_u") * F.col("cpw")
    nlm = F.col("wc_u") * F.col("cnc") + F.col("ww_u") * F.col("cnw")
    prm = F.col("wc_u") * (F.col("tpc") - F.col("cpc")) + F.col("ww_u") * (
        F.col("tpw") - F.col("cpw")
    )
    nrm = F.col("wc_u") * (F.col("tnc") - F.col("cnc")) + F.col("ww_u") * (
        F.col("tnw") - F.col("cnw")
    )
    wtot = F.col("wc_u") * (F.col("tpc") + F.col("tnc")) + F.col(
        "ww_u"
    ) * (F.col("tpw") + F.col("tnw"))
    e2u = F.least(plm, nlm) + F.least(prm, nrm)
    best2 = (
        splits2.select(
            F.col("feature").alias("feature2"),
            F.col("thr").alias("thr2"),
            F.when(plm >= nlm, 1).otherwise(-1).alias("lp2"),
            F.when(prm >= nrm, 1).otherwise(-1).alias("rp2"),
            (e2u * 1.0 / wtot).alias("err2"),
            e2u.cast("bigint").alias("_e2u"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy("_e2u", "feature2", "thr2")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk", "_e2u")
    )
    alphas = (
        w1.select(
            F.col("feature").alias("feature1"),
            F.col("thr").alias("thr1"),
            F.col("lp").alias("lp1"),
            F.col("rp").alias("rp1"),
            F.round(F.col("err1"), 6).alias("err1"),
            F.round(
                0.5 * F.log((1.0 - F.col("err1")) / F.col("err1")), 4
            ).alias("alpha1"),
        )
        .crossJoin(F.broadcast(best2))
        .select(
            "*",
            F.round(
                0.5 * F.log((1.0 - F.col("err2")) / F.col("err2")), 4
            ).alias("alpha2"),
        )
    ).localCheckpoint()  # 1-row ensemble; read by ens and the final row
    xa1 = F.when(F.col("feature1") == "f1", F.col("f1")).otherwise(
        F.col("f2")
    )
    xa2 = F.when(F.col("feature2") == "f1", F.col("f1")).otherwise(
        F.col("f2")
    )
    h1e = F.when(xa1 <= F.col("thr1"), F.col("lp1")).otherwise(
        F.col("rp1")
    )
    h2e = F.when(xa2 <= F.col("thr2"), F.col("lp2")).otherwise(
        F.col("rp2")
    )
    vote = F.col("alpha1") * h1e + F.col("alpha2") * h2e
    pred = F.when(vote > 0, 1).otherwise(-1)
    ens = (
        li.crossJoin(F.broadcast(alphas))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(pred == F.col("y"), 1).otherwise(0))
            .cast("bigint")
            .alias("hits"),
        )
    )
    return (
        alphas.crossJoin(F.broadcast(ens))
        .select(
            "feature1",
            "thr1",
            F.round("err1", 6).alias("err1"),
            "alpha1",
            "feature2",
            "thr2",
            F.round("err2", 6).alias("err2"),
            "alpha2",
            F.round(F.col("hits") * 1.0 / F.col("n"), 4).alias(
                "train_acc"
            ),
        )
    )
