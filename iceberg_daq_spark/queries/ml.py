"""Q225-Q226: distributed model TRAINING battery.

q87 scores documents through a broadcast linear model; these queries
close the loop and TRAIN models with nothing but DataFrame
aggregates - the 100 TB training shape where each iteration is one
map-side-combinable pass producing a tiny Gram/centroid table, and
the "model" never exceeds driver-trivial size (so iterations chain
inside the plan via broadcast, no collect).

Determinism discipline (the q190/q218 BIGINT-fold pattern, applied to
ML): every cross-row float fold is quantized per row to BIGINT units
BEFORE summing, so aggregation order cannot change a single bit; the
dense linear algebra (3x3 Cramer solve) runs on those exact integer
sums through ONE fixed-shape double expression - the SAME expression
string is compiled by Spark and DuckDB, so both engines execute the
identical IEEE operation tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_Q = 1_000_000  # per-row quantization: micro-units


def _cramer3(p: str) -> dict[str, str]:
    """Expression strings solving the 3x3 symmetric system
    [[{p}00,{p}01,{p}02],[{p}01,{p}11,{p}12],[{p}02,{p}12,{p}22]]
    @ beta = [{p}t0,{p}t1,{p}t2], all in double arithmetic over the
    (exact-integer) sum columns.  Identical text feeds Spark's
    F.expr and the DuckDB oracle, so the IEEE op tree matches."""
    d = {
        "det": f"""(
          CAST({p}00 AS DOUBLE) * (CAST({p}11 AS DOUBLE) * CAST({p}22 AS DOUBLE) - CAST({p}12 AS DOUBLE) * CAST({p}12 AS DOUBLE))
        - CAST({p}01 AS DOUBLE) * (CAST({p}01 AS DOUBLE) * CAST({p}22 AS DOUBLE) - CAST({p}12 AS DOUBLE) * CAST({p}02 AS DOUBLE))
        + CAST({p}02 AS DOUBLE) * (CAST({p}01 AS DOUBLE) * CAST({p}12 AS DOUBLE) - CAST({p}11 AS DOUBLE) * CAST({p}02 AS DOUBLE)))"""
    }
    # adjugate rows (symmetric matrix) dotted with the RHS
    d["b0"] = f"""((
          (CAST({p}11 AS DOUBLE) * CAST({p}22 AS DOUBLE) - CAST({p}12 AS DOUBLE) * CAST({p}12 AS DOUBLE)) * CAST({p}t0 AS DOUBLE)
        + (CAST({p}02 AS DOUBLE) * CAST({p}12 AS DOUBLE) - CAST({p}01 AS DOUBLE) * CAST({p}22 AS DOUBLE)) * CAST({p}t1 AS DOUBLE)
        + (CAST({p}01 AS DOUBLE) * CAST({p}12 AS DOUBLE) - CAST({p}02 AS DOUBLE) * CAST({p}11 AS DOUBLE)) * CAST({p}t2 AS DOUBLE)
        ) / {d['det']})"""
    d["b1"] = f"""((
          (CAST({p}02 AS DOUBLE) * CAST({p}12 AS DOUBLE) - CAST({p}01 AS DOUBLE) * CAST({p}22 AS DOUBLE)) * CAST({p}t0 AS DOUBLE)
        + (CAST({p}00 AS DOUBLE) * CAST({p}22 AS DOUBLE) - CAST({p}02 AS DOUBLE) * CAST({p}02 AS DOUBLE)) * CAST({p}t1 AS DOUBLE)
        + (CAST({p}02 AS DOUBLE) * CAST({p}01 AS DOUBLE) - CAST({p}00 AS DOUBLE) * CAST({p}12 AS DOUBLE)) * CAST({p}t2 AS DOUBLE)
        ) / {d['det']})"""
    d["b2"] = f"""((
          (CAST({p}01 AS DOUBLE) * CAST({p}12 AS DOUBLE) - CAST({p}02 AS DOUBLE) * CAST({p}11 AS DOUBLE)) * CAST({p}t0 AS DOUBLE)
        + (CAST({p}02 AS DOUBLE) * CAST({p}01 AS DOUBLE) - CAST({p}00 AS DOUBLE) * CAST({p}12 AS DOUBLE)) * CAST({p}t1 AS DOUBLE)
        + (CAST({p}00 AS DOUBLE) * CAST({p}11 AS DOUBLE) - CAST({p}01 AS DOUBLE) * CAST({p}01 AS DOUBLE)) * CAST({p}t2 AS DOUBLE)
        ) / {d['det']})"""
    return d


_C = _cramer3("m1.s")
_C2 = _cramer3("m2.s")

# step-1 closed form: beta1 = 2 * G^{-1} t  (W = 1/4, RHS = t/2)
_BETA1 = {k: f"(2.0 * {_C[k]})" for k in ("b0", "b1", "b2")}

_LOGREG_ORACLE = f"""
    WITH x AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS x1,
             CAST(round(l_quantity) AS BIGINT) AS x2,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS yy
      FROM lineitem
    ), m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS s00,
             CAST(sum(x1) AS BIGINT) AS s01,
             CAST(sum(x2) AS BIGINT) AS s02,
             CAST(sum(x1 * x1) AS BIGINT) AS s11,
             CAST(sum(x1 * x2) AS BIGINT) AS s12,
             CAST(sum(x2 * x2) AS BIGINT) AS s22,
             CAST(sum(yy) AS BIGINT) AS st0,
             CAST(sum(x1 * yy) AS BIGINT) AS st1,
             CAST(sum(x2 * yy) AS BIGINT) AS st2
      FROM x
    ), beta1 AS (
      SELECT {_BETA1['b0']} AS c0,
             {_BETA1['b1']} AS c1,
             {_BETA1['b2']} AS c2
      FROM m1
    ), r2 AS (
      SELECT x.x1, x.x2, x.yy,
             1.0 / (1.0 + exp(-(b.c0 + b.c1 * x.x1 + b.c2 * x.x2))) AS p
      FROM x, beta1 b
    ), q2 AS (
      SELECT x1, x2, yy,
             CAST(round(p * (1.0 - p) * {_Q}) AS BIGINT) AS wq,
             CAST(round(((yy + 1) / 2 - p) * {_Q}) AS BIGINT) AS rq
      FROM r2
    ), m2 AS (
      SELECT CAST(sum(wq) AS BIGINT) AS s00,
             CAST(sum(x1 * wq) AS BIGINT) AS s01,
             CAST(sum(x2 * wq) AS BIGINT) AS s02,
             CAST(sum(x1 * x1 * wq) AS BIGINT) AS s11,
             CAST(sum(x1 * x2 * wq) AS BIGINT) AS s12,
             CAST(sum(x2 * x2 * wq) AS BIGINT) AS s22,
             CAST(sum(rq) AS BIGINT) AS st0,
             CAST(sum(x1 * rq) AS BIGINT) AS st1,
             CAST(sum(x2 * rq) AS BIGINT) AS st2
      FROM q2
    ), beta2 AS (
      SELECT b.c0 + {_C2['b0']} AS c0,
             b.c1 + {_C2['b1']} AS c1,
             b.c2 + {_C2['b2']} AS c2
      FROM m2, beta1 b
    ), scored AS (
      SELECT CASE WHEN (b.c0 + b.c1 * x.x1 + b.c2 * x.x2) > 0
                  THEN 1 ELSE -1 END = x.yy AS hit
      FROM x, beta2 b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS n_rows,
           round(b.c0, 4) AS beta0,
           round(b.c1, 4) AS beta1,
           round(b.c2, 4) AS beta2,
           round((SELECT sum(CASE WHEN hit THEN 1 ELSE 0 END)::DOUBLE
                    / count(*) FROM scored), 4) AS train_acc
    FROM beta2 b
"""


@register("q225_logreg_train", oracle=_LOGREG_ORACLE)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic-regression classifier (returnflag='R' from
    discount points + quantity, with intercept) by TWO Newton-IRLS
    steps expressed entirely as DataFrame aggregates - the model that
    q87-style broadcast scoring would consume.

    Step 1 from beta=0 has the closed form beta1 = 2 G^{-1} t over
    the EXACT INTEGER Gram/label sums (p=1/2 makes the Hessian G/4
    and the gradient t/2).  Step 2 recomputes per-row sigmoid weights
    from beta1 and quantizes w=p(1-p) and the residual to micro-units
    per row, so the weighted Gram matrix folds as exact BIGINTs
    (order-free); the 3x3 Cramer solve is one fixed expression string
    compiled by BOTH engines.  100 TB shape: two combinable
    aggregation passes + one scoring pass, each over a 3-feature
    projection; the model state between passes is a broadcast 1-row
    table - never a driver round-trip.  Scale bound: |x1*x2*wq| <
    500 * 1e6 * rows, safe in int64 to ~10^10 rows; shrink _Q for
    more."""
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x1"),
        F.round("l_quantity").cast("bigint").alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(-1).alias("yy"),
    )
    m1 = li.agg(
        F.count("*").cast("bigint").alias("s00"),
        F.sum("x1").cast("bigint").alias("s01"),
        F.sum("x2").cast("bigint").alias("s02"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum("yy").cast("bigint").alias("st0"),
        F.sum(F.col("x1") * F.col("yy")).cast("bigint").alias("st1"),
        F.sum(F.col("x2") * F.col("yy")).cast("bigint").alias("st2"),
    ).alias("m1")
    beta1 = m1.select(
        F.expr(_BETA1["b0"]).alias("c0"),
        F.expr(_BETA1["b1"]).alias("c1"),
        F.expr(_BETA1["b2"]).alias("c2"),
    )
    r2 = li.crossJoin(F.broadcast(beta1)).withColumn(
        "p",
        1.0
        / (
            1.0
            + F.exp(
                -(
                    F.col("c0")
                    + F.col("c1") * F.col("x1")
                    + F.col("c2") * F.col("x2")
                )
            )
        ),
    )
    q2 = r2.select(
        "x1",
        "x2",
        F.round(F.col("p") * (1.0 - F.col("p")) * _Q)
        .cast("bigint")
        .alias("wq"),
        F.round(((F.col("yy") + 1) / 2 - F.col("p")) * _Q)
        .cast("bigint")
        .alias("rq"),
    )
    m2 = q2.agg(
        F.sum("wq").cast("bigint").alias("s00"),
        F.sum(F.col("x1") * F.col("wq")).cast("bigint").alias("s01"),
        F.sum(F.col("x2") * F.col("wq")).cast("bigint").alias("s02"),
        F.sum(F.col("x1") * F.col("x1") * F.col("wq"))
        .cast("bigint")
        .alias("s11"),
        F.sum(F.col("x1") * F.col("x2") * F.col("wq"))
        .cast("bigint")
        .alias("s12"),
        F.sum(F.col("x2") * F.col("x2") * F.col("wq"))
        .cast("bigint")
        .alias("s22"),
        F.sum("rq").cast("bigint").alias("st0"),
        F.sum(F.col("x1") * F.col("rq")).cast("bigint").alias("st1"),
        F.sum(F.col("x2") * F.col("rq")).cast("bigint").alias("st2"),
    ).alias("m2")
    beta2 = (
        m2.crossJoin(F.broadcast(beta1.select(
            F.col("c0").alias("p0"),
            F.col("c1").alias("p1"),
            F.col("c2").alias("p2"),
        )))
        .select(
            (F.col("p0") + F.expr(_C2["b0"])).alias("c0"),
            (F.col("p1") + F.expr(_C2["b1"])).alias("c1"),
            (F.col("p2") + F.expr(_C2["b2"])).alias("c2"),
        )
    )
    scored = li.crossJoin(F.broadcast(beta2)).select(
        "c0",
        "c1",
        "c2",
        (
            F.when(
                F.col("c0")
                + F.col("c1") * F.col("x1")
                + F.col("c2") * F.col("x2")
                > 0,
                1,
            ).otherwise(-1)
            == F.col("yy")
        ).alias("hit"),
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.round(F.first("c0"), 4).alias("beta0"),
        F.round(F.first("c1"), 4).alias("beta1"),
        F.round(F.first("c2"), 4).alias("beta2"),
        F.round(
            F.sum(F.when(F.col("hit"), 1).otherwise(0)) / F.count("*"), 4
        ).alias("train_acc"),
    )


_KM_K = 8
_KM_DIM = 64


def _km_round_sql(vin: str, cin: str, tag: str) -> str:
    """One Lloyd round as oracle CTE text: assignment (exact integer
    distances, ties to the lowest cid) + integer centroid update."""
    return f"""
    dist{tag} AS (
      SELECT v.vec_id, c.cid,
             list_sum(list_transform(generate_series(1, {_KM_DIM}),
               i -> (v.xq[i] - c.c[i]) * (v.xq[i] - c.c[i]))) AS dist
      FROM {vin} v, {cin} c
    ), assign{tag} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM dist{tag}
      ) WHERE rk = 1
    ), centd{tag} AS (
      SELECT a.cid, g.d,
             CAST(round(sum(v.xq[g.d])::DOUBLE / count(*)) AS BIGINT) AS cd
      FROM assign{tag} a JOIN v ON v.vec_id = a.vec_id,
           UNNEST(generate_series(1, {_KM_DIM})) AS g(d)
      GROUP BY a.cid, g.d
    ), cent{tag} AS (
      SELECT cid, list(cd ORDER BY d) AS c FROM centd{tag} GROUP BY cid
    )"""


_KMEANS_ORACLE = f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding,
               e -> CAST(round(CAST(e AS DOUBLE) * {_Q}) AS BIGINT)) AS xq
      FROM embeddings
    ), seeds AS (
      SELECT vec_id, xq, row_number() OVER (ORDER BY vec_id) AS rk FROM v
    ), cent0 AS (
      SELECT rk - 1 AS cid, xq AS c FROM seeds WHERE rk <= {_KM_K}
    ), {_km_round_sql('v', 'cent0', '1')},
    {_km_round_sql('v', 'cent1', '2')}
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(sum(dist) / 1000000000000.0, 4) AS inertia,
           round(sqrt((sum(dist)::DOUBLE / count(*)) / 1000000000000.0), 4)
             AS rms_dist
    FROM assign2 GROUP BY cid ORDER BY cid
"""


@register("q226_kmeans_lloyd", oracle=_KMEANS_ORACLE)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-deterministic k-means: 2 Lloyd rounds, k=8, seeded by
    the 8 lowest vec_ids, over micro-unit-quantized embeddings.

    Why this is hash-verifiable when textbook k-means is not:
    quantizing each coordinate to BIGINT micro-units makes every
    squared distance an EXACT integer (|xq| <= 5e5, 64 dims =>
    sums < 2^53, exactly representable), assignment ties break to the
    lowest centroid id, and the centroid update round(sum/count) maps
    integer state to integer state - both engines march through
    IDENTICAL centroids, so even the cluster MEMBERSHIP matches, not
    just the summary.  The IVF trainer (similarity.py) is the
    rows-only production twin; this is its cross-engine calibration.

    100 TB shape: each round is one crossJoin against a broadcast
    8-row centroid table + a combinable (cid, dim) partial agg - the
    canonical distributed Lloyd's; rounds chain inside ONE plan (no
    driver round-trip, no collect)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding,"
            f" e -> CAST(round(CAST(e AS DOUBLE) * {_Q}) AS BIGINT))"
        ).alias("xq"),
    )
    wseed = Window.orderBy("vec_id")
    cents = (
        emb.withColumn("rk", F.row_number().over(wseed))
        .filter(F.col("rk") <= _KM_K)
        .select((F.col("rk") - 1).cast("bigint").alias("cid"), F.col("xq").alias("c"))
    )

    def lloyd_round(cents_df):
        dist = F.expr(
            "aggregate(zip_with(xq, c, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        assign = (
            emb.crossJoin(F.broadcast(cents_df))
            .select("vec_id", "xq", "cid", dist.alias("dist"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cid", "xq")).alias("s"))
            .select(
                "vec_id",
                F.col("s.cid").alias("cid"),
                F.col("s.dist").alias("dist"),
                F.col("s.xq").alias("xq"),
            )
        )
        centd = (
            assign.select("cid", F.posexplode("xq").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.round(F.sum("val") / F.count("*")).cast("bigint").alias("cd")
            )
        )
        new_cents = (
            centd.groupBy("cid")
            .agg(
                F.expr("transform(array_sort(collect_list(struct(pos, cd))),"
                       " s -> s.cd)").alias("c")
            )
        )
        return assign, new_cents

    _, cent1 = lloyd_round(cents)
    assign2, _ = lloyd_round(cent1)
    return (
        assign2.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.round(F.sum("dist") / 1_000_000_000_000.0, 4).alias("inertia"),
            F.round(
                F.sqrt(
                    (F.sum("dist").cast("double") / F.count("*"))
                    / 1_000_000_000_000.0
                ),
                4,
            ).alias("rms_dist"),
        )
        .orderBy("cluster_id")
    )


_NB_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ), train_tok AS (
      SELECT d.lang, t.tok
      FROM docs d, UNNEST(d.ws) AS t(tok)
      WHERE d.doc_id % 5 <> 0 AND t.tok <> ''
    ), vocab AS (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM train_tok
    ), lang_tot AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM train_tok GROUP BY lang
    ), w AS (
      SELECT tt.lang, tt.tok,
             CAST(round({_Q} * ln(
               (CAST(count(*) AS DOUBLE) + 1.0) / (lt.nl + vb.v)
             )) AS BIGINT) AS wu
      FROM train_tok tt, lang_tot lt, vocab vb
      WHERE lt.lang = tt.lang
      GROUP BY tt.lang, tt.tok, lt.nl, vb.v
    ), dflt AS (
      SELECT lt.lang,
             CAST(round({_Q} * ln(1.0 / (lt.nl + vb.v))) AS BIGINT) AS du
      FROM lang_tot lt, vocab vb
    ), prior AS (
      SELECT lang,
             CAST(round({_Q} * ln(
               CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM docs WHERE doc_id % 5 <> 0)
             )) AS BIGINT) AS pu
      FROM docs WHERE doc_id % 5 <> 0 GROUP BY lang
    ), test_tok AS (
      SELECT d.doc_id, d.lang AS actual, t.tok
      FROM docs d, UNNEST(d.ws) AS t(tok)
      WHERE d.doc_id % 5 = 0 AND t.tok <> ''
    ), scored AS (
      SELECT tt.doc_id, tt.actual, df.lang AS cand,
             CAST(p.pu + sum(coalesce(w.wu, df.du)) AS BIGINT) AS score
      FROM test_tok tt
      JOIN dflt df ON TRUE
      LEFT JOIN w ON w.lang = df.lang AND w.tok = tt.tok
      JOIN prior p ON p.lang = df.lang
      GROUP BY tt.doc_id, tt.actual, df.lang, p.pu
    ), pred AS (
      SELECT doc_id, actual, cand AS predicted FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, cand) AS rk
        FROM scored
      ) WHERE rk = 1
    )
    SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY actual, predicted
    ORDER BY actual, predicted
"""


@register("q228_naive_bayes_langid", oracle=_NB_ORACLE)
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier: TRAIN on the 80%
    of documents with doc_id%5!=0 (Laplace-smoothed per-language token
    log-probs + log priors), PREDICT the held-out 20%, and emit the
    confusion matrix - the generative twin of q225's discriminative
    trainer, and the trained upgrade of q46's fixed stopword langid.

    Every log-probability quantizes to micro-nats (BIGINT) at model-
    build time, so per-document scores are exact integer sums in ANY
    aggregation order; argmax ties break lexicographically.  Unseen
    test tokens take the per-language Laplace floor ln(1/(N_l+V)) via
    coalesce after a left join - the model is a (vocab x langs)
    weight TABLE, hash-joined to exploded test tokens (never
    broadcast-bound: at 100 TB the weight table shuffles like any
    dimension; candidate fan-out is exactly |langs|=5 per token)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("ws")
    )
    train_tok = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select("lang", F.explode("ws").alias("tok"))
        .filter(F.col("tok") != "")
        .localCheckpoint()
    )
    vocab = train_tok.agg(
        F.countDistinct("tok").cast("bigint").alias("v")
    )
    lang_tot = train_tok.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("nl")
    )
    w = (
        train_tok.groupBy("lang", "tok")
        .agg(F.count("*").cast("bigint").alias("c"))
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "tok",
            F.round(
                _Q
                * F.log(
                    (F.col("c").cast("double") + 1.0)
                    / (F.col("nl") + F.col("v"))
                )
            )
            .cast("bigint")
            .alias("wu"),
        )
    )
    dflt = (
        lang_tot.crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cand"),
            F.round(_Q * F.log(1.0 / (F.col("nl") + F.col("v"))))
            .cast("bigint")
            .alias("du"),
        )
    )
    train_docs = d.filter(F.col("doc_id") % 5 != 0)
    n_train = train_docs.agg(F.count("*").alias("nd"))
    prior = (
        train_docs.groupBy("lang")
        .agg(F.count("*").alias("c"))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col("lang").alias("cand"),
            F.round(_Q * F.log(F.col("c").cast("double") / F.col("nd")))
            .cast("bigint")
            .alias("pu"),
        )
    )
    test_tok = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.col("lang").alias("actual"), F.explode("ws").alias("tok"))
        .filter(F.col("tok") != "")
    )
    scored = (
        test_tok.crossJoin(F.broadcast(dflt))
        .join(
            w.select(
                F.col("lang").alias("cand"), "tok", "wu"
            ),
            ["cand", "tok"],
            "left",
        )
        .join(F.broadcast(prior), "cand")
        .groupBy("doc_id", "actual", "cand", "pu")
        .agg(F.sum(F.coalesce("wu", "du")).alias("s"))
        .select(
            "doc_id",
            "actual",
            "cand",
            (F.col("pu") + F.col("s")).cast("bigint").alias("score"),
        )
    )
    wrk = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    pred = (
        scored.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select("actual", F.col("cand").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("actual", "predicted")
    )
