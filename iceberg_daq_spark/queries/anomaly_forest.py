"""Q241: random-cut grid ensemble - isolation-family outlier scoring.

q131 (MAD) and q129 (CUSUM) flag univariate outliers; this scores
MULTIVARIATE anomalies the isolation-forest way: an ensemble of
random axis-aligned cuts partitions the feature space into cells,
and a point's anomaly score is the occupancy SURPRISAL of the cells
it lands in - points isolated into sparse cells across many
independent grids are anomalous, with no distance metric and no
per-pair work.

Determinism: the "random" cuts are hash-derived constants baked at
build time (a 12-row (tree, level) dimension both engines read
verbatim), cut positions interpolate the exact global min/max, leaf
ids are integer bit packs, and per-tree surprisals quantize to
micro-nats before the cross-tree BIGINT sum.

100 TB shape: per-customer features are one combinable agg; the
ensemble is a 12-row broadcast cross join -> bit fold -> two
bounded-key shuffles ((tree, leaf) cells, then per-point sums).
Scoring is O(T x rows), never O(rows^2) - the property that makes
isolation-style detectors THE scale-out choice for anomaly work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_Q = 1_000_000
_T = 4  # trees
_D = 3  # cuts per tree -> 8 cells

# hash-derived cut schedule: (tree, level, feature index, cut fraction)
_CUTS = [
    (t, l, (t * 31 + l * 17) % 2, ((t * 7919 + l * 104729 + 12345) % 1000) / 1000.0)
    for t in range(_T)
    for l in range(_D)
]


def _cuts_values_sql() -> str:
    return ", ".join(f"({t}, {l}, {f}, {frac})" for t, l, f, frac in _CUTS)


@register(
    "q241_grid_outliers",
    oracle=f"""
    WITH feat AS (
      SELECT c.c_custkey AS k,
             c.c_acctbal AS f0,
             CAST(count(o.o_orderkey) AS DOUBLE) AS f1
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), rng AS (
      SELECT min(f0) AS lo0, max(f0) AS hi0,
             min(f1) AS lo1, max(f1) AS hi1,
             CAST(count(*) AS BIGINT) AS n
      FROM feat
    ), cuts(t, l, f, frac) AS (
      VALUES {_cuts_values_sql()}
    ), bits AS (
      SELECT feat.k, c.t,
             CASE WHEN (CASE WHEN c.f = 0 THEN feat.f0 ELSE feat.f1 END)
                  > (CASE WHEN c.f = 0
                          THEN r.lo0 + c.frac * (r.hi0 - r.lo0)
                          ELSE r.lo1 + c.frac * (r.hi1 - r.lo1) END)
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
               * (1 << c.l) AS bit
      FROM feat, cuts c, rng r
    ), leaves AS (
      SELECT k, t, CAST(sum(bit) AS BIGINT) AS leaf
      FROM bits GROUP BY k, t
    ), cells AS (
      SELECT t, leaf, CAST(count(*) AS BIGINT) AS occ
      FROM leaves GROUP BY t, leaf
    ), scored AS (
      SELECT lv.k,
             CAST(sum(CAST(round({_Q} * ln(r.n * 1.0 / ce.occ)) AS BIGINT))
                  AS BIGINT) AS score_u
      FROM leaves lv
      JOIN cells ce ON ce.t = lv.t AND ce.leaf = lv.leaf
      CROSS JOIN rng r
      GROUP BY lv.k
    )
    SELECT k AS c_custkey,
           round(score_u / ({_T} * {_Q}.0), 4) AS anomaly_score
    FROM scored
    ORDER BY score_u DESC, k LIMIT 20
    """,
)
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 anomalous customers by random-cut grid ensemble over
    (account balance, order count): {_T} hash-seeded grids of {_D}
    axis-aligned cuts each; a customer's score is the mean per-grid
    surprisal -ln(cell occupancy / N) of the cells it occupies.

    Every cut is a build-time constant interpolating the exact
    global min/max; leaf membership is integer bit packing; per-grid
    surprisals quantize to micro-nats so the ensemble sum is exact;
    the top-20 breaks ties by custkey."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    feat = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").cast("double").alias("f1"))
        .select(
            F.col("c_custkey").alias("k"),
            F.col("c_acctbal").alias("f0"),
            "f1",
        )
        .localCheckpoint()
    )
    rng = feat.agg(
        F.min("f0").alias("lo0"),
        F.max("f0").alias("hi0"),
        F.min("f1").alias("lo1"),
        F.max("f1").alias("hi1"),
        F.count("*").cast("bigint").alias("n"),
    )
    cuts = spark.createDataFrame(
        _CUTS, "t int, l int, f int, frac double"
    )
    fval = F.when(F.col("f") == 0, F.col("f0")).otherwise(F.col("f1"))
    cut = F.when(
        F.col("f") == 0,
        F.col("lo0") + F.col("frac") * (F.col("hi0") - F.col("lo0")),
    ).otherwise(
        F.col("lo1") + F.col("frac") * (F.col("hi1") - F.col("lo1"))
    )
    bits = (
        feat.crossJoin(F.broadcast(cuts))
        .crossJoin(F.broadcast(rng))
        .select(
            "k",
            "t",
            (
                F.when(fval > cut, 1).otherwise(0).cast("bigint")
                * F.expr("CAST(shiftleft(1, l) AS BIGINT)")
            ).alias("bit"),
        )
    )
    leaves = bits.groupBy("k", "t").agg(
        F.sum("bit").cast("bigint").alias("leaf")
    )
    cells = leaves.groupBy("t", "leaf").agg(
        F.count("*").cast("bigint").alias("occ")
    )
    scored = (
        leaves.join(F.broadcast(cells), ["t", "leaf"])
        .crossJoin(F.broadcast(rng.select("n")))
        .groupBy("k")
        .agg(
            F.sum(
                F.round(_Q * F.log(F.col("n") * 1.0 / F.col("occ")))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("score_u")
        )
    )
    return (
        scored.select(
            F.col("k").alias("c_custkey"),
            F.round(F.col("score_u") / (_T * float(_Q)), 4).alias(
                "anomaly_score"
            ),
            F.col("score_u").alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "c_custkey")
        .limit(20)
        .drop("_s")
    )
