"""Q236: Markov removal-effect attribution.

q126/q167/q205 attribute conversions by position rules; this is the
model-based attribution the marketing-science literature actually
recommends: build the first-order Markov chain over channel journeys
(START -> channels -> CONV/NULL), compute the conversion probability
by the truncated Neumann iteration, then RE-COMPUTE it with each
channel removed (its outgoing row deleted, so mass entering it dies).
A channel's removal effect 1 - P(conv | removed)/P(conv) is its
causal-flavored credit; shares normalize over channels.

The engineering trick: all five scenarios (baseline + 4 removals)
run in ONE iteration chain - the transition matrix carries an `excl`
scenario column, so adding scenarios widens a metadata-sized table
instead of multiplying passes; the chain itself iterates on the
driver over the collected (scenarios x states) integer object
(bounded by schema cardinality, never rows).  Same determinism
discipline as q231: micro-unit quantization after every
matrix-vector product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_SCALE = 1_000_000
_TERMS = 8
_CHANNELS = ["click", "error", "signup", "view"]


def _iter_ctes() -> str:
    parts = []
    for k in range(1, _TERMS + 1):
        parts.append(f"""
    v{k} AS (
      SELECT s.excl, s.i,
             CAST(s.r_u + coalesce(round(sum(q.v * p.v) / {_SCALE}), 0)
                  AS BIGINT) AS v
      FROM sc s
      LEFT JOIN qe q ON q.excl = s.excl AND q.i = s.i
      LEFT JOIN v{k - 1} p ON p.excl = q.excl AND p.i = q.j
      GROUP BY s.excl, s.i, s.r_u
    )""")
    return ",".join(parts)


@register(
    "q236_markov_attribution",
    oracle=f"""
    WITH ord AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), prn AS (
      SELECT user_id, min(rn) AS prn FROM ord
      WHERE event_type = 'purchase' GROUP BY user_id
    ), kept AS (
      SELECT o.user_id, o.event_type, o.rn,
             p.prn, p.prn IS NOT NULL AS conv
      FROM ord o LEFT JOIN prn p ON p.user_id = o.user_id
      WHERE p.prn IS NULL OR o.rn < p.prn
    ), inner_e AS (
      SELECT event_type AS i,
             coalesce(
               lead(event_type) OVER (PARTITION BY user_id ORDER BY rn),
               CASE WHEN conv THEN 'CONV' ELSE 'NULL' END) AS j
      FROM kept
    ), start_e AS (
      SELECT 'START' AS i, event_type AS j FROM kept WHERE rn = 1
      UNION ALL
      SELECT 'START', 'CONV' FROM prn WHERE prn = 1
    ), counts AS (
      SELECT i, j, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT * FROM inner_e UNION ALL SELECT * FROM start_e)
      GROUP BY i, j
    ), rowtot AS (
      SELECT i, CAST(sum(c) AS BIGINT) AS tot FROM counts GROUP BY i
    ), trans AS (
      SELECT c.i, c.j,
             CAST(round({_SCALE} * CAST(c.c AS DOUBLE) / r.tot) AS BIGINT)
               AS v
      FROM counts c JOIN rowtot r ON r.i = c.i
    ), excl(excl) AS (
      VALUES ('none'), ('click'), ('error'), ('signup'), ('view')
    ), states AS (
      SELECT DISTINCT i FROM trans
    ), sc AS (
      -- per-scenario transient states with their direct-to-CONV mass
      SELECT e.excl, s.i,
             coalesce((SELECT t.v FROM trans t
                       WHERE t.i = s.i AND t.j = 'CONV'), 0) AS r_u
      FROM excl e JOIN states s ON s.i <> e.excl
    ), qe AS (
      SELECT e.excl, t.i, t.j, t.v
      FROM excl e JOIN trans t
        ON t.i <> e.excl AND t.j <> e.excl
       AND t.j NOT IN ('CONV', 'NULL')
    ), v0 AS (
      SELECT excl, i, CAST(r_u AS BIGINT) AS v FROM sc
    ), {_iter_ctes()},
    pconv AS (
      SELECT excl, v / {_SCALE}.0 AS p
      FROM v{_TERMS} WHERE i = 'START'
    ), eff AS (
      SELECT c.excl AS channel,
             round(c.p, 4) AS p_conv_without,
             round(1.0 - c.p / b.p, 6) AS removal_effect
      FROM pconv c JOIN pconv b ON b.excl = 'none'
      WHERE c.excl <> 'none'
    )
    SELECT channel, p_conv_without, removal_effect,
           round(removal_effect /
                 sum(removal_effect) OVER (), 4) AS attribution_share
    FROM eff ORDER BY channel
    """,
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution over user event journeys
    (events before each user's first purchase; journeys end in CONV
    or NULL).  Transition probabilities quantize to micro-units; the
    conversion probability from START is the {_TERMS}-term Neumann
    iteration v <- r + Q v (re-quantized each step); each channel's
    scenario deletes its outgoing row so mass entering it dies, and
    all scenarios iterate together keyed by (excl, state).

    100 TB shape: one window pass to per-user ordered journeys, one
    partial agg to the <=7x7 transition matrix; everything after -
    scenarios included - is a (scenarios x states) integer object
    bounded by schema cardinality that iterates on the driver.
    Shares divide by the window-sum over the 4 fixed channel rows
    (order-stable)."""
    e = load(spark, sf_dir, "events")
    word = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordd = e.select(
        "user_id", "event_type", F.row_number().over(word).alias("rn")
    )
    prn = (
        ordd.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    kept = (
        ordd.join(prn, "user_id", "left")
        .filter(F.col("prn").isNull() | (F.col("rn") < F.col("prn")))
        .select(
            "user_id",
            "event_type",
            "rn",
            F.col("prn").isNotNull().alias("conv"),
        )
    )
    wk = Window.partitionBy("user_id").orderBy("rn")
    inner_e = kept.select(
        F.col("event_type").alias("i"),
        F.coalesce(
            F.lead("event_type").over(wk),
            F.when(F.col("conv"), "CONV").otherwise("NULL"),
        ).alias("j"),
    )
    start_e = (
        kept.filter(F.col("rn") == 1)
        .select(F.lit("START").alias("i"), F.col("event_type").alias("j"))
        .unionByName(
            prn.filter(F.col("prn") == 1).select(
                F.lit("START").alias("i"), F.lit("CONV").alias("j")
            )
        )
    )
    counts = (
        inner_e.unionByName(start_e)
        .groupBy("i", "j")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    rowtot = counts.groupBy("i").agg(F.sum("c").cast("bigint").alias("tot"))
    trans = (
        counts.join(F.broadcast(rowtot), "i")
        .select(
            "i",
            "j",
            F.round(_SCALE * F.col("c").cast("double") / F.col("tot"))
            .cast("bigint")
            .alias("v"),
        )
        .localCheckpoint()
    )
    excl = spark.createDataFrame(
        [("none",)] + [(c,) for c in _CHANNELS], "excl string"
    )
    states = trans.select("i").distinct()
    rvec = trans.filter(F.col("j") == "CONV").select(
        "i", F.col("v").alias("r_u")
    )
    sc = (
        excl.crossJoin(F.broadcast(states))
        .filter(F.col("i") != F.col("excl"))
        .join(F.broadcast(rvec), "i", "left")
        .select("excl", "i", F.coalesce("r_u", F.lit(0)).alias("r_u"))
    )
    qe = (
        excl.crossJoin(
            F.broadcast(
                trans.filter(~F.col("j").isin("CONV", "NULL"))
            )
        )
        .filter((F.col("i") != F.col("excl")) & (F.col("j") != F.col("excl")))
        .select("excl", "i", "j", "v")
    )
    # The {_TERMS}-round iteration runs ON THE DRIVER over the collected
    # scenario tables: they are bounded by (scenarios x event-type
    # states) - schema cardinality, never rows - so at ANY data scale
    # this is a <=5x7 integer object, and iterating it as Spark joins
    # only buys ~24 stages of scheduler overhead (measured ~3 s of
    # q236's wall at sf0.1).  The distributed part ends at `trans`
    # (the one pass over events).  Integer arithmetic mirrors the
    # engine/oracle chain exactly: round(s/SCALE) on non-negative
    # bigint sums == (s + SCALE//2) // SCALE (sums stay < 2^53, so the
    # engines' double division is exact too).
    from collections import defaultdict

    r_u = {(r["excl"], r["i"]): r["r_u"] for r in sc.collect()}
    q_by = defaultdict(list)
    for r in qe.collect():
        q_by[(r["excl"], r["i"])].append((r["j"], r["v"]))
    v_cur = dict(r_u)
    for _ in range(_TERMS):
        nxt = {}
        for key, ru in r_u.items():
            s = 0
            hit = False
            for j, qv in q_by.get(key, ()):
                pv = v_cur.get((key[0], j))
                if pv is not None:
                    s += qv * pv
                    hit = True
            nxt[key] = ru + ((s + _SCALE // 2) // _SCALE if hit else 0)
        v_cur = nxt
    v = spark.createDataFrame(
        [(e, i, int(val)) for (e, i), val in sorted(v_cur.items())],
        "excl string, i string, v bigint",
    )
    pconv = v.filter(F.col("i") == "START").select(
        "excl", (F.col("v") / float(_SCALE)).alias("p")
    )
    base = pconv.filter(F.col("excl") == "none").select(
        F.col("p").alias("pb")
    )
    eff = (
        pconv.filter(F.col("excl") != "none")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("excl").alias("channel"),
            F.round(F.col("p"), 4).alias("p_conv_without"),
            F.round(1.0 - F.col("p") / F.col("pb"), 6).alias(
                "removal_effect"
            ),
        )
    )
    wall = Window.partitionBy()
    return eff.select(
        "channel",
        "p_conv_without",
        "removal_effect",
        F.round(
            F.col("removal_effect")
            / F.sum("removal_effect").over(wall),
            4,
        ).alias("attribution_share"),
    ).orderBy("channel")
