"""Q231: absorbing-Markov-chain analysis of the event stream.

q186 counts raw transition frequencies; this query treats 'purchase'
as an ABSORBING state and computes, for every transient event type,
the expected number of steps a user takes before converting - the
fundamental-matrix read N = (I - Q)^-1 approximated by the truncated
Neumann series I + Q + Q^2 + ... + Q^8 (the truncation is part of
the declared semantics and identical in the oracle, so the hash
verifies the same 8-term series, not an engine's matrix inverse).

The 100 TB shape this demonstrates: ITERATIVE LINEAR ALGEBRA WITH
METADATA-SIZED STATE.  One full-data pass reduces the stream to the
|types|^2 transition matrix; the 8 chained multiplies then run on the
driver over that <=16x16 integer object (bounded by schema
cardinality, never rows - iterating it as Spark joins would only buy
deep-plan scheduler overhead at any corpus size).  Each matrix
product re-quantizes entries to micro-units (round after multiply),
so both engines iterate through IDENTICAL integer matrices - float
drift cannot accumulate across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_SCALE = 1_000_000
_ABSORB = "purchase"
_TERMS = 8


def _neumann_ctes() -> str:
    """p1..p8 CTEs: p{k+1}(i,j) = round(sum_t p{k}(i,t)*q(t,j)/SCALE),
    acc{k} accumulates the series sum."""
    parts = []
    for k in range(2, _TERMS + 1):
        parts.append(f"""
    p{k} AS (
      SELECT a.i, b.j,
             CAST(round(sum(CAST(a.v AS DOUBLE) * b.v) / {_SCALE})
                  AS BIGINT) AS v
      FROM p{k - 1} a JOIN q b ON b.i = a.j
      GROUP BY a.i, b.j
    )""")
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT i, j, v FROM p{k}" for k in range(1, _TERMS + 1)
    )
    return ",".join(parts) + f""",
    series AS (
      SELECT i, j, CAST(sum(v) AS BIGINT) AS n_u FROM (
        SELECT i, j, v FROM ident
        UNION ALL
        {unions}
      ) GROUP BY i, j
    )"""


@register(
    "q231_absorbing_markov",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ), counts AS (
      SELECT cur AS i, nxt AS j, CAST(count(*) AS BIGINT) AS c
      FROM seq
      WHERE nxt IS NOT NULL AND cur <> '{_ABSORB}'
      GROUP BY i, j
    ), rowtot AS (
      SELECT i, CAST(sum(c) AS BIGINT) AS tot FROM counts GROUP BY i
    ), q AS (
      -- transient-to-transient block, micro-unit quantized
      SELECT c.i, c.j,
             CAST(round({_SCALE} * CAST(c.c AS DOUBLE) / r.tot) AS BIGINT)
               AS v
      FROM counts c JOIN rowtot r ON r.i = c.i
      WHERE c.j <> '{_ABSORB}'
    ), ident AS (
      SELECT DISTINCT i, i AS j, CAST({_SCALE} AS BIGINT) AS v FROM q
    ), p1 AS (
      SELECT i, j, v FROM q
    ), {_neumann_ctes()}
    SELECT i AS event_type,
           round(sum(n_u) / {_SCALE}.0, 4) AS expected_steps,
           CAST(count(*) AS BIGINT) AS n_reachable
    FROM series GROUP BY i ORDER BY i
    """,
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps before a 'purchase' conversion, per starting
    event type, via the 8-term Neumann series of the transient
    transition block (row sums of N = sum_k Q^k approximate the
    fundamental matrix's expected-visit counts).

    One window pass builds per-user consecutive transitions; the
    transition matrix quantizes to micro-units and every one of the 8
    chained matrix products re-rounds, so the series is an exact
    integer object on both engines.  All post-reduction state is
    <= 16x16 and iterates on the driver."""
    e = load(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type", 1).over(wseq).alias("nxt"),
    )
    counts = (
        seq.filter(F.col("nxt").isNotNull() & (F.col("cur") != _ABSORB))
        .groupBy(F.col("cur").alias("i"), F.col("nxt").alias("j"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    rowtot = counts.groupBy("i").agg(F.sum("c").cast("bigint").alias("tot"))
    q = (
        counts.join(F.broadcast(rowtot), "i")
        .filter(F.col("j") != _ABSORB)
        .select(
            "i",
            "j",
            F.round(_SCALE * F.col("c").cast("double") / F.col("tot"))
            .cast("bigint")
            .alias("v"),
        )
        .localCheckpoint()
    )
    # The 8 chained matrix powers run ON THE DRIVER over the collected
    # transient block: it is bounded by |event types|^2 - schema
    # cardinality, never rows - so at ANY data scale this is a <=16x16
    # integer object, and chaining it as Spark join-aggs only buys
    # deep-plan scheduler overhead.  The distributed part ends at `q`
    # (the one window+agg pass over events).  The dict product mirrors
    # the join-agg EXACTLY, including zero-valued structural entries
    # (a group exists iff some a.j == b.i match fired) - those rows
    # count toward n_reachable; round(s/SCALE) on the non-negative
    # bigint sum == (s + SCALE//2) // SCALE (sums < 2^53, so the
    # engines' double division is exact too).
    from collections import defaultdict

    p1 = {(r["i"], r["j"]): r["v"] for r in q.collect()}
    q_by_i = defaultdict(list)
    for (i, j), v in p1.items():
        q_by_i[i].append((j, v))
    series_rows = [
        (i, i, _SCALE) for i in sorted({i for i, _ in p1})
    ]  # ident
    cur = p1
    for term in range(1, _TERMS + 1):
        if term > 1:
            acc: dict = defaultdict(int)
            for (ai, aj), av in cur.items():
                for bj, bv in q_by_i.get(aj, ()):
                    acc[(ai, bj)] += av * bv
            cur = {
                k: (s + _SCALE // 2) // _SCALE for k, s in acc.items()
            }
        series_rows.extend(
            (i, j, int(v)) for (i, j), v in sorted(cur.items())
        )
    series = spark.createDataFrame(
        series_rows, "i string, j string, v bigint"
    )
    return (
        series.groupBy(F.col("i").alias("event_type"))
        .agg(
            F.round(F.sum("v") / float(_SCALE), 4).alias("expected_steps"),
            F.countDistinct("j").cast("bigint").alias("n_reachable"),
        )
        .orderBy("event_type")
    )
