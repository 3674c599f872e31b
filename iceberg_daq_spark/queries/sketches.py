"""Q223-Q224: probabilistic-sketch battery - Count-Min and Bloom,
built from PURE INTEGER SQL so both engines compute bit-identical
structures.

q104/q160 cover the cardinality sketch (HLL); these cover the other
two workhorses of the 100 TB toolkit: frequency estimation under
fixed memory (Count-Min) and set-membership pre-filtering (Bloom).
Both sketches are MERGEABLE aggregates - the counter/bitmask tables
fold map-side and union across shards by (re-)aggregating, which is
the property that makes them work as streaming/rollup state.

Hash discipline: h_i(k) = ((a_i * (k mod p) + b_i) mod p) mod w with
p = 2^31 - 1 (Mersenne prime) and a_i, b_i < p, so every intermediate
product stays below 2^62 (ANSI-safe, no BIGINT overflow on either
engine) and the buckets are reproducible everywhere - no engine hash()
builtin anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_P = 2_147_483_647  # 2^31 - 1

# (row, a, b) for the d=4 Count-Min hash family - fixed odd multipliers
# (LCG-style constants), declared once and mirrored in the oracle SQL.
_CMS_FAMILY = [
    (0, 1_664_525, 1_013_904_223),
    (1, 22_695_477, 1),
    (2, 69_069, 362_437),
    (3, 1_103_515_245, 12_345),
]
_CMS_W = 256

_BLOOM_FAMILY = [(0, 1_664_525, 1_013_904_223), (1, 22_695_477, 1), (2, 69_069, 362_437)]
_BLOOM_BITS = 32 * 512  # 512 blocks x 32 bits


def _cms_family_sql() -> str:
    return ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, a, b in _CMS_FAMILY)


@register(
    "q223_countmin_heavy_hitters",
    oracle=f"""
    WITH fam(i, a, b) AS (VALUES {_cms_family_sql()}),
    ev AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT f.i, ((f.a * (e.user_id % {_P}) + f.b) % {_P}) % {_CMS_W}
               AS bucket,
             CAST(sum(e.n) AS BIGINT) AS cnt
      FROM ev e JOIN fam f ON TRUE
      GROUP BY f.i, bucket
    ), est AS (
      SELECT e.user_id, e.n AS exact_n,
             CAST(min(c.cnt) AS BIGINT) AS cms_n
      FROM ev e
      JOIN fam f ON TRUE
      JOIN cells c ON c.i = f.i
       AND c.bucket = ((f.a * (e.user_id % {_P}) + f.b) % {_P}) % {_CMS_W}
      GROUP BY e.user_id, e.n
    )
    SELECT user_id, cms_n, exact_n,
           CAST(cms_n - exact_n AS BIGINT) AS overcount
    FROM est
    ORDER BY cms_n DESC, user_id LIMIT 20
    """,
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters: estimate per-user event counts
    from a fixed 4x256 counter table and report the top-20 with their
    exact counts and the sketch's (always >= 0) overcount.

    Build: each pre-aggregated (user, n) cell posts n into one bucket
    per hash row - a groupBy over d x w = 1024 cells, combinable
    map-side, constant memory at ANY user cardinality (that is the
    point of the sketch: the counter table size never grows).  Probe:
    users re-hash and take the min across their d counters.  Top-20
    ties break by user_id so the ranking is engine-stable.  100 TB
    shape: one partial agg to user cells, one 1024-cell broadcast back
    at probe - the sketch itself would THE rollup state in a streaming
    ingest (mergeable by addition, like q104's HLL registers)."""
    fam = F.broadcast(
        spark.createDataFrame(
            [Row(i=i, a=a, b=b) for i, a, b in _CMS_FAMILY]
        )
    )
    ev = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    bucket = ((F.col("a") * (F.col("user_id") % _P) + F.col("b")) % _P) % _CMS_W
    cells = (
        ev.crossJoin(fam)
        .groupBy("i", bucket.alias("bucket"))
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )
    probe = ev.crossJoin(fam).select(
        "user_id", F.col("n").alias("exact_n"), "i", bucket.alias("bucket")
    )
    est = (
        probe.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").cast("bigint").alias("cms_n"))
    )
    return (
        est.select(
            "user_id",
            "cms_n",
            "exact_n",
            (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("cms_n").desc(), "user_id")
        .limit(20)
    )


@register(
    "q224_bloom_membership",
    oracle=f"""
    WITH fam(j, a, b) AS (
      VALUES {", ".join(f"({j}, {a}::BIGINT, {b}::BIGINT)" for j, a, b in _BLOOM_FAMILY)}
    ), members AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ), bits AS (
      SELECT (((f.a * (m.k % {_P}) + f.b) % {_P}) % {_BLOOM_BITS}) // 32
               AS block,
             CAST(bit_or(1::BIGINT <<
               ((((f.a * (m.k % {_P}) + f.b) % {_P}) % {_BLOOM_BITS}) % 32))
               AS BIGINT) AS mask
      FROM members m JOIN fam f ON TRUE
      GROUP BY block
    ), probe AS (
      SELECT c.c_custkey AS k,
             (((f.a * (c.c_custkey % {_P}) + f.b) % {_P}) % {_BLOOM_BITS})
               AS h
      FROM customer c JOIN fam f ON TRUE
    ), hits AS (
      SELECT p.k,
             CAST(count(*) FILTER (
               WHERE (b.mask & (1::BIGINT << (p.h % 32))) <> 0
             ) AS BIGINT) AS nbits
      FROM probe p LEFT JOIN bits b ON b.block = p.h // 32
      GROUP BY p.k
    ), verdict AS (
      SELECT h.k, h.nbits = {len(_BLOOM_FAMILY)} AS maybe,
             m.k IS NOT NULL AS actual
      FROM hits h LEFT JOIN members m ON m.k = h.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probed,
           CAST(count(*) FILTER (WHERE actual) AS BIGINT) AS n_members,
           CAST(count(*) FILTER (WHERE maybe) AS BIGINT) AS n_maybe,
           CAST(count(*) FILTER (WHERE maybe AND NOT actual) AS BIGINT)
             AS false_positives,
           CAST(count(*) FILTER (WHERE NOT maybe AND actual) AS BIGINT)
             AS false_negatives
    FROM verdict
    """,
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build a 16 Kbit / 3-hash Bloom
    filter over customers holding open orders, probe EVERY customer
    through it, and score the filter against exact membership
    (false_negatives is the structural-correctness probe - it must be
    0 for any Bloom filter; false_positives is the paid-for error).

    This is the join-pre-filter pattern: at 100 TB the 512-row bitmask
    table broadcasts to every scan task and discards non-members
    BEFORE the shuffle that a semi-join would need - the sketch stands
    in for Spark's runtime row-group bloom pushdown, but as an
    explicit, mergeable, cross-engine-reproducible table.  Bits pack
    32-per-block so no shift ever reaches the BIGINT sign bit (ANSI-
    safe on both engines); blocks fold via bit_or, which is why the
    filter merges across shards like any partial aggregate."""
    fam = F.broadcast(
        spark.createDataFrame(
            [Row(j=j, a=a, b=b) for j, a, b in _BLOOM_FAMILY]
        )
    )
    orders = load(spark, sf_dir, "orders")
    members = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    h = ((F.col("a") * (F.col("k") % _P) + F.col("b")) % _P) % _BLOOM_BITS
    bits = (
        members.crossJoin(fam)
        .select((h / 32).cast("bigint").alias("block"), (h % 32).alias("bit"))
        .groupBy("block")
        .agg(
            # shiftleft's amount must be a column here, so expr-form
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"))
            .cast("bigint")
            .alias("mask")
        )
    )
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    probe = cust.crossJoin(fam).select("k", h.alias("h"))
    hits = (
        probe.join(
            F.broadcast(bits),
            F.col("block") == (F.col("h") / 32).cast("bigint"),
            "left",
        )
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("mask").bitwiseAND(
                        F.expr(
                            "shiftleft(CAST(1 AS BIGINT),"
                            " CAST(pmod(h, 32) AS INT))"
                        )
                    )
                    != 0,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("nbits")
        )
    )
    verdict = hits.join(
        members.withColumnRenamed("k", "mk"),
        F.col("k") == F.col("mk"),
        "left",
    ).select(
        (F.col("nbits") == len(_BLOOM_FAMILY)).alias("maybe"),
        F.col("mk").isNotNull().alias("actual"),
    )
    return verdict.agg(
        F.count("*").cast("bigint").alias("n_probed"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_members"),
        F.sum(F.when(F.col("maybe"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_maybe"),
        F.sum(F.when(F.col("maybe") & ~F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("false_positives"),
        F.sum(F.when(~F.col("maybe") & F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("false_negatives"),
    )


@register("q249_quantile_sketch", oracle=None)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (deterministic MRL/KLL compaction)
    over lineitem extended prices: the deciles of a fact-table measure
    from FIXED-size per-partition summaries - the fourth sketch next
    to HLL (q104), count-min (q223), and Bloom (q224), and the only
    way a quantile survives 100 TB without a global sort (the exact
    twins are q74/q217 via the two-pass rank layout; this is the
    streaming/monitoring path: kilobytes of state, one scan).

    Rows-only for the driver (a sketch estimate has no SQL-exact
    oracle); tests/test_operators.py asserts the rank-error envelope
    vs DuckDB's exact quantiles (<=1% at sf0.01), merge associativity
    across different partitionings, and determinism across runs.  The
    plan shape: mapInPandas partial sketches (no raw-value shuffle),
    one bounded final-merge task (input rows = partition count), rows
    out."""
    from iceberg_daq_spark.operators.quantile_sketch import sketch_quantiles

    li = load(spark, sf_dir, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    return sketch_quantiles(li, "l_extendedprice", qs).orderBy("quantile")
