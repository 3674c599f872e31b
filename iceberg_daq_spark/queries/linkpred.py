"""Q227: link prediction on the customer-part bipartite graph.

Adamic-Adar is the classic common-neighbor score with a popularity
discount: a shared neighbor n contributes 1/ln(deg(n)), so two
customers sharing an OBSCURE part are far stronger evidence of a link
than two customers sharing a commodity one.  The same discount is
what makes the score 100 TB-safe: the pair fan-out per part is
customers(part)^2, and the valve that caps it (parts above
_AA_PART_MAX customers are excluded from pair generation) removes
exactly the parts whose per-pair contribution 1/ln(n) is smallest -
the df_max/q117 valve pattern, mirrored VERBATIM in the oracle so the
driver hash verifies the valved graph itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

# Parts held by more than this many customers are excluded from pair
# generation (their 1/ln(n) contribution is the smallest and their
# n^2 pair volume the largest).  Engages at sf0.01 (max occupancy
# ~40-60 customers/part) so the oracle verifies the valve, not just
# the happy path.
_AA_PART_MAX = 48
# micro-nat quantization of each shared part's 1/ln(n) contribution:
# the AA sum folds as exact BIGINTs, order-free on both engines
_AA_SCALE = 1_000_000


@register(
    "q227_adamic_adar",
    oracle=f"""
    WITH cp AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), pc AS (
      SELECT part, CAST(count(*) AS BIGINT) AS np FROM cp GROUP BY part
    ), live AS (
      SELECT part, np FROM pc WHERE np BETWEEN 2 AND {_AA_PART_MAX}
    ), contrib AS (
      SELECT part,
             CAST(round({_AA_SCALE} / ln(CAST(np AS DOUBLE))) AS BIGINT)
               AS w
      FROM live
    ), pairs AS (
      SELECT a.cust AS cust_a, b.cust AS cust_b,
             CAST(sum(c.w) AS BIGINT) AS aa_u,
             CAST(count(*) AS BIGINT) AS shared_parts
      FROM cp a
      JOIN cp b ON b.part = a.part AND b.cust > a.cust
      JOIN contrib c ON c.part = a.part
      GROUP BY cust_a, cust_b
    )
    SELECT cust_a, cust_b, shared_parts,
           round(aa_u / {_AA_SCALE}.0, 4) AS adamic_adar
    FROM pairs
    ORDER BY aa_u DESC, cust_a, cust_b
    LIMIT 20
    """,
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted customer-customer links by Adamic-Adar over
    shared parts: AA(a,b) = sum over shared parts of 1/ln(customers
    holding that part) - the "same household behind two accounts"
    entity-resolution read (q106 matches on NAME similarity; this
    matches on BEHAVIOR).

    Each qualifying part's contribution quantizes once to micro-nats
    (BIGINT), so the per-pair sum is order-free; degree-1 parts carry
    no pair and ln(1)=0 would divide by zero, so the valve floor is
    np >= 2.  100 TB shape: one distinct reduction to the incidence
    table, the pair join keyed on part with occupancy capped at
    {_AA_PART_MAX} (quadratic volume bounded per key, valve mirrored
    in the oracle), TakeOrdered top-20 on the exact integer score."""
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
        .localCheckpoint()
    )
    contrib = (
        cp.groupBy("part")
        .agg(F.count("*").cast("bigint").alias("np"))
        .filter((F.col("np") >= 2) & (F.col("np") <= _AA_PART_MAX))
        .select(
            "part",
            F.round(_AA_SCALE / F.log(F.col("np").cast("double")))
            .cast("bigint")
            .alias("w"),
        )
    )
    a = cp.select(F.col("cust").alias("cust_a"), "part")
    b = cp.select(F.col("cust").alias("cust_b"), "part")
    pairs = (
        a.join(F.broadcast(contrib), "part")
        .join(b, "part")
        .filter(F.col("cust_b") > F.col("cust_a"))
        .groupBy("cust_a", "cust_b")
        .agg(
            F.sum("w").cast("bigint").alias("aa_u"),
            F.count("*").cast("bigint").alias("shared_parts"),
        )
    )
    return (
        pairs.select(
            "cust_a",
            "cust_b",
            "shared_parts",
            F.round(F.col("aa_u") / float(_AA_SCALE), 4).alias("adamic_adar"),
            F.col("aa_u").alias("_k"),
        )
        .orderBy(F.col("_k").desc(), "cust_a", "cust_b")
        .limit(20)
        .drop("_k")
    )
