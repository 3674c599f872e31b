"""Q21-Q22: global sort / limit / set operations (SURVEY section 2B).

Reference parallels: A31 (newest-first ordering), A32 (dromap union),
A33 (uniqueness validation).  orderBy+limit plans as
TakeOrderedAndProject (per-partition top-k + driver merge of k rows),
not a full global sort - the only scale-safe way to do top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q21_sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 with deterministic tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "q22_set_operations",
    oracle="""
    WITH a AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    ), b AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    SELECT 'both' AS tag, c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'only_1995_orders' AS tag, c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'only_high_balance' AS tag, c_custkey FROM (SELECT c_custkey FROM b EXCEPT SELECT c_custkey FROM a)
    ORDER BY tag, c_custkey
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT over two customer-key subsets.

    Mirrors A32/A33 (dromap union + uniqueness validation,
    create_daq_config.sh:178-188,156-161).
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    a = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    both = a.intersect(b).select(F.lit("both").alias("tag"), "c_custkey")
    only_a = a.subtract(b).select(F.lit("only_1995_orders").alias("tag"), "c_custkey")
    only_b = b.subtract(a).select(F.lit("only_high_balance").alias("tag"), "c_custkey")
    return both.unionAll(only_a).unionAll(only_b).orderBy("tag", "c_custkey")
