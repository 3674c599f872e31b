"""Q1-Q2: scan / projection / filter shapes (SURVEY section 2B).

Mirrors reference ops A11/A12 (predicate filters pushed into the scan,
`createMetadatafiles_iceberg_dropbox.sh:95`, `create_daq_config.sh:241-246`).
Both queries compile to a single parquet scan with PushedFilters and a
pruned ReadSchema - verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q01_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_quantity < 24 AND l_shipdate < TIMESTAMP '1995-09-15'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + project + filter; predicates push down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") < 24) & (F.col("l_shipdate") < F.lit("1995-09-15").cast("timestamp")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q02_pushdown_shapes",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus LIKE 'O%'
      AND o_custkey IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, BETWEEN, LIKE-prefix, and null predicates in one scan."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(1000, 50000)
            & F.col("o_orderstatus").startswith("O")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    )
