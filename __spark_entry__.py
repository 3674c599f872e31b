"""Driver contract for the spark-graft builder (PySpark target).

Thin projection of ``iceberg_daq_spark.registry`` - every query is
registered once there with its Spark implementation and (where
SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_daq_spark.registry import oracle_sqls, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY Q12) on sf0.001."""
    from iceberg_daq_spark.queries.aggregates import q12

    return q12(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return oracle_sqls()
