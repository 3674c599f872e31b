"""Tick/timestamp conversion functions (SURVEY section 4.3).

The reference counts time in 62.5 MHz clock ticks end-to-end
(ticks_per_frame, readout windows, td lengths - e.g.
iceberg_daq_eth.json:210,255-256); the engine's discipline is ticks
stay ``LongType`` through every shuffle and materialize as timestamps
only at the edges.  These are the canonical edge conversions, provided
in both forms:

  Column API   :func:`ticks_to_ts` / :func:`ts_to_ticks` - pure
               Catalyst expressions (integer arithmetic, whole-stage
               codegen, no Python)
  SQL          :func:`register_sql_functions` registers the same
               expressions as declarative SQL UDFs (``CREATE
               TEMPORARY FUNCTION ... RETURN <expr>``) - Catalyst
               inlines the body into the calling plan (constant-folds
               literals, codegens columns), so SQL users pay zero UDF
               overhead.

62.5 ticks/us is handled as exact integer arithmetic (* 2 DIV 125 and
* 125 DIV 2) - no double rounding; ticks that are whole microseconds
round-trip exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

TICKS_PER_US_NUM = 125  # 62.5 ticks/us as the exact ratio 125/2
TICKS_PER_US_DEN = 2


def ticks_to_ts(ticks: Column) -> Column:
    """62.5 MHz tick count (LongType) -> TimestampType (us precision,
    truncating sub-us ticks).  floor(2t/125) is exact for any tick
    value below 2^52: the true quotient is always >= 1/125 away from
    the next integer, far beyond double rounding error."""
    return F.timestamp_micros(
        F.floor((ticks * TICKS_PER_US_DEN) / F.lit(TICKS_PER_US_NUM)).cast("long")
    )


def ts_to_ticks(ts: Column) -> Column:
    """TimestampType -> 62.5 MHz tick count (LongType)."""
    return F.floor(
        (F.unix_micros(ts) * TICKS_PER_US_NUM) / F.lit(TICKS_PER_US_DEN)
    ).cast("long")


def register_sql_functions(spark: SparkSession) -> None:
    """Make the conversions callable from SQL text.  Declarative SQL
    UDFs, not Python UDFs: Catalyst substitutes the RETURN expression
    into the plan, so ``SELECT ticks_to_ts(t) ...`` stays inside
    whole-stage codegen (asserted in tests/test_functions.py)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ticks_to_ts(t BIGINT) "
        "RETURNS TIMESTAMP "
        "RETURN timestamp_micros(CAST(t * 2 DIV 125 AS LONG))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ts_to_ticks(ts TIMESTAMP) "
        "RETURNS BIGINT "
        "RETURN unix_micros(ts) * 125 DIV 2"
    )


def register_text_sql_functions(spark: SparkSession) -> None:
    """The text battery for SQL users: the same expressions
    operators/text.py builds as Columns, registered as declarative SQL
    UDFs (Catalyst inlines the RETURN body - lambdas and all - into
    the calling plan; zero Python).  Column-API equivalence is
    asserted in tests/test_functions.py."""
    stop = "'the', 'a', 'of', 'and', 'to', 'in'"  # operators/text.STOPWORDS
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION stop_ratio(text STRING) "
        "RETURNS DOUBLE RETURN "
        f"size(filter(split(text, ' '), x -> x IN ({stop}))) "
        "/ greatest(size(split(text, ' ')), 1)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION langid(text STRING) "
        "RETURNS STRING RETURN "
        f"CASE WHEN size(filter(split(text, ' '), x -> x IN ({stop}))) "
        "/ greatest(size(split(text, ' ')), 1) >= 0.05 "
        "THEN 'en' ELSE 'unk' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION quality_score(text STRING) "
        "RETURNS DOUBLE RETURN round(least("
        "  0.2"
        f"  + 0.5 * (size(filter(split(text, ' '), x -> x IN ({stop})))"
        "           / greatest(size(split(text, ' ')), 1))"
        "  + 0.3 * least(size(split(text, ' ')) / 200.0, 1.0)"
        "  - 0.2 * (regexp_count(text, '[.!?,;]')"
        "           / greatest(length(text), 1)),"
        "  1.0), 3)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION flesch(text STRING) "
        "RETURNS DOUBLE RETURN round("
        "  CAST(206.835 AS DOUBLE)"
        "  - CAST(1.015 AS DOUBLE) * size(split(text, ' '))"
        "          / greatest(regexp_count(text, '[.!?]+'), 1)"
        "  - CAST(84.6 AS DOUBLE) * greatest(regexp_count(text, '[aeiou]+'), 1)"
        "         / size(split(text, ' ')), 2)"
    )
