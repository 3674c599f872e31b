"""Tick/timestamp conversions (SURVEY section 4.3): Column API and SQL
UDF forms agree, round-trip exactly on whole-us ticks, and the SQL form
inlines into codegen (no python UDF node)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_daq_spark.functions import (
    register_sql_functions,
    ticks_to_ts,
    ts_to_ticks,
)

# whole-us tick values around the emulator epoch + odd sub-us stragglers
TICKS = [0, 125, 62_500, 106_250_000_000_000, 106_250_000_012_500, 63, 187]


def test_column_and_sql_forms_agree(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame([(t,) for t in TICKS], "t long")
    df.createOrReplaceTempView("tick_vals")
    col_rows = df.select(
        "t",
        ticks_to_ts(F.col("t")).alias("ts"),
        ts_to_ticks(ticks_to_ts(F.col("t"))).alias("back"),
    ).collect()
    sql_rows = spark.sql(
        "SELECT t, ticks_to_ts(t) AS ts, ts_to_ticks(ticks_to_ts(t)) AS back "
        "FROM tick_vals"
    ).collect()
    assert sorted(map(tuple, col_rows)) == sorted(map(tuple, sql_rows))
    for r in col_rows:
        if r["t"] % 125 == 0:  # whole-us ticks round-trip exactly
            assert r["back"] == r["t"], r
        else:  # sub-us ticks truncate down to the us boundary
            assert r["back"] <= r["t"] and r["t"] - r["back"] <= 62, r


def test_sql_form_stays_in_codegen(spark):
    """The SQL UDF must be inlined by Catalyst - the plan contains no
    python-eval node, and literal inputs constant-fold away."""
    register_sql_functions(spark)
    plan = spark.sql(
        "SELECT ticks_to_ts(id * 62500) AS ts FROM range(10)"
    )._sc._jvm.PythonSQLUtils.explainString(
        spark.sql("SELECT ticks_to_ts(id * 62500) AS ts FROM range(10)")
        ._jdf.queryExecution(),
        "formatted",
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # formatted explain marks codegen'd operators with a leading '*',
    # and the UDF body must appear inlined as the div expression
    assert "* Project" in plan and "div 125" in plan
