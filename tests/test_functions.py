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


def test_text_sql_functions_match_column_api(spark, sf_dir):
    """The SQL-facade text functions must equal the Column builders
    row for row (same stopword list, same formulas), and stay
    declarative - no PythonUDF node in the plan."""
    from iceberg_daq_spark.functions import register_text_sql_functions
    from iceberg_daq_spark.operators import text as T
    from iceberg_daq_spark.tables import load

    register_text_sql_functions(spark)
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("docs_sqlfn")
    via_sql = spark.sql(
        "SELECT doc_id, round(stop_ratio(text), 4) AS sr, langid(text) AS lid, "
        "quality_score(text) AS q, flesch(text) AS fl FROM docs_sqlfn ORDER BY doc_id"
    ).collect()
    w = T.words(F.col("text"))
    via_col = (
        d.select(
            "doc_id",
            F.round(T.stopword_ratio(w), 4).alias("sr"),
            T.langid(w).alias("lid"),
            T.quality_score(F.col("text"), w).alias("q"),
            F.round(
                F.lit(206.835)
                - F.lit(1.015)
                * F.size(w)
                / F.greatest(F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1))
                - F.lit(84.6)
                * F.greatest(
                    F.regexp_count(F.col("text"), F.lit(r"[aeiou]+")), F.lit(1)
                )
                / F.size(w),
                2,
            ).alias("fl"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_col]
    plan = spark.sql(
        "SELECT quality_score(text) FROM docs_sqlfn"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_bench_regression_tripwire():
    """The per-query >2x tripwire fires on a real slowdown, skips
    noise-band priors (<50 ms), new queries, and improvements."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    prev = {"q_slow": 1.0, "q_noise": 0.01, "q_fast": 2.0, "q_same": 0.5}
    now = {"q_slow": 2.5, "q_noise": 0.4, "q_fast": 0.3, "q_same": 0.6, "q_new": 9.0}
    got = bench.find_regressions(prev, now)
    assert got == {"q_slow": [1.0, 2.5]}
