"""Source/sink format breadth: the engine's queries are format-agnostic
(everything flows through DataFrames), so any Spark-supported columnar/
text source round-trips losslessly.  Parquet is the native test format;
this proves ORC, JSON-lines, and CSV carry the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_daq_spark.tables import load

CANON = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_orders_roundtrip_format(spark, sf_dir, tmp_path, fmt):
    src = load(spark, sf_dir, "orders").select(*CANON)
    out = str(tmp_path / f"orders_{fmt}")
    w = src.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    w.save(out)
    r = spark.read.format(fmt)
    # text formats need the schema pinned (no parquet-style embedded types)
    if fmt in ("json", "csv"):
        r = r.schema(src.schema)
    if fmt == "csv":
        r = r.option("header", True)
    back = r.load(out)
    assert back.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_scan_pushes_down(spark, sf_dir, tmp_path):
    """Predicate pushdown is not parquet-specific: the ORC scan must
    carry PushedFilters too."""
    out = str(tmp_path / "orders_orc")
    load(spark, sf_dir, "orders").select(*CANON).write.format("orc").save(out)
    df = spark.read.format("orc").load(out).filter(F.col("o_totalprice") > 1000.0)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1].split("]")[0]
