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


def test_hdf5_reader_gating(spark, tmp_path):
    """Without h5py the HDF5 envelope reader must raise (the parquet
    pseudo-file dropbox is the documented substitute), never silently
    fake-decode."""
    import importlib.util

    from iceberg_daq_spark import hdf5

    if importlib.util.find_spec("h5py") is None:
        with pytest.raises(NotImplementedError, match="h5py"):
            hdf5.read_hdf5_events(spark, str(tmp_path))


def test_hdf5_reader_roundtrip(spark, tmp_path):
    """With h5py installed, real HDF5 event files decode through the
    binaryFile + mapInArrow plumbing (skips in h5py-free containers)."""
    import numpy as np
    import pytest as _pytest

    h5py = _pytest.importorskip("h5py")

    from iceberg_daq_spark import hdf5

    truth = {}
    for run in (1, 2):
        name = f"iceberghd_raw_run{run:06d}_0000.hdf5"
        ids = np.arange(run * 10, run * 10 + 5, dtype=np.int64)
        ts = ids * 1_000_000 + 42
        with h5py.File(tmp_path / name, "w") as f:
            g = f.create_group("events")
            g.create_dataset("event_id", data=ids)
            g.create_dataset("ts_us", data=ts)
        truth[name] = set(ids.tolist())
    out = hdf5.read_hdf5_events(spark, str(tmp_path))
    got = {}
    for r in out.collect():
        got.setdefault(r["file_name"], set()).add(r["event_id"])
    assert got == truth


def test_jsonl_quarantine_split(spark, tmp_path):
    """Malformed JSONL lines land in quarantine with their raw bytes;
    parseable lines come back typed; blank lines are dropped; nothing
    is silently lost (good + quarantine == non-blank input)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from iceberg_daq_spark.sources import read_jsonl_quarantine

    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2, "text": "beta"}',
        "{not json at all",
        '{"wrong_fields": true}',
        "",
        '["an", "array"]',
        '{"doc_id": 3, "text": null}',  # partial but has a schema field
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, quar = read_jsonl_quarantine(spark, str(p), schema)
    g = sorted((r["doc_id"], r["text"]) for r in good.collect())
    assert g == [(1, "alpha"), (2, "beta"), (3, None)]
    q = sorted(r["raw_line"] for r in quar.collect())
    assert q == sorted(["{not json at all", '{"wrong_fields": true}', '["an", "array"]'])
    assert all(r["input_file"].endswith("docs.jsonl") for r in quar.collect())
