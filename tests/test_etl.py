"""The metadata ETL pipeline + the MERGE-table layer (SURVEY section
5.2 item 4 extended to the sink): multi-pass batching, rerun
idempotency, atomic versioned commits."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_daq_spark.etl import build_dropbox, metadata_etl, scan_dropbox
from iceberg_daq_spark.tablestore import MergeTable


@pytest.fixture(scope="module")
def dropbox(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("etl") / "dropbox")
    build_dropbox(spark, sf_dir, d)
    return d


def test_scan_manifest_matches_dropbox(spark, dropbox):
    """A7: the binaryFile manifest sees exactly the glob-matching files,
    with run/prefix parsed from the name like the reference's sed."""
    # a non-matching file must be ignored by the glob
    with open(os.path.join(dropbox, "not_a_data_file.txt"), "w") as f:
        f.write("x")
    m = scan_dropbox(spark, dropbox)
    names = {r["file_name"] for r in m.collect()}
    on_disk = {
        n for n in os.listdir(dropbox) if n.startswith("iceberghd_") and n.endswith(".hdf5")
    }
    assert names == on_disk and len(names) > 0
    bad = m.filter(
        F.col("run").isNull() | ~F.col("prefix").isin("iceberghd_raw", "iceberghd_tp")
    )
    assert bad.count() == 0


def test_age_predicate_excludes(spark, dropbox):
    """-mmin +MIN: a min-age of 10 minutes excludes the just-written
    files entirely (the manifest filter is real, not decorative)."""
    assert scan_dropbox(spark, dropbox, min_age_min=10).count() == 0


def test_etl_multi_pass_limit_and_idempotency(spark, dropbox, tmp_path):
    """A29 + A13 + A46: limit-16 batching drains in ceil(n/16) passes
    per prefix; a second run finds nothing to do (0 passes) and leaves
    the catalog byte-identical."""
    catalog = MergeTable(str(tmp_path / "catalog"), key_cols=("file_name",))
    n_files = scan_dropbox(spark, dropbox).count()
    per_prefix = (
        scan_dropbox(spark, dropbox).groupBy("prefix").count().collect()
    )
    expected_passes = max(-(-r["count"] // 16) for r in per_prefix)

    out, passes = metadata_etl(spark, dropbox, catalog, batch_limit=16)
    assert passes == expected_passes
    assert out.count() == n_files
    # pass_id audits the per-prefix name-desc batching
    first_pass = out.filter(F.col("pass_id") == 0).count()
    assert first_pass == sum(min(16, r["count"]) for r in per_prefix)

    before = sorted(map(tuple, out.collect()))
    out2, passes2 = metadata_etl(spark, dropbox, catalog, batch_limit=16)
    assert passes2 == 0
    assert sorted(map(tuple, out2.collect())) == before


def test_etl_with_partitioned_catalog(spark, sf_dir, tmp_path):
    """The real consumer composition: metadata_etl fast-appending into
    a catalog partitioned by data_tier must produce exactly the same
    rows as the unpartitioned catalog, with tier=... partition dirs on
    disk and per-pass append commits intact."""
    import os as _os

    d = str(tmp_path / "dropbox_part")
    build_dropbox(spark, sf_dir, d)
    flat = MergeTable(str(tmp_path / "cat_flat"), key_cols=("file_name",))
    part = MergeTable(
        str(tmp_path / "cat_part"), key_cols=("file_name",),
        partition_spec=("data_tier",),
    )
    out_flat, passes_flat = metadata_etl(spark, d, flat, batch_limit=16)
    out_part, passes_part = metadata_etl(spark, d, part, batch_limit=16)
    assert passes_part == passes_flat >= 1
    cols = sorted(out_flat.columns)
    rows = lambda df: sorted(map(tuple, df.select(*cols).collect()))  # noqa: E731
    assert rows(out_part) == rows(out_flat)
    # partitioned layout on disk for the first append dir
    d1 = _os.path.join(part.path, "d000001")
    tiers = sorted(e for e in _os.listdir(d1) if e.startswith("data_tier="))
    assert tiers == ["data_tier=raw", "data_tier=trigprim"]


def test_merge_table_upsert_semantics(spark, tmp_path):
    """MERGE INTO semantics on the parquet layer: matched keys update,
    unmatched insert, others persist; re-merging is a no-op; the
    version pointer advances atomically and old snapshots expire."""
    t = MergeTable(str(tmp_path / "t"), key_cols=("k",), keep_versions=2)
    assert t.read(spark) is None
    t.merge(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]))
    t.merge(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]))
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    v_before = t.current_version()
    t.merge(spark.createDataFrame([(3, "c")], ["k", "v"]))  # idempotent re-merge
    got2 = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got2 == got
    assert t.current_version() == v_before + 1  # new snapshot, same contents
    # expiry: only the last keep_versions manifests + data dirs remain
    manifests = [d for d in os.listdir(t.path) if d.endswith(".json")]
    data_dirs = [
        d for d in os.listdir(t.path)
        if d.startswith("d") and os.path.isdir(os.path.join(t.path, d))
    ]
    assert len(manifests) <= 2 and len(data_dirs) <= 2


def test_stream_sink_merge_idempotent(spark, tmp_path):
    """The streaming MERGE sink: replaying the same micro-batch data
    (fresh checkpoint, same rows) leaves the table contents unchanged -
    the exactly-once contract the reference gets from sidecar checks."""
    from iceberg_daq_spark.tablestore import run_stream_to_table

    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(src)
    t = MergeTable(str(tmp_path / "sink"), key_cols=("k",))
    for attempt in range(2):  # second run = full redelivery
        stream = spark.readStream.schema("k long, v long").parquet(src)
        run_stream_to_table(stream, t, str(tmp_path / f"ckpt{attempt}"))
    out = t.read(spark)
    assert out.count() == 100
    assert out.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(100))


def test_stream_sink_continuous_trigger_returns_live_query(spark, tmp_path):
    """Regression (review): with available_now=False the query is
    unbounded, so run_stream_to_table must hand the live handle back
    instead of awaitTermination()-blocking the caller forever; the
    caller drains and stops it."""
    import time

    from iceberg_daq_spark.tablestore import run_stream_to_table

    src = str(tmp_path / "src")
    spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).write.parquet(src)
    t = MergeTable(str(tmp_path / "sink"), key_cols=("k",))
    stream = spark.readStream.schema("k long, v long").parquet(src)
    q = run_stream_to_table(
        stream, t, str(tmp_path / "ckpt"), available_now=False
    )
    try:
        # returning at all IS the regression assertion; then prove the
        # handle is live and the sink fills
        assert q.isActive
        deadline = time.time() + 60
        while time.time() < deadline:
            if t.current_version() is not None and t.read(spark).count() == 10:
                break
            time.sleep(0.5)
        assert t.read(spark).count() == 10
    finally:
        q.stop()


def test_merge_table_time_travel_and_compaction(spark, tmp_path):
    """Snapshot reads (VERSION AS OF analog) within the retention
    window; compaction rewrites the layout without changing contents."""
    import glob as _glob

    t = MergeTable(str(tmp_path / "tt"), key_cols=("k",), keep_versions=3)
    t.merge(spark.createDataFrame([(1, "a")], ["k", "v"]))
    t.merge(spark.createDataFrame([(2, "b")], ["k", "v"]))
    assert t.read(spark, version=1).count() == 1  # time travel
    assert t.read(spark).count() == 2
    with pytest.raises(ValueError):
        t.read(spark, version=99)
    # many-snapshot sink -> compaction flattens files, keeps contents
    before = sorted(map(tuple, t.read(spark).collect()))
    v = t.compact(spark, target_files=1)
    files = _glob.glob(os.path.join(t.path, f"d{v:06d}", "*.parquet"))
    assert len(files) == 1
    assert sorted(map(tuple, t.read(spark).collect())) == before


def test_etl_fail_stop_on_bad_file(spark, sf_dir, tmp_path):
    """The reference's errors_were_encountered contract (:84,226): a
    file the extractor cannot read stops the loop with a warning;
    already-committed passes stand (snapshot catalog, nothing
    half-written), the bad batch is left for the next run."""
    import shutil
    import warnings

    d = str(tmp_path / "dropbox_bad")
    build_dropbox(spark, sf_dir, d)
    # corrupt pseudo-file that sorts LAST in the per-prefix desc order,
    # so the first pass commits clean files and a later pass hits it
    with open(os.path.join(d, "iceberghd_raw_run000001_0000.hdf5"), "wb") as f:
        f.write(b"not parquet at all")
    os.remove(os.path.join(d, "_built"))  # new file -> not the cached set
    catalog = MergeTable(str(tmp_path / "catalog_bad"), key_cols=("file_name",))
    n_clean_first = min(
        8, scan_dropbox(spark, d).filter(F.col("prefix") == "iceberghd_raw").count() - 1
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out, passes = metadata_etl(spark, d, catalog, batch_limit=8)
    assert any("failed" in str(w.message) for w in caught)
    assert passes >= 1  # the clean first pass committed
    assert out.count() >= n_clean_first
    assert out.filter(F.col("file_name") == "iceberghd_raw_run000001_0000.hdf5").count() == 0
    shutil.rmtree(d, ignore_errors=True)


def test_stream_sink_on_sorted_table(spark, tmp_path):
    """The streaming MERGE sink composes with a table sort order:
    every micro-batch merge clusters the snapshot, replay stays
    idempotent, and the resulting manifest stats support file
    skipping on the sink table."""
    from iceberg_daq_spark.tablestore import run_stream_to_table

    src = str(tmp_path / "ssrc")
    spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(4).write.parquet(src)
    t = MergeTable(
        str(tmp_path / "ssink"), key_cols=("k",), sort_order=("k",),
        keep_versions=3,
    )
    for attempt in range(2):  # second run = full redelivery
        stream = spark.readStream.schema("k long, v long").parquet(src)
        run_stream_to_table(stream, t, str(tmp_path / f"sckpt{attempt}"))
    out = t.read(spark)
    assert out.count() == 200
    m = t._load_manifest(t.current_version())
    assert m["sort_order"] == ["k"]
    # per-file stats recorded and disjoint (AQE may coalesce a tiny
    # micro-batch merge into one file - ranges still must not overlap)
    (dstats,) = [m["file_stats"][d] for d in m["data_dirs"]]
    ranges = sorted((cs["k"][0], cs["k"][1]) for cs in dstats.values())
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo
    narrow = t.read(spark, where="k BETWEEN 0 AND 5")
    assert narrow.count() == 6


def test_stream_wap_branch_publish(spark, tmp_path):
    """Streaming write-audit-publish: a stream lands on an audit
    branch (main readers see nothing mid-ingest), validation runs on
    the branch head, fast_forward publishes atomically."""
    from iceberg_daq_spark.tablestore import MergeTable, run_stream_to_table

    src = str(tmp_path / "wsrc")
    spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("v")
    ).write.parquet(src)
    t = MergeTable(str(tmp_path / "wsink"), key_cols=("k",), keep_versions=4)
    t.merge(spark.createDataFrame([(-1, -5)], ["k", "v"]))  # prior published state
    t.create_branch("ingest")
    b = t.for_branch("ingest")

    stream = spark.readStream.schema("k long, v long").parquet(src)
    run_stream_to_table(stream, b, str(tmp_path / "wckpt"))

    # audit: main still shows only the published row
    assert t.read(spark).count() == 1
    assert b.read(spark).count() == 51
    # validation on the branch passes -> publish
    assert b.read(spark).filter(F.col("v") % 5 != 0).count() == 0
    t.fast_forward("ingest")
    assert t.read(spark).count() == 51


def test_apply_changes_stream_cdc(spark, tmp_path):
    """CDC apply (APPLY CHANGES INTO analog): I/U upserts merge,
    D deletes commit as merge-on-read equality-delete files with no
    table scan, within-batch changes net to each key's LAST change by
    the sequence column, and redelivery is idempotent."""
    from pyspark.sql import functions as F

    from iceberg_daq_spark.tablestore import MergeTable, apply_changes_stream

    src = str(tmp_path / "cdc_src")
    changes = [
        # (k, v, op, seq)
        (1, "a1", "I", 1),
        (2, "b1", "I", 2),
        (3, "c1", "I", 3),
        (2, "b2", "U", 4),   # update wins over the insert (seq order)
        (3, None, "D", 5),   # insert then delete nets to delete
        (4, None, "D", 6),   # delete of a never-present key: no-op
        (1, "a2", "U", 7),
    ]
    spark.createDataFrame(
        changes, "k long, v string, op string, seq long"
    ).write.parquet(src)

    t = MergeTable(str(tmp_path / "cdc_sink"), key_cols=("k",))
    # seed so the delete has something to bite on redelivery paths
    t.merge(spark.createDataFrame([(3, "seed")], ["k", "v"]))

    for attempt in range(2):  # second pass = full redelivery
        stream = spark.readStream.schema(
            "k long, v string, op string, seq long"
        ).parquet(src)
        apply_changes_stream(
            stream, t, str(tmp_path / f"cdc_ckpt{attempt}"), seq_col="seq"
        )
        got = {r.k: r.v for r in t.read(spark).collect()}
        assert got == {1: "a2", 2: "b2"}, (attempt, got)

    # the delete went merge-on-read: a delete file exists in the
    # current manifest, the data plane was not rewritten by it
    m = t._load_manifest(t.current_version())
    assert any(e.get("kind", "equality") == "equality" for e in m["deletes"])
    # op/seq never reached the table schema
    assert set(t.read(spark).columns) == {"k", "v"}


def test_apply_changes_stream_null_op_raises(spark, tmp_path):
    """A NULL op row satisfies neither the upsert nor the delete
    filter and would silently vanish - the batch must fail loudly
    instead (quarantine-over-silent-drop posture)."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    from iceberg_daq_spark.tablestore import MergeTable, apply_changes_stream

    src = str(tmp_path / "cdc_null_src")
    spark.createDataFrame(
        [(1, "a", "I", 1), (2, "b", None, 2)],
        "k long, v string, op string, seq long",
    ).write.parquet(src)
    t = MergeTable(str(tmp_path / "cdc_null_sink"), key_cols=("k",))
    stream = spark.readStream.schema("k long, v string, op string, seq long").parquet(src)
    with pytest.raises((StreamingQueryException, ValueError), match="NULL 'op'"):
        apply_changes_stream(stream, t, str(tmp_path / "cdc_null_ckpt"), seq_col="seq")


def test_run_checks_empty_match_raises(spark):
    """checks that match none of the supplied tables must raise a
    usable error, not IndexError on reports[0]."""
    import pytest

    from iceberg_daq_spark.operators.checks import Check, run_checks

    df = spark.range(3)
    with pytest.raises(ValueError, match="no checks matched"):
        run_checks({"t": df}, [Check(table="other", name="c", unique_col="id")])
    with pytest.raises(ValueError, match="no checks matched"):
        run_checks({"t": df}, [])
