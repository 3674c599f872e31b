"""The metadata ETL, end to end (A7 + A13 + A29 + A8/A46 in one
pipeline).

The reference's real query workload (createMetadatafiles_iceberg_
dropbox.sh) is a filesystem pipeline:

  :95   find dropbox -name 'iceberghd_*_run??????_*.hdf5'
            -mmin +MIN -mmin -MAX | sort -r          (A7: scan with
                                                      age/glob preds)
  :109  skip files whose .json sidecar exists        (A13: anti-join)
  :127  parse run number from the file name          (extract)
  :146  dump per-file values, aggregate event list   (A23/A30/A34-38)
  :144,215  write .tmp then mv (atomic emit)         (A8)
  :225  stop after 16 files, outer loop until none   (A29)
  :45   flock lockfile                               (A46)

Here the same pipeline runs Spark-first over a synthetic dropbox of
per-(run, prefix) pseudo-files materialized from the events table:

  scan      ``binaryFile`` manifest read with pathGlobFilter + age
            predicates - column pruning keeps file CONTENT unread
            (the manifest is (path, length, modificationTime) only)
  anti-join left-anti against the metadata catalog on file_name
  batch     rank files per prefix by name desc (the reference's
            ``sort -r`` within its prefix loop) and take the first
            ``batch_limit`` per prefix per pass
  extract   read ONLY the selected parquet files; run/prefix parsed
            from ``_metadata.file_path`` exactly like the reference's
            sed on the basename (:127-132)
  aggregate q31's metadata-doc aggregation per file
  emit      fast-append commit into a :class:`~iceberg_daq_spark.
            tablestore.MergeTable` (atomic versioned commit + flock;
            the anti-join makes every pass's keys new, so each commit
            writes only that pass's rows) - rerunning the pipeline
            adds zero rows

The driver loop iterates passes until the scan drains - bounded driver
work per pass (one manifest of <= 2*batch_limit file names), never row
data.  At 100 TB each pass is one bounded Spark job and the catalog
merge is an Iceberg ``MERGE INTO`` (tablestore.py documents the swap).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.tables import load
from iceberg_daq_spark.tablestore import MergeTable

# Run-number floor for "main" mode (run/run_iceberg_daq.sh:116).
RUN_FLOOR = 16091

# createMetadatafiles_iceberg_dropbox.sh:37-40
FILE_GLOB = "iceberghd_*_run??????_*.hdf5"
MIN_AGE_MIN = 0
MAX_AGE_MIN = 172800
BATCH_LIMIT = 16  # :225


def _with_run_prefix(events: DataFrame) -> DataFrame:
    """The synthetic file key: run = floor + user_id, 1-in-5 runs are
    trigger-primitive files (same mapping q31 uses)."""
    return events.withColumn("run", F.lit(RUN_FLOOR) + F.col("user_id")).withColumn(
        "prefix",
        F.when(F.col("user_id") % 5 == 0, "iceberghd_tp").otherwise("iceberghd_raw"),
    )


def build_dropbox(spark: SparkSession, sf_dir: str, dropbox_dir: str) -> None:
    """Materialize the synthetic dropbox: one parquet pseudo-file per
    (run, prefix) named like the reference's HDF5 files.  Cached across
    invocations (keyed on the events row count) - the dropbox plays the
    role of the external DAQ filesystem, not of query state.

    One distributed write (repartition by the file key so each group
    lands in a single task -> a single part file), then driver-side
    renames into the flat dropbox layout - renames are metadata ops,
    the row data never passes through the driver."""
    # cache fingerprint: per-file (name, size, mtime_ns) of the source
    # table, hashed - a regenerated events table invalidates the cached
    # dropbox without spending a Spark job on the check.  The name list
    # is part of the hash so a rewrite that preserves total size and
    # mtime (cp -p, archive restore, coarse-mtime filesystems) but
    # changes the part-file layout still invalidates; a byte-identical
    # mtime-preserving copy with the same layout is indistinguishable
    # by stat alone (documented caveat of any stat-based cache).
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        entries = sorted(
            (os.path.relpath(os.path.join(r, f), src), os.stat(os.path.join(r, f)))
            for r, _, fs in os.walk(src)
            for f in fs
        )
    else:
        entries = [(os.path.basename(src), os.stat(src))]
    digest = hashlib.sha256(
        "".join(f"{n}:{s.st_size}:{s.st_mtime_ns};" for n, s in entries).encode()
    ).hexdigest()[:32]
    fingerprint = f"{sf_dir}:{len(entries)}:{digest}"
    marker = os.path.join(dropbox_dir, "_built")
    try:
        with open(marker, encoding="ascii") as f:
            if f.read().strip() == fingerprint:
                return
    except FileNotFoundError:
        pass
    e = load(spark, sf_dir, "events")
    shutil.rmtree(dropbox_dir, ignore_errors=True)
    staging = dropbox_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    (
        _with_run_prefix(e)
        .select("event_id", "ts", "run", "prefix")
        .repartition("prefix", "run")
        .write.partitionBy("prefix", "run")
        .parquet(staging)
    )
    os.makedirs(dropbox_dir, exist_ok=True)
    for pref_entry in os.scandir(staging):
        if not pref_entry.name.startswith("prefix="):
            continue
        prefix = pref_entry.name.split("=", 1)[1]
        for run_entry in os.scandir(pref_entry.path):
            if not run_entry.name.startswith("run="):
                continue
            run = int(run_entry.name.split("=", 1)[1])
            parts = [
                p for p in os.listdir(run_entry.path) if p.endswith(".parquet")
            ]
            assert len(parts) == 1, (run_entry.path, parts)
            os.rename(
                os.path.join(run_entry.path, parts[0]),
                os.path.join(dropbox_dir, f"{prefix}_run{run:06d}_0000.hdf5"),
            )
    shutil.rmtree(staging, ignore_errors=True)
    with open(marker, "w", encoding="ascii") as f:
        f.write(fingerprint)


def scan_dropbox(
    spark: SparkSession,
    dropbox_dir: str,
    min_age_min: int = MIN_AGE_MIN,
    max_age_min: int = MAX_AGE_MIN,
) -> DataFrame:
    """A7: the manifest scan.  ``binaryFile`` with a pathGlobFilter is
    the find-with-name-pattern analog; the age predicates filter on
    modificationTime just like ``-mmin +MIN -mmin -MAX``.  Only
    (path, length, modificationTime) are selected, so the binary
    content column is pruned at the source and no file bytes are read."""
    m = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", FILE_GLOB)
        .load(dropbox_dir)
        .select("path", "length", "modificationTime")
    )
    now = F.current_timestamp()
    age_min = (F.unix_timestamp(now) - F.unix_timestamp("modificationTime")) / 60.0
    base = F.element_at(F.split("path", "/"), -1)
    return m.filter((age_min >= min_age_min) & (age_min < max_age_min)).select(
        base.alias("file_name"),
        F.regexp_extract(base, r"^(iceberghd_[a-z]+)_run", 1).alias("prefix"),
        F.regexp_extract(base, r"_run(\d{6})_", 1).cast("long").alias("run"),
        "path",
        "length",
    )


def _aggregate_metadata(files_events: DataFrame) -> DataFrame:
    """The metadata-doc aggregation (q31's shape) per pseudo-file:
    event list/count/bounds + start/end epoch seconds + tier from the
    filename prefix (createMetadatafiles...sh:179-208)."""
    # one distinct-set aggregate feeds count/first/last/list - a single
    # partial+final collect_set pass instead of the countDistinct
    # expand that would double the shuffled rows
    evs = F.sort_array(F.collect_set("event_id"))
    return (
        files_events.groupBy("file_name", "run", "prefix")
        .agg(
            evs.alias("_evs"),
            F.round(F.unix_millis(F.min("ts")) / 1000.0, 3).alias("start_time"),
            F.round(F.unix_millis(F.max("ts")) / 1000.0, 3).alias("end_time"),
        )
        .select(
            F.size("_evs").cast("long").alias("event_count"),
            F.element_at("_evs", 1).alias("first_event"),
            F.element_at("_evs", -1).alias("last_event"),
            F.array_join("_evs", ",").alias("event_list"),
            "*",
        )
        .select(
            "file_name",
            F.col("run").cast("long").alias("run"),
            (F.col("run") * 100000 + 1).cast("long").alias("subrun"),
            F.when(F.col("prefix").endswith("_tp"), "trigprim")
            .otherwise("raw")
            .alias("data_tier"),
            "event_count",
            "first_event",
            "last_event",
            "start_time",
            "end_time",
            "event_list",
        )
    )


def metadata_etl(
    spark: SparkSession,
    dropbox_dir: str,
    catalog: MergeTable,
    batch_limit: int = BATCH_LIMIT,
    max_passes: int = 10_000,
) -> tuple[DataFrame, int]:
    """Run the full A7+A13+A29 loop until the dropbox drains; returns
    (final catalog DataFrame, passes executed).

    Once per invocation: manifest scan -> left-anti join against the
    catalog (A13: "only do the work if the metadata file doesn't
    already exist", :109) -> per-prefix rank by file_name desc (the
    ``sort -r`` order, :95), persisted.  Pass *p* then claims the
    per-prefix rank slice (p*batch_limit, (p+1)*batch_limit] (:225) ->
    extract + aggregate ONLY the selected files -> fast-append commit
    with a pass_id audit column (the anti-join guarantees new keys, so
    each pass writes only its own rows; a MERGE would rewrite the
    whole catalog per pass).  For a dropbox that is static across the
    invocation this batches identically to re-ranking the remainder
    each pass (each successful pass removes exactly the top
    batch_limit per prefix), but the manifest listing, anti-join, and
    window run ONCE instead of passes+1 times - a file that lands in
    the dropbox mid-invocation is picked up by the next cron
    invocation, exactly like one arriving after the reference's
    ``find`` returns.  The only driver-side data is each pass's
    file-name manifest (<= 2*batch_limit rows)."""
    manifest = scan_dropbox(spark, dropbox_dir)
    existing = catalog.read(spark)
    if existing is not None:
        manifest = manifest.join(
            existing.select("file_name"), "file_name", "left_anti"
        )
    rk = Window.partitionBy("prefix").orderBy(F.desc("file_name"))
    ranked = (
        manifest.withColumn("_rk", F.row_number().over(rk))
        .select("file_name", "path", "_rk")
        .persist()
    )
    try:
        return _drain_ranked(spark, ranked, catalog, batch_limit, max_passes)
    finally:
        ranked.unpersist()


def _drain_ranked(
    spark: SparkSession,
    ranked: DataFrame,
    catalog: MergeTable,
    batch_limit: int,
    max_passes: int,
) -> tuple[DataFrame, int]:
    # The manifest of file names is collected in chunks of 32 passes'
    # worth at a time, then each pass claims its per-prefix rank slice
    # from the chunk - one collect job amortized over 32 passes
    # instead of one per pass.  _rk is a PER-PREFIX rank, so one
    # chunk collect returns up to chunk x n_prefixes rows: driver
    # memory is bounded by chunk x the (small, fixed) prefix count,
    # never by the dropbox size.  Chunk size is a multiple of
    # batch_limit, so a pass never straddles two chunks.
    chunk = 32 * batch_limit
    # explicit schema skips the footer-inference job; listing the
    # batch's explicit paths driver-side (threshold above the batch
    # size) skips the one-task-per-file discovery job; and because
    # a dropbox batch is many KB-scale files, bin-pack tens of them
    # per scan task (openCost 16k / split 512k) so task count
    # tracks the batch, not one-file-one-task.  The packing confs
    # are read at physical planning, so they stay set through each
    # pass's action (the append write) and are restored at the end.
    tuned = {
        "spark.sql.sources.parallelPartitionDiscovery.threshold": str(
            max(2 * batch_limit + 1, 32)
        ),
        "spark.sql.files.openCostInBytes": "16384",
        "spark.sql.files.maxPartitionBytes": "524288",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    n_passes = 0
    lo = 0
    failed = False
    try:
        while not failed and n_passes < max_passes:
            rows = (
                ranked.filter((F.col("_rk") > lo) & (F.col("_rk") <= lo + chunk))
                .select("path", "_rk")
                .collect()
            )
            if not rows:
                break
            by_pass: dict[int, list[str]] = {}
            for r in rows:
                by_pass.setdefault((r["_rk"] - 1) // batch_limit, []).append(r["path"])
            for p in sorted(by_pass):
                if n_passes >= max_passes:
                    break
                if not _run_pass(spark, by_pass[p], catalog, p):
                    failed = True
                    break
                n_passes += 1
            lo += chunk
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    out = catalog.read(spark)
    if out is None:
        raise ValueError(
            "metadata_etl committed nothing: empty dropbox or first pass failed"
        )
    return out, n_passes


def _run_pass(
    spark: SparkSession, paths: list[str], catalog: MergeTable, pass_id: int
) -> bool:
    """One A29 pass: extract + aggregate the claimed files, commit via
    fast-append (the upfront catalog anti-join guarantees the keys are
    new, so the commit writes ONLY this pass's rows - Iceberg's append
    snapshot - instead of rewriting the catalog every pass).  Returns
    False on failure (fail-stop; committed passes stand)."""
    base = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    reader = spark.read.schema("event_id long, ts timestamp").parquet(*paths)
    files_events = reader.select(
        "event_id",
        "ts",
        base.alias("file_name"),
        F.regexp_extract(base, r"^(iceberghd_[a-z]+)_run", 1).alias("prefix"),
        F.regexp_extract(base, r"_run(\d{6})_", 1).cast("long").alias("run"),
    )
    rows = _aggregate_metadata(files_events).withColumn("pass_id", F.lit(pass_id))
    try:
        catalog.append(rows.coalesce(1))
        return True
    except Exception as exc:  # noqa: BLE001 - fail-stop parity
        # the reference's errors_were_encountered flag (:84,226):
        # a file its dumper cannot read logs an ERROR and stops
        # the loop, leaving the remaining files for the next
        # cron pass.  Same here: already-committed passes stand
        # (the catalog is snapshot-consistent), nothing
        # half-written.
        import warnings

        warnings.warn(
            f"metadata_etl pass {pass_id} failed ({exc}); stopping "
            f"with the catalog as of the last committed pass",
            RuntimeWarning,
            stacklevel=2,
        )
        return False
