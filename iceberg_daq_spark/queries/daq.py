"""Q31-Q34: DAQ-domain pipelines re-expressed over the synthetic tables.

These mirror the reference's three real workloads (SURVEY section 3):
metadata ETL (Q31/Q32), the TP->TA trigger reduction (Q33), and the
dromap/config compiler (Q34).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.checksum import with_checksum
from iceberg_daq_spark.operators.dromap import compile_dromap, dromap_values_sql
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

# Run-number floor for "main" mode (run/run_iceberg_daq.sh:116).
RUN_FLOOR = 16091


@register(
    "q31_metadata_docs",
    oracle=f"""
    WITH named AS (
      SELECT *,
             {RUN_FLOOR} + user_id AS run,
             CASE WHEN user_id % 5 = 0 THEN 'iceberghd_tp' ELSE 'iceberghd_raw' END AS prefix
      FROM events
    )
    SELECT concat(prefix, '_run', lpad(CAST(run AS VARCHAR), 6, '0'), '_0000.hdf5') AS file_name,
           CAST(run AS BIGINT) AS run,
           CAST(run * 100000 + 1 AS BIGINT) AS subrun,
           CASE WHEN prefix LIKE '%_tp' THEN 'trigprim' ELSE 'raw' END AS data_tier,
           CAST(count(DISTINCT event_id) AS BIGINT) AS event_count,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(max(event_id) AS BIGINT) AS last_event,
           round(epoch_ms(min(ts)) / 1000.0, 3) AS start_time,
           round(epoch_ms(max(ts)) / 1000.0, 3) AS end_time,
           array_to_string(list_sort(list(DISTINCT event_id)), ',') AS event_list
    FROM named
    GROUP BY file_name, run, prefix
    ORDER BY run
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-catalog metadata pipeline (A23/A28/A30/A34-A37).

    Groups the event stream into per-run pseudo-files and produces the
    reference's metadata-doc fields (createMetadatafiles_iceberg_
    dropbox.sh:179-208): run number and subrun = run*100000+1 (:132),
    distinct sorted event list + count/min/max (:161-176), start/end
    times as epoch seconds from ms (:153-158), and the data-tier tag
    from the filename prefix (:184-188).
    """
    e = load(spark, sf_dir, "events")
    named = e.withColumn("run", F.lit(RUN_FLOOR) + F.col("user_id")).withColumn(
        "prefix",
        F.when(F.col("user_id") % 5 == 0, "iceberghd_tp").otherwise("iceberghd_raw"),
    )
    # one distinct-set aggregate feeds count/first/last/list (the
    # countDistinct form would add an expand that doubles the shuffled
    # rows; same rewrite as etl._aggregate_metadata)
    evs = F.sort_array(F.collect_set("event_id"))
    return (
        named.groupBy("run", "prefix")
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
            F.concat(
                F.col("prefix"),
                F.lit("_run"),
                F.lpad(F.col("run").cast("string"), 6, "0"),
                F.lit("_0000.hdf5"),
            ).alias("file_name"),
            F.col("run").cast("long").alias("run"),
            (F.col("run") * 100000 + 1).cast("long").alias("subrun"),
            F.when(F.col("prefix").endswith("_tp"), "trigprim").otherwise("raw").alias("data_tier"),
            "event_count",
            "first_event",
            "last_event",
            "start_time",
            "end_time",
            "event_list",
        )
        .orderBy("run")
    )


@register(
    "q37_metadata_etl_e2e",
    oracle=f"""
    WITH named AS (
      SELECT *,
             {RUN_FLOOR} + user_id AS run,
             CASE WHEN user_id % 5 = 0 THEN 'iceberghd_tp' ELSE 'iceberghd_raw' END AS prefix
      FROM events
    ), agg AS (
      SELECT concat(prefix, '_run', lpad(CAST(run AS VARCHAR), 6, '0'), '_0000.hdf5') AS file_name,
             run, prefix,
             CAST(count(DISTINCT event_id) AS BIGINT) AS event_count,
             CAST(min(event_id) AS BIGINT) AS first_event,
             CAST(max(event_id) AS BIGINT) AS last_event,
             round(epoch_ms(min(ts)) / 1000.0, 3) AS start_time,
             round(epoch_ms(max(ts)) / 1000.0, 3) AS end_time,
             array_to_string(list_sort(list(DISTINCT event_id)), ',') AS event_list
      FROM named
      GROUP BY file_name, run, prefix
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY prefix ORDER BY file_name DESC) AS rk
      FROM agg
    )
    SELECT file_name,
           CAST(run AS BIGINT) AS run,
           CAST(run * 100000 + 1 AS BIGINT) AS subrun,
           CASE WHEN prefix LIKE '%_tp' THEN 'trigprim' ELSE 'raw' END AS data_tier,
           event_count, first_event, last_event, start_time, end_time, event_list,
           CAST(floor((rk - 1) / 1024) AS INT) AS pass_id
    FROM ranked
    ORDER BY file_name
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata ETL end to end (A7+A13+A29+A8+A46 as ONE pipeline -
    the reference's actual production workload, createMetadatafiles_
    iceberg_dropbox.sh):

    synthetic dropbox of per-(run, prefix) parquet pseudo-files ->
    binaryFile manifest scan with glob + age predicates (:95) ->
    left-anti join against the metadata catalog (:109) -> per-prefix
    name-desc batches of <= batch_limit files per pass (:95 sort -r,
    :225 limit) -> per-file metadata aggregation (:146-208) ->
    MERGE-upsert into an atomically-versioned catalog table
    (tablestore.MergeTable; :144,215 tmp+mv, :45 flock) -> loop until
    the scan drains.

    batch_limit is 1024 here (the reference's 16 scaled to batch
    granularity; the pass_id column audits the batching, and the
    multi-pass loop + rerun idempotency are asserted at limit 16 in
    tests/test_etl.py).  The oracle reproduces the final catalog -
    including pass assignment - from the events table alone.
    """
    import tempfile

    from iceberg_daq_spark.etl import build_dropbox, metadata_etl
    from iceberg_daq_spark.tablestore import MergeTable

    scratch = os.path.join(tempfile.gettempdir(), "iceberg_daq_spark_etl")
    tag = sf_dir.strip("/").replace("/", "_")
    dropbox = os.path.join(scratch, f"dropbox_{tag}")
    build_dropbox(spark, sf_dir, dropbox)
    catalog = MergeTable(
        os.path.join(scratch, f"catalog_{tag}"), key_cols=("file_name",)
    )
    catalog.delete()  # fresh ETL per invocation; files persist after return
    out, _ = metadata_etl(spark, dropbox, catalog, batch_limit=1024)
    return out.orderBy("file_name")


@register(
    "q35_run_allocator",
    oracle=f"""
    WITH runs AS (
      SELECT DISTINCT {RUN_FLOOR} + user_id AS run FROM events
    ), cands AS (
      SELECT run + 1 AS cand FROM runs
      UNION
      SELECT {RUN_FLOOR} AS cand
    )
    SELECT CAST(min(cand) AS BIGINT) AS next_run,
           CAST(min(cand) * 100000 + 1 AS BIGINT) AS next_subrun
    FROM cands
    WHERE cand NOT IN (SELECT run FROM runs)
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-number allocator (A28, run_iceberg_daq.sh:111-131): probe
    upward from the mode floor to the first unused run number, derive
    subrun = run*100000+1 (createMetadatafiles...sh:132).

    The reference probes a log directory; here the candidate set is
    {{floor}} + {{run+1 per existing run}} anti-joined against the
    existing runs - one aggregation, no driver loop, and under Iceberg
    snapshot isolation the same plan is a race-free MERGE source."""
    e = load(spark, sf_dir, "events")
    runs = e.select((F.lit(RUN_FLOOR) + F.col("user_id")).alias("run")).distinct()
    cands = runs.select((F.col("run") + 1).alias("cand")).union(
        spark.range(1).select(F.lit(RUN_FLOOR).alias("cand"))
    ).distinct()
    free = cands.join(runs, cands.cand == runs.run, "left_anti")
    return free.agg(
        F.min("cand").cast("long").alias("next_run"),
        (F.min("cand") * 100000 + 1).cast("long").alias("next_subrun"),
    )


@register("q32_adler32_checksum", oracle=None)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """adler32 + size per document (A24, insert_extra_fields.py:23-31).

    No SQL oracle (DuckDB has no adler32); tests/test_operators.py
    asserts equality with python zlib directly.
    """
    d = load(spark, sf_dir, "documents")
    return (
        with_checksum(d, "text")
        .select("doc_id", "adler32", "size_bytes")
        .orderBy("doc_id")
    )


@register(
    "q33_tp_ta_reduction",
    oracle="""
    WITH tps AS (
      SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
             user_id AS channel,
             CAST(floor(value * 10) AS BIGINT) AS adc
      FROM events
      WHERE CAST(floor(value * 10) AS BIGINT) > 40
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_tps,
           CAST(count(DISTINCT channel) AS BIGINT) AS n_channels,
           CAST(sum(adc) AS BIGINT) AS sum_adc
    FROM tps
    GROUP BY window_start
    HAVING count(DISTINCT channel) >= 8 OR sum(adc) >= 3000
    ORDER BY window_start
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP -> TA reduction: threshold hit finding then windowed cluster
    formation (A14 + A26).

    Thresholds mirror the reference shapes: hit threshold 40 ADC
    (tpg_threshold_default, iceberg_daq_eth.json:195), TA emitted when
    enough distinct channels fire or the summed ADC crosses the
    activity threshold (adc_threshold / number_of_channels,
    iceberg_daq_eth.json:268,277).  Filter-before-window keeps the
    reduction map-side: only hits shuffle, not raw samples.
    """
    e = load(spark, sf_dir, "events")
    tps = (
        e.select(
            F.window("ts", "1 hour").alias("w"),
            F.col("user_id").alias("channel"),
            F.floor(F.col("value") * 10).cast("long").alias("adc"),
        )
        .filter(F.col("adc") > 40)
    )
    return (
        tps.groupBy("w")
        .agg(
            F.count("*").alias("n_tps"),
            F.countDistinct("channel").alias("n_channels"),
            F.sum("adc").alias("sum_adc"),
        )
        .filter((F.col("n_channels") >= 8) | (F.col("sum_adc") >= 3000))
        .select(F.col("w.start").alias("window_start"), "n_tps", "n_channels", "sum_adc")
        .orderBy("window_start")
    )


def _q36_oracle() -> str:
    from iceberg_daq_spark.operators.config import (
        COSMIC_RULES,
        PATCH_RULES,
        config_values_sql,
        rules_case_sql,
    )

    rules = dict(PATCH_RULES)
    rules.update(COSMIC_RULES)
    return f"""
    WITH base AS (
      {config_values_sql()}
    ), compiled AS (
      SELECT section, key,
             {rules_case_sql(rules)} AS value,
             value AS base_value
      FROM base
    )
    SELECT section, key, value, base_value, value <> base_value AS changed
    FROM compiled
    ORDER BY section, key
    """


@register("q36_config_rewrite", oracle=_q36_oracle(), doc="")
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config compiler for cosmic mode (A40/A18/A22): the reference's
    sed-rule rewrites (create_daq_config.sh:205-211,266-277 + the
    eth->cosmic 8-key diff) applied as typed CASE updates over a
    (section, key, value) config table, with change provenance."""
    from iceberg_daq_spark.operators.config import compile_config

    return compile_config(spark, mode="cosmic").orderBy("section", "key")


@register(
    "q34_dromap_compile",
    oracle=f"""
    WITH dromap AS (
      {dromap_values_sql()}
    )
    SELECT src_id, wib_id, det_id, crate_id, slot_id, stream_id,
           kind, protocol, mode, rx_host,
           regexp_replace(rx_ip, '^10\\.73\\.', '192.168.') AS rx_ip,
           regexp_replace(tx_ip, '^10\\.73\\.', '192.168.') AS tx_ip
    FROM dromap
    WHERE wib_id IN (102, 105, 106)
    ORDER BY src_id
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dromap compile: union per-WIB dromaps, filter the selected WIB
    set, validate uniqueness, apply the --isc IP remap
    (A11/A32/A33/A40, create_daq_config.sh:178-200,241-246)."""
    return compile_dromap(spark, [102, 105, 106], isc_remap=True).orderBy("src_id")


@register(
    "q68_metadata_json_docs",
    oracle=f"""
    WITH named AS (
      SELECT *,
             {RUN_FLOOR} + user_id AS run,
             CASE WHEN user_id % 5 = 0 THEN 'iceberghd_tp' ELSE 'iceberghd_raw' END AS prefix
      FROM events
    ), agg AS (
      SELECT concat(prefix, '_run', lpad(CAST(run AS VARCHAR), 6, '0'), '_0000.hdf5') AS file_name,
             run, prefix,
             count(DISTINCT event_id) AS event_count,
             min(event_id) AS first_event,
             max(event_id) AS last_event,
             array_to_string(list_sort(list(DISTINCT event_id)), ',') AS event_list
      FROM named
      GROUP BY file_name, run, prefix
    )
    SELECT file_name,
           concat(
             '{{"name": "', file_name, '", "namespace": "iceberg", "metadata": {{',
             '"core.data_tier": "',
             CASE WHEN prefix LIKE '%_tp' THEN 'trigprim' ELSE 'raw' END,
             '", "core.file_format": "hdf5", "core.file_type": "detector", ',
             '"core.event_count": ', CAST(event_count AS VARCHAR),
             ', "core.events": [', event_list, '], ',
             '"core.first_event_number": ', CAST(first_event AS VARCHAR),
             ', "core.last_event_number": ', CAST(last_event AS VARCHAR),
             ', "core.runs": [', CAST(run AS VARCHAR), '], ',
             '"core.runs_subruns": [', CAST(run * 100000 + 1 AS VARCHAR), ']}}}}'
           ) AS json_doc
    FROM agg
    ORDER BY file_name
    """,
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata JSON doc emission (A8/A38): the reference's actual
    OUTPUT artifact - one canonical JSON sidecar per data file
    (createMetadatafiles_iceberg_dropbox.sh:179-208, field names and
    nesting preserved).  Field order and formatting are deterministic
    by construction (explicit concat, not engine-dependent JSON
    serialization), so the docs hash-match across engines and reruns -
    the property the reference needs for its skip-if-exists check.
    Validity as JSON is asserted in tests/test_operators.py."""
    e = load(spark, sf_dir, "events")
    named = e.withColumn("run", F.lit(RUN_FLOOR) + F.col("user_id")).withColumn(
        "prefix",
        F.when(F.col("user_id") % 5 == 0, "iceberghd_tp").otherwise("iceberghd_raw"),
    )
    agg = (
        named.groupBy("run", "prefix")
        .agg(
            F.countDistinct("event_id").alias("event_count"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.array_join(F.sort_array(F.collect_set("event_id")), ",").alias("event_list"),
        )
        .withColumn(
            "file_name",
            F.concat(
                F.col("prefix"),
                F.lit("_run"),
                F.lpad(F.col("run").cast("string"), 6, "0"),
                F.lit("_0000.hdf5"),
            ),
        )
    )
    s = lambda c: F.col(c).cast("string")  # noqa: E731
    doc = F.concat(
        F.lit('{"name": "'), F.col("file_name"),
        F.lit('", "namespace": "iceberg", "metadata": {'),
        F.lit('"core.data_tier": "'),
        F.when(F.col("prefix").endswith("_tp"), "trigprim").otherwise("raw"),
        F.lit('", "core.file_format": "hdf5", "core.file_type": "detector", '),
        F.lit('"core.event_count": '), s("event_count"),
        F.lit(', "core.events": ['), F.col("event_list"), F.lit("], "),
        F.lit('"core.first_event_number": '), s("first_event"),
        F.lit(', "core.last_event_number": '), s("last_event"),
        F.lit(', "core.runs": ['), s("run"), F.lit("], "),
        F.lit('"core.runs_subruns": ['), (F.col("run") * 100000 + 1).cast("string"),
        F.lit("]}}"),
    )
    return agg.select("file_name", doc.alias("json_doc")).orderBy("file_name")


@register(
    "q102_data_quality_checks",
    oracle="""
    WITH rep AS (
      SELECT 'orders' AS table_name, 'orderkey_not_null' AS check_name,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
      FROM orders
      UNION ALL
      SELECT 'orders', 'orderkey_unique',
             CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders', 'orderstatus_domain',
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders', 'totalprice_range',
             CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 400000
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders', 'custkey_fk_customer',
             CAST((SELECT count(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
                  AS BIGINT)
      UNION ALL
      SELECT 'lineitem', 'quantity_range',
             CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'discount_cap',
             CAST(sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'linenumber_positive',
             CAST(sum(CASE WHEN l_linenumber <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
    )
    SELECT table_name, check_name, n_violations,
           CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM rep
    ORDER BY table_name, check_name
    """,
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the Deequ/expectations family;
    reference analog: pre-run config/metadata validation, A33/A40):
    null, domain, range, exact-uniqueness, and referential constraints
    over orders/lineitem, one report row per constraint.

    All row-level checks on a table fold into ONE conditional-agg scan
    (map-side combinable), uniqueness rides the same pass, the FK
    check is a broadcast anti-join - 8 constraints, 2 scans + 1
    anti-join at any scale.  The report is deliberately mixed: the
    range/discount caps FAIL on this data, proving the gate actually
    fires.  See operators/checks.py."""
    from iceberg_daq_spark.operators.checks import Check, run_checks

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    checks = [
        Check("orders", "orderkey_not_null", violation=F.col("o_orderkey").isNull()),
        Check("orders", "orderkey_unique", unique_col="o_orderkey"),
        Check(
            "orders",
            "orderstatus_domain",
            violation=~F.col("o_orderstatus").isin("O", "F", "P"),
        ),
        Check(
            "orders",
            "totalprice_range",
            violation=(F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 400000),
        ),
        Check("orders", "custkey_fk_customer", fk=(customer, "o_custkey", "c_custkey")),
        Check(
            "lineitem",
            "quantity_range",
            violation=(F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        Check("lineitem", "discount_cap", violation=F.col("l_discount") > 0.08),
        Check(
            "lineitem",
            "linenumber_positive",
            violation=F.col("l_linenumber") <= 0,
        ),
    ]
    return run_checks({"orders": orders, "lineitem": lineitem}, checks).orderBy(
        "table_name", "check_name"
    )


@register(
    "q247_hdf5_event_files",
    oracle=f"""
    SELECT concat('iceberghd_raw_run',
                  lpad(CAST({RUN_FLOOR} + user_id % 64 AS VARCHAR), 6, '0'),
                  '_0000.hdf5') AS file_name,
           CAST(count(*) AS BIGINT) AS event_count,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(max(event_id) AS BIGINT) AS last_event,
           round(epoch_ms(min(ts)) / 1000.0, 3) AS start_time,
           round(epoch_ms(max(ts)) / 1000.0, 3) AS end_time
    FROM events
    GROUP BY file_name
    ORDER BY file_name
    """,
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDF5 event-file pipeline end to end through the REAL bytes (A4
    envelope -> A7 scan -> A23 agg): encode the event stream into
    per-run ``iceberghd_*_run??????_*.hdf5`` files with the in-repo
    pure-numpy codec (chunked + deflate - the layout libhdf5 writes
    for detector data, createMetadatafiles_iceberg_dropbox.sh:37-40),
    then decode them back through the distributed ``binaryFile`` +
    ``mapInArrow`` reader and aggregate per-file catalog stats.  The
    oracle reproduces the stats from the events table alone, so the
    hash check verifies the encode -> bytes -> decode loop loses
    nothing.

    100 TB shape: the encode stage is one shuffle keyed on run
    (applyInPandas, 64 bounded groups here; real corpora shard by
    (run, subrun) so group size is the detector's per-file event
    budget), each task writing its own file - on a cluster the
    dropbox is shared storage, and no stage ever routes file CONTENT
    through the driver (the only collect is the 64-row manifest that
    barriers the write before the scan).  The decode side scans files
    in parallel (one binaryFile split each) and parses whole Arrow
    batches; per-file agg then shuffles only the 6-column stats."""
    import shutil
    import tempfile

    from iceberg_daq_spark.hdf5 import read_hdf5_events

    scratch = os.path.join(tempfile.gettempdir(), "iceberg_daq_spark_etl")
    tag = sf_dir.strip("/").replace("/", "_")
    dropbox = os.path.join(scratch, f"hdf5_dropbox_{tag}")
    shutil.rmtree(dropbox, ignore_errors=True)
    os.makedirs(dropbox, exist_ok=True)

    e = load(spark, sf_dir, "events").select(
        (F.lit(RUN_FLOOR) + F.pmod(F.col("user_id"), F.lit(64))).alias("run"),
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )

    def write_run(pdf):
        import numpy as np
        import pandas as pd

        from iceberg_daq_spark import minihdf5

        run = int(pdf["run"].iloc[0])
        order = np.argsort(pdf["event_id"].to_numpy(), kind="stable")
        ids = pdf["event_id"].to_numpy()[order].astype(np.int64)
        ts = pdf["ts_us"].to_numpy()[order].astype(np.int64)
        name = f"iceberghd_raw_run{run:06d}_0000.hdf5"
        minihdf5.write_hdf5(
            os.path.join(dropbox, name),
            {
                "events": {
                    "event_id": {"data": ids, "chunks": (256,), "gzip": 6},
                    "ts_us": {"data": ts, "chunks": (256,), "gzip": 6},
                }
            },
        )
        return pd.DataFrame({"file_name": [name], "n_rows": [len(ids)]})

    manifest = e.groupBy("run").applyInPandas(write_run, "file_name string, n_rows long")
    manifest.count()  # barrier: files exist before the binaryFile scan plans

    decoded = read_hdf5_events(spark, dropbox)
    return (
        decoded.groupBy("file_name")
        .agg(
            F.count("*").cast("bigint").alias("event_count"),
            F.min("event_id").cast("bigint").alias("first_event"),
            F.max("event_id").cast("bigint").alias("last_event"),
            F.round(F.unix_millis(F.min("ts")) / 1000.0, 3).alias("start_time"),
            F.round(F.unix_millis(F.max("ts")) / 1000.0, 3).alias("end_time"),
        )
        .orderBy("file_name")
    )
