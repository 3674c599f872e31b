"""Detector-readout-map (dromap) compiler as DataFrame transforms.

The reference's config compiler (config/create_daq_config.sh) treats the
per-WIB dromap JSON files as little tables: it unions selected files
(`jq -s 'add'`, :188), filters wibserver rows by id (:241-246),
validates uniqueness (:156-161), and regex-rewrites IPs for the NERSC
variant (:190-200).  Here the dromap is a proper dimension table and
those operations are union / filter / assert / withColumn.

Layout per config/base/dromaps/iceberg_dromap_wib_102.json: 8 streams
per WIB - stream_id {0,1,2,3} on one tx endpoint and {64,65,66,67} on a
second (json:8,96,109); src_id dense per WIB block (SURVEY section 1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIBS = (101, 102, 103, 104, 105, 106)
STREAM_IDS = (0, 1, 2, 3, 64, 65, 66, 67)
# src_id block base per WIB (wib101 -> 0-7 ... wib106 -> 40-47)
SRC_BASE = {101: 0, 102: 8, 103: 16, 104: 24, 105: 32, 106: 40}
SLOT = {101: 2, 102: 1, 103: 2, 104: 3, 105: 4, 106: 5}
DET_ID = 3
CRATE_ID = 8
RX_HOST = "iceberg03"
RX_IP = "10.73.139.23"

DROMAP_SCHEMA = T.StructType(
    [
        T.StructField("src_id", T.IntegerType(), False),
        T.StructField("wib_id", T.IntegerType(), False),
        T.StructField("det_id", T.IntegerType(), False),
        T.StructField("crate_id", T.IntegerType(), False),
        T.StructField("slot_id", T.IntegerType(), False),
        T.StructField("stream_id", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("protocol", T.StringType(), False),
        T.StructField("mode", T.StringType(), False),
        T.StructField("rx_host", T.StringType(), False),
        T.StructField("rx_ip", T.StringType(), False),
        T.StructField("tx_ip", T.StringType(), False),
    ]
)


def dromap_rows(wib: int) -> list[tuple]:
    """The 8 stream descriptors of one WIB (deterministic constants)."""
    rows = []
    for i, sid in enumerate(STREAM_IDS):
        tx_ip = f"10.73.139.{wib}" if sid < 64 else f"10.73.140.{wib}"
        rows.append(
            (
                SRC_BASE[wib] + i,
                wib,
                DET_ID,
                CRATE_ID,
                SLOT[wib],
                sid,
                "eth",
                "udp",
                "fix_rate",
                RX_HOST,
                RX_IP,
                tx_ip,
            )
        )
    return rows


def all_dromap_rows() -> list[tuple]:
    return [r for wib in WIBS for r in dromap_rows(wib)]


def dromap_df(spark: SparkSession, wibs: list[int] | None = None) -> DataFrame:
    """Per-WIB dromap tables unioned (A32, `jq -s 'add'`)."""
    wibs = list(wibs or WIBS)
    rows = [r for wib in wibs for r in dromap_rows(wib)]
    return spark.createDataFrame(rows, DROMAP_SCHEMA)


def validate_unique_wibs(wibs: list[int]) -> None:
    """A33: reject duplicate WIB ids (create_daq_config.sh:156-161)."""
    if len(wibs) != len(set(wibs)):
        raise ValueError(f"duplicate WIB ids in {wibs}")
    unknown = set(wibs) - set(WIBS)
    if unknown:
        raise ValueError(f"unknown WIB ids {sorted(unknown)}; valid: {WIBS}")


def compile_dromap(
    spark: SparkSession, wibs: list[int], isc_remap: bool = False
) -> DataFrame:
    """The dromap leg of the config compiler (create_daq_config.sh:178-200).

    union (A32) -> filter selected WIBs (A11) -> uniqueness validation
    (A33) -> optional NERSC/ISC IP remap (A40's sed rules as a typed
    withColumn, no regex surgery on serialized JSON).
    """
    validate_unique_wibs(wibs)
    df = dromap_df(spark).filter(F.col("wib_id").isin([int(w) for w in wibs]))
    if isc_remap:
        for col in ("rx_ip", "tx_ip"):
            df = df.withColumn(col, F.regexp_replace(col, r"^10\.73\.", "192.168."))
    return df


def dromap_values_sql() -> str:
    """The same static dromap as a DuckDB VALUES clause (oracle side)."""
    rows = ",\n      ".join(
        "({}, {}, {}, {}, {}, {}, '{}', '{}', '{}', '{}', '{}', '{}')".format(*r)
        for r in all_dromap_rows()
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows
        + ") AS t(src_id, wib_id, det_id, crate_id, slot_id, stream_id,"
        " kind, protocol, mode, rx_host, rx_ip, tx_ip)"
    )
