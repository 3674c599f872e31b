"""Import-gated HDF5 envelope reader (A4's real file format).

The reference's dropbox holds per-(run, prefix) HDF5 files
(``iceberghd_*_run??????_*.hdf5``, createMetadatafiles_iceberg_
dropbox.sh:37-40); this container ships no h5py, so the ETL runs on
parquet pseudo-files carrying the same metadata semantics (etl.py).
This module is the real-format path, mirroring how
``operators.multimodal.decode_external`` gates the real image codec:
with h5py installed, actual HDF5 event files decode through the same
distributed plumbing - a ``binaryFile`` scan whose payload bytes parse
inside ``mapInArrow`` (h5py reads from an in-memory BytesIO; no local
filesystem access on executors needed) - and without it the entry
point raises NotImplementedError instead of silently faking.

Expected layout per file (what the reference's dumper records per
event): an ``events`` group with ``event_id`` (int64) and ``ts_us``
(int64 epoch microseconds) datasets of equal length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_hdf5_events(spark: SparkSession, path: str, glob: str = "*.hdf5") -> DataFrame:
    """Distributed HDF5 decode: binaryFile scan -> per-batch h5py parse.

    Raises NotImplementedError when h5py is absent (this container);
    the parquet pseudo-file dropbox in etl.py is the documented
    substitute.  With h5py present the decode is real and runs
    executor-side over whole Arrow batches - one BytesIO-backed
    ``h5py.File`` per blob, columns appended vectorized."""
    try:
        import h5py  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "h5py is not installed in this environment; the ETL's parquet "
            "pseudo-file dropbox (etl.build_dropbox) is the documented "
            "substitute for the reference's HDF5 envelope"
        ) from exc

    def decode(batches):
        import io

        import h5py as _h5
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            names = rb.schema.names
            paths = rb.column(names.index("path")).to_pylist()
            blobs = rb.column(names.index("content"))
            out_file, out_id, out_ts = [], [], []
            for i in range(n):
                with _h5.File(io.BytesIO(blobs[i].as_py()), "r") as f:
                    ev = f["events"]
                    ids = np.asarray(ev["event_id"], dtype=np.int64)
                    ts_us = np.asarray(ev["ts_us"], dtype=np.int64)
                base = paths[i].rsplit("/", 1)[-1]
                out_file.extend([base] * len(ids))
                out_id.append(ids)
                out_ts.append(ts_us)
            ids = np.concatenate(out_id) if out_id else np.array([], dtype=np.int64)
            ts = np.concatenate(out_ts) if out_ts else np.array([], dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_file),
                    pa.array(ids, type=pa.int64()),
                    # tz-aware micros: Spark maps TimestampType to a
                    # tz-aware Arrow timestamp in the session timezone
                    # (UTC here); a naive batch type can mismatch the
                    # declared mapInArrow schema on a real cluster
                    pa.array(ts, type=pa.timestamp("us", tz="UTC")),
                ],
                names=["file_name", "event_id", "ts"],
            )

    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    return scan.mapInArrow(decode, EVENT_SCHEMA).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
