"""Streaming adler32 checksum + size fold (reference A24).

The reference computes per-file adler32 and byte size by folding 16 KiB
blocks through ``zlib.adler32`` (file_transfer_scripts/
insert_extra_fields.py:23-31).  Spark-side this is an Arrow-batched
pandas UDF: zlib's C implementation runs per batch inside the Python
worker; no JVM round-trips per row.  adler32 is associative over
concatenation only via zlib's combine, so each document/file is hashed
whole within its row - the 16 KiB chunking of the reference is an IO
detail, not a semantic one (same checksum either way, asserted in
tests/test_operators.py).
"""

from __future__ import annotations

import zlib
from functools import cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

CHUNK = 16 * 1024  # reference block size, insert_extra_fields.py:25


def adler32_py(content) -> int:
    """adler32 over bytes/str, folded in 16 KiB blocks exactly like the
    reference loop (insert_extra_fields.py:23-31)."""
    if content is None:
        return 1  # adler32 of empty input
    if isinstance(content, str):
        content = content.encode("utf-8")
    acc = 1
    for off in range(0, len(content), CHUNK):
        acc = zlib.adler32(content[off : off + CHUNK], acc)
    return acc & 0xFFFFFFFF


@cache
def adler32_udf():
    """Arrow-batched pandas UDF wrapping the fold (created lazily - the
    decorator needs an active SparkSession)."""

    def _adler32(data):
        return data.map(adler32_py)

    return pandas_udf(_adler32, T.LongType())


def with_checksum(df: DataFrame, content_col: str = "text") -> DataFrame:
    """Append checksums.adler32 + size columns (insert_extra_fields.py:35-36)."""
    return df.withColumn("adler32", adler32_udf()(F.col(content_col))).withColumn(
        "size_bytes", F.octet_length(F.col(content_col)).cast("long")
    )
