"""Text-source ingestion with corrupt-record quarantine.

A crawl/export feed (JSONL is the lingua franca of document corpora)
always contains some malformed lines; dropping them silently corrupts
accounting, failing the job on one bad line is worse.  The pipeline
answer is a QUARANTINE split: parse what parses, keep the raw bytes of
what doesn't in a side output with provenance.

Implemented over ``spark.read.text`` + ``from_json`` rather than the
DataFrameReader's PERMISSIVE mode: the explicit form needs no cache to
inspect the corrupt column (Spark's ``_corrupt_record`` cannot be
filtered without materializing first), keeps the raw line verbatim for
the quarantine sink, and is map-only - both outputs stream at scan
speed at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def split_jsonl(raw: DataFrame, schema: StructType) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from a ``value``-column line frame - batch OR
    streaming (the expressions are all map-only, so the same split
    serves ``spark.read.text`` and ``spark.readStream.text``): ``good``
    carries the parsed columns of every line that parses AND has at
    least one schema field present; ``quarantine`` carries (raw_line,
    input_file) for every line that does not.  Blank lines are dropped
    (not data, not corruption)."""
    raw = raw.filter(F.length(F.trim(F.col("value"))) > 0)
    parsed = raw.select(
        F.col("value").alias("raw_line"),
        F.from_json(F.col("value"), schema).alias("r"),
        F.input_file_name().alias("input_file"),
    )
    # from_json yields NULL for unparseable text and an all-null struct
    # for valid JSON matching none of the schema (e.g. a stray array) -
    # both belong in quarantine
    any_field = F.coalesce(
        *[F.col(f"r.{f.name}").isNotNull() for f in schema.fields], F.lit(False)
    )
    ok = F.col("r").isNotNull() & any_field
    good = parsed.filter(ok).select("r.*")
    quarantine = parsed.filter(~ok).select("raw_line", "input_file")
    return good, quarantine


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Batch entry point: :func:`split_jsonl` over ``spark.read.text``."""
    return split_jsonl(spark.read.text(path), schema)
