"""Q23-Q24: scalar / string / date / math / array / JSON batteries.

Reference parallels: A34 (run-number regex extraction,
createMetadatafiles_iceberg_dropbox.sh:127-131), A35 (ms->s time
conversion), A37 (conditional tier tag), A38 (JSON construction/parse),
A41 (hex/bit arithmetic, tlu/t-c-p-iceberg.sh:42-67).

Everything is a pure projection over built-in functions - whole-stage
codegen, zero shuffles (beyond the final orderBy for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q23_scalar_battery",
    oracle="""
    WITH base AS (
      SELECT event_id, ts, user_id, event_type, value, props,
             concat('file_run', lpad(CAST(event_id % 1000 AS VARCHAR), 6, '0'), '_x') AS payload
      FROM events
      WHERE event_id < 2000
    )
    SELECT event_id,
           payload,
           CAST(regexp_extract(payload, 'run(\\d+)_', 1) AS BIGINT) AS run_no,
           upper(event_type)                          AS type_upper,
           lower(substr(event_type, 1, 3))            AS type_pre,
           trim(concat(' ', event_type, ' '))         AS type_trim,
           concat_ws('-', event_type, CAST(user_id AS VARCHAR)) AS type_user,
           CASE WHEN event_type = 'error' THEN 'trigprim' ELSE 'raw' END AS tier,
           CAST(date_trunc('hour', ts) AS TIMESTAMP)  AS ts_hour,
           CAST(ts + INTERVAL 7 DAY AS TIMESTAMP)     AS ts_plus7d,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since,
           CAST(extract(hour FROM ts) AS BIGINT)      AS ts_h,
           CAST(floor(value) AS BIGINT)               AS v_floor,
           CAST(ceil(value) AS BIGINT)                AS v_ceil,
           round(abs(value - 20), 2)                  AS v_absdiff,
           round(CAST(pow(2, CAST(event_id % 10 AS DOUBLE)) AS DOUBLE), 2) AS v_pow,
           CAST(event_id % 7 AS BIGINT)               AS v_pmod,
           CAST(event_id & 255 AS BIGINT)             AS b_and,
           CAST(event_id | 4096 AS BIGINT)            AS b_or,
           CAST(xor(event_id, 255) AS BIGINT)         AS b_xor,
           CAST((event_id & 15) << 2 AS BIGINT)       AS b_shl,
           upper(to_hex(event_id))                    AS id_hex,
           CAST(props ->> '$.k' AS BIGINT)            AS json_k
    FROM base
    ORDER BY event_id
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math/bitwise/JSON scalar battery in one projection."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    payload = F.concat(
        F.lit("file_run"),
        F.lpad((F.col("event_id") % 1000).cast("string"), 6, "0"),
        F.lit("_x"),
    )
    return (
        e.withColumn("payload", payload)
        .select(
            "event_id",
            "payload",
            F.regexp_extract("payload", r"run(\d+)_", 1).cast("long").alias("run_no"),
            F.upper("event_type").alias("type_upper"),
            F.lower(F.substring("event_type", 1, 3)).alias("type_pre"),
            F.trim(F.concat(F.lit(" "), F.col("event_type"), F.lit(" "))).alias("type_trim"),
            F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias("type_user"),
            F.when(F.col("event_type") == "error", "trigprim").otherwise("raw").alias("tier"),
            F.date_trunc("hour", "ts").alias("ts_hour"),
            F.expr("ts + INTERVAL 7 DAY").alias("ts_plus7d"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("days_since"),
            F.hour("ts").cast("long").alias("ts_h"),
            F.floor("value").cast("long").alias("v_floor"),
            F.ceil("value").cast("long").alias("v_ceil"),
            F.round(F.abs(F.col("value") - 20), 2).alias("v_absdiff"),
            F.round(F.pow(F.lit(2), (F.col("event_id") % 10).cast("double")), 2).alias("v_pow"),
            F.pmod(F.col("event_id"), F.lit(7)).cast("long").alias("v_pmod"),
            F.col("event_id").bitwiseAND(255).cast("long").alias("b_and"),
            F.col("event_id").bitwiseOR(4096).cast("long").alias("b_or"),
            F.col("event_id").bitwiseXOR(255).cast("long").alias("b_xor"),
            F.shiftleft(F.col("event_id").bitwiseAND(15), 2).cast("long").alias("b_shl"),
            F.upper(F.hex("event_id")).alias("id_hex"),
            F.get_json_object("props", "$.k").cast("long").alias("json_k"),
        )
        .orderBy("event_id")
    )


@register(
    "q24_array_battery",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source,
             string_split(text, ' ') AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT)                          AS n_words,
           words[1]                                            AS first_word,
           CAST(list_contains(words, 'spark') AS BOOLEAN)      AS has_spark,
           array_to_string(words[1:5], ' ')                    AS head5,
           CAST(list_min(list_transform(words, w -> length(w))) AS BIGINT) AS min_word_len,
           CAST(list_max(list_transform(words, w -> length(w))) AS BIGINT) AS max_word_len,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS checksum_len,
           CAST(len(list_distinct(words)) AS BIGINT)           AS n_distinct_words,
           array_to_string(list_sort(list_distinct(words)), ',') AS vocab
    FROM base
    ORDER BY doc_id
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery: explode-free higher-order functions over the token
    array (A24's fold analog: the additive length checksum via
    ``aggregate``)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    lens = F.transform(words, lambda w: F.length(w))
    return (
        d.withColumn("words", words)
        .select(
            "doc_id",
            F.size("words").cast("long").alias("n_words"),
            F.element_at("words", 1).alias("first_word"),
            F.array_contains("words", "spark").alias("has_spark"),
            F.array_join(F.slice("words", 1, 5), " ").alias("head5"),
            F.array_min(lens).cast("long").alias("min_word_len"),
            F.array_max(lens).cast("long").alias("max_word_len"),
            F.aggregate(lens, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("checksum_len"),
            F.size(F.array_distinct("words")).cast("long").alias("n_distinct_words"),
            F.array_join(F.array_sort(F.array_distinct("words")), ",").alias("vocab"),
        )
        .orderBy("doc_id")
    )
