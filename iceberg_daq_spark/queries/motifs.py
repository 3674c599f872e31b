"""Q235: SAX motif discovery over the daily revenue series.

Symbolic Aggregate approXimation (Lin et al., DMKD'07) turns a
numeric series into a symbol string so subsequence patterns can be
counted with plain grouping: here each day maps to a quintile symbol
a-e by RANK (the equal-depth variant - deterministic on exact integer
cents with a day tie-break, unlike the Gaussian-breakpoint variant
whose mean/sd would be a float fold), and every 5-day sliding window
becomes a 5-symbol word.  The top recurring words are the series'
motifs - "what weekly shapes does revenue repeat".

100 TB scale: the series is calendar-bounded (~2400 cells) after one
partial agg, so discretization, the lead() windows, and the motif
count are all metadata-sized; the approach itself is the standard
scale trick - symbolize once, then pattern work is string grouping,
never numeric subsequence comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_W = 5  # motif length (days)


@register(
    "q235_sax_motifs",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY day
    ), sym AS (
      SELECT day,
             chr(CAST(96 + ntile(5) OVER (ORDER BY cents, day) AS INTEGER))
               AS s
      FROM daily
    ), words AS (
      SELECT day,
             s || lead(s, 1) OVER w || lead(s, 2) OVER w
               || lead(s, 3) OVER w || lead(s, 4) OVER w AS word,
             lead(day, {_W - 1}) OVER w AS d_end
      FROM sym WINDOW w AS (ORDER BY day)
    ), full_words AS (
      -- contiguous windows only: no day gaps, word fully materialized
      SELECT word FROM words
      WHERE word IS NOT NULL AND d_end = day + {_W - 1}
    )
    SELECT word AS motif, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM full_words GROUP BY word
    ORDER BY n_occurrences DESC, motif
    LIMIT 10
    """,
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 recurring 5-day revenue motifs: equal-depth SAX
    symbolization (quintile by exact-cents rank, day tie-break) +
    sliding 5-symbol words over CONTIGUOUS day windows (gap windows
    dropped on both sides) + a word count.

    Determinism: ntile over the total order (cents, day) and lead()
    over days are both order-exact; words are strings; the top-10
    breaks count ties by motif text."""
    o = load(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = o.groupBy(
        F.floor(F.col("o_orderdate").cast("double") / 86400)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    sym = daily.select(
        "day", F.ntile(5).over(Window.orderBy("cents", "day")).alias("q")
    ).select("day", F.expr("chr(96 + q)").alias("s"))
    wday = Window.orderBy("day")
    word = F.concat(
        F.col("s"),
        *[F.lead("s", i).over(wday) for i in range(1, _W)],
    )
    words = sym.select(
        "day",
        word.alias("word"),
        F.lead("day", _W - 1).over(wday).alias("d_end"),
    ).filter(
        F.col("word").isNotNull() & (F.col("d_end") == F.col("day") + _W - 1)
    )
    return (
        words.groupBy(F.col("word").alias("motif"))
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "motif")
        .limit(10)
    )
