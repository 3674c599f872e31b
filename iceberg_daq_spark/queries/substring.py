"""Exact substring-duplication queries (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022): the
span-granular twin of the doc-granular near-dup family (q40-q43).

Doc-level dedup keeps one copy of a *document*; LLM corpora also carry
verbatim *passages* repeated across otherwise-distinct documents
(licenses, boilerplate intros, quoted paragraphs), which doc-level
Jaccard never reaches.  The reference operator is suffix-array exact
substring dedup; the distributed formulation here is the standard
scale-out approximation: hash every k-token window, a window content
repeated anywhere in the corpus marks every position it covers, and
per-document maximal duplicated SPANS emerge from merging overlapping
flagged windows (gaps-and-islands on window positions).  All discovery
is one explode + one hash aggregate + one co-partitioned join - linear
shuffles on 8-byte keys, no pair enumeration, no suffix array - the
plan shape that survives a 100 TB corpus (window count == token count,
partial-agg combinable counts, AQE-handled skew on hot windows).

Window size K is 10 tokens here (test corpus docs average ~56 tokens;
production uses 50 per the paper - a config constant, same plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

K = 10  # tokens per window (Lee et al. use 50 at production scale)


def _windows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): xxhash64 of each K-token window.  Map-only:
    the token array never shuffles, only (doc_id, pos, hash) rows."""
    toks = F.split("text", " ")
    idx = F.when(
        F.size(toks) >= K, F.sequence(F.lit(1), F.size(toks) - K + 1)
    ).otherwise(F.array().cast("array<int>"))
    win = F.transform(
        idx,
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, i, K))).alias("h"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(win).alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )


@register(
    "q242_duplicated_spans",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), win AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(w, i, i + 9), ' ') AS win
      FROM tok, LATERAL UNNEST(
        generate_series(1, greatest(len(w) - 9, 0))
      ) AS t(i)
    ), flagged AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos,
                   count(*) OVER (PARTITION BY win) AS cnt
            FROM win)
      WHERE cnt >= 2
    ), isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN pos - prev > 10 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM (SELECT doc_id, pos,
                   coalesce(lag(pos) OVER (
                     PARTITION BY doc_id ORDER BY pos), pos) AS prev
            FROM flagged)
    ), spans AS (
      SELECT doc_id, island,
             max(pos) - min(pos) + 10 AS span_tokens
      FROM isl GROUP BY doc_id, island
    ), per_doc AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_dup_spans,
             CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id, p.n_dup_spans, p.dup_tokens,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           round(CAST(p.dup_tokens AS DOUBLE)
                 / len(string_split(d.text, ' ')), 4) AS dup_frac
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """,
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document maximal duplicated spans: every K-token window
    whose content appears >= 2 times anywhere in the corpus flags its
    position; overlapping/adjacent flagged windows (gap <= K) merge
    into maximal spans; each covered doc reports span count, covered
    tokens, and the duplicated fraction - exactly the rows a
    span-level dedup pass would cut (vs q40/q41 which would keep both
    docs as "distinct").

    100 TB shape: window hashing is map-only (the token array never
    leaves its row); corpus-wide window counts are one partial-agg
    combinable groupBy on 8-byte hashes; flagging is a co-partitioned
    join on the same key; span merging is one per-doc window pass.
    Window equality is by xxhash64 (the oracle groups by the window
    STRING - hash collisions are the accepted content-hash risk, cf.
    q40).  No pair of documents is ever enumerated: cost is linear in
    corpus tokens regardless of how many docs share a passage - the
    property that makes this the scale path where suffix arrays (the
    reference algorithm, Lee et al. ACL 2022) need superlinear
    memory."""
    d = load(spark, sf_dir, "documents")
    # pin the window table: the corpus-count agg and the flag join are
    # back-to-back consumers of the same 3-narrow-column rows, and an
    # unpinned plan re-runs the tokenize+hash explode for each
    # (measured 2x on the sf0.1 bench; on a cluster this pin is a
    # persist(MEMORY_AND_DISK) of ~16 bytes/token, the same order as
    # the shuffle the count already writes)
    w = _windows(d).localCheckpoint()
    counts = w.groupBy("h").agg(F.count("*").alias("cnt"))
    flagged = w.join(counts.filter(F.col("cnt") >= 2), "h").select("doc_id", "pos")
    byd = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        flagged.withColumn("prev", F.coalesce(F.lag("pos").over(byd), F.col("pos")))
        .withColumn(
            "island",
            F.sum(F.when(F.col("pos") - F.col("prev") > K, 1).otherwise(0)).over(
                byd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    spans = isl.groupBy("doc_id", "island").agg(
        (F.max("pos") - F.min("pos") + K).alias("span_tokens")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    return (
        per_doc.join(d.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")), "doc_id")
        .select(
            "doc_id",
            "n_dup_spans",
            "dup_tokens",
            "n_tokens",
            F.round(F.col("dup_tokens").cast("double") / F.col("n_tokens"), 4).alias(
                "dup_frac"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "q243_top_copied_passages",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), win AS (
      SELECT doc_id,
             array_to_string(list_slice(w, i, i + 9), ' ') AS passage
      FROM tok, LATERAL UNNEST(
        generate_series(1, greatest(len(w) - 9, 0))
      ) AS t(i)
    )
    SELECT passage,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM win
    GROUP BY passage
    HAVING count(*) >= 2
    ORDER BY n_occurrences DESC, passage
    LIMIT 20
    """,
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 copied passages: the K-token windows repeated most often
    across the corpus, with occurrence and distinct-document counts -
    span-granular boilerplate mining (q75 mines single hot shingles;
    this surfaces the whole passage a curation team would regex out).

    100 TB shape: one explode + one two-phase hash aggregate (count
    and count-distinct both partial-agg combinable) + TakeOrdered
    top-20 - no window function, no join, no pair enumeration.  The
    passage string rides the aggregate as the group key; at production
    scale the standard refinement groups by xxhash64 first and joins
    the 20 winners back for display (same plan + one broadcast join),
    skipped here because the oracle's value-compare needs the string
    key path on both engines."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx = F.when(
        F.size(toks) >= K, F.sequence(F.lit(1), F.size(toks) - K + 1)
    ).otherwise(F.array().cast("array<int>"))
    win = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, K)))
    return (
        d.select("doc_id", F.explode(win).alias("passage"))
        .groupBy("passage")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), "passage")
        .limit(20)
    )


@register(
    "q246_containment_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, s
      FROM tok, LATERAL UNNEST(
        list_transform(
          generate_series(1, greatest(len(w) - 2, 0)),
          i -> concat_ws(' ', w[i], w[i+1], w[i+2])
        )
      ) AS t(s)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b, c.n_common,
           round(c.n_common * 1.0 / sa.n, 4) AS containment
    FROM common c JOIN sizes sa ON c.doc_a = sa.doc_id
    WHERE c.n_common * 1.0 / sa.n >= 0.6
    ORDER BY c.doc_a, c.doc_b
    """,
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment pairs (|A n B| / |A| >= 0.6): excerpts,
    quotes, and subset documents whose content mostly lives inside a
    larger document - invisible to the Jaccard family (the union is
    dominated by the big doc), caught by the asymmetric measure.
    Engine path is the prefix-filtered operator
    (operators/dedup.containment_pairs: lossless AllPairs prefix on
    the CONTAINED side, full postings on the container side, exact
    hashed-set verification); the oracle walks the complete
    inverted-index join - feasible at oracle scale, quadratic in
    hot-shingle df, which is exactly what the prefix filter avoids."""
    from iceberg_daq_spark.operators import dedup

    d = load(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, threshold=0.6).orderBy("doc_a", "doc_b")
