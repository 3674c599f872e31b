"""Q79-Q83, Q95-Q96, Q105: corpus-curation operators (training-data pipeline).

PII redaction, URL/domain accounting, unigram-LM surprisal scoring,
keyword extraction, and per-source distribution-drift scoring over
the documents table.  The synthetic corpus
(TESTDATA.md) contains no natural PII/URLs, so q79/q80 first apply a
DETERMINISTIC enrichment (explicit concat keyed on doc_id, identical
in the Spark plan and the DuckDB oracle) and then run the real
extraction/redaction operators over the enriched text - the operator
logic is what is exercised and hash-checked, q68-style.

All four queries are map-only or one/two-shuffle plans with partial
aggregation; regexes are JVM-side (no Python in the hot path) and
restricted to the syntax subset Java regex and RE2 (DuckDB) share -
no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iceberg_daq_spark.operators import text
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

_STOP_SQL = "'" + "', '".join(text.STOPWORDS) + "'"

# Shared Java/RE2 pattern subset (see operators/text.py notes).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
URL_RE = r"https?://[a-z0-9.-]+[a-z0-9/._-]*"
DOMAIN_RE = r"https?://([a-z0-9.-]+)"


def _pii_enriched() -> F.Column:
    """text + deterministic PII suffixes keyed on doc_id (q68-style
    explicit concat; byte-identical to the oracle's || chain)."""
    d = F.col("doc_id")
    s = F.col("text")
    email = F.concat(
        F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")
    )
    phone = F.concat(
        F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0")
    )
    ip = F.concat(
        F.lit(" host 10.0."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
    )
    s = F.concat(s, F.when(d % 7 == 0, email).otherwise(F.lit("")))
    s = F.concat(s, F.when(d % 5 == 0, phone).otherwise(F.lit("")))
    s = F.concat(s, F.when(d % 11 == 0, ip).otherwise(F.lit("")))
    return s


_PII_ENRICH_SQL = """
      text
      || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0
              THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
      || CASE WHEN doc_id % 11 = 0
              THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
              ELSE '' END
"""


@register(
    "q79_pii_redaction",
    oracle=r"""
    WITH e AS (
      SELECT doc_id, {enrich} AS enriched FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(enriched, '{email}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(enriched, '{phone}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(enriched, '{ip}')) AS BIGINT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(enriched, '{email}', '<EMAIL>', 'g'),
               '{ip}', '<IP>', 'g'),
             '{phone}', '<PHONE>', 'g') AS redacted
    FROM e
    ORDER BY doc_id
    """.format(enrich=_PII_ENRICH_SQL, email=EMAIL_RE, phone=PHONE_RE, ip=IP_RE),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count + redact emails / phone numbers / IPv4
    addresses (the pre-training privacy pass).  Map-only: three JVM
    regexp_count + three regexp_replace per row, no shuffle - streams
    at scan speed at any corpus size."""
    d = load(spark, sf_dir, "documents")
    enriched = _pii_enriched()
    red = text.redact(enriched)
    return d.select(
        "doc_id",
        F.regexp_count(enriched, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(enriched, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(enriched, F.lit(IP_RE)).cast("long").alias("n_ips"),
        red.alias("redacted"),
    ).orderBy("doc_id")


_URL_ENRICH_SQL = """
      text
      || CASE WHEN doc_id % 5 = 0
              THEN ' see https://www.dom' || CAST(doc_id % 20 AS VARCHAR)
                   || '.example.org/p/' || CAST(doc_id AS VARCHAR)
              ELSE '' END
      || CASE WHEN doc_id % 10 = 0
              THEN ' and http://cdn.assets.net/x/' || CAST(doc_id AS VARCHAR)
              ELSE '' END
"""


def _url_enriched() -> F.Column:
    d = F.col("doc_id")
    s = F.col("text")
    site = F.concat(
        F.lit(" see https://www.dom"),
        (d % 20).cast("string"),
        F.lit(".example.org/p/"),
        d.cast("string"),
    )
    cdn = F.concat(F.lit(" and http://cdn.assets.net/x/"), d.cast("string"))
    s = F.concat(s, F.when(d % 5 == 0, site).otherwise(F.lit("")))
    s = F.concat(s, F.when(d % 10 == 0, cdn).otherwise(F.lit("")))
    return s


@register(
    "q80_url_domains",
    oracle=r"""
    WITH e AS (
      SELECT doc_id, {enrich} AS enriched FROM documents
    ), u AS (
      SELECT doc_id, unnest(regexp_extract_all(enriched, '{url}')) AS url
      FROM e
    )
    SELECT regexp_extract(url, '{domain}', 1) AS domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CASE WHEN regexp_extract(url, '{domain}', 1) = 'cdn.assets.net'
                THEN 'blocked' ELSE 'allowed' END AS status
    FROM u
    GROUP BY 1, 4
    ORDER BY domain
    """.format(enrich=_URL_ENRICH_SQL, url=URL_RE, domain=DOMAIN_RE),
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain accounting with a blocklist verdict
    (the crawl-curation domain filter).  Extraction is map-only JVM
    regex; the only shuffle is the per-domain partial+final agg, whose
    key cardinality is the (small) domain set."""
    d = load(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(_url_enriched(), F.lit(URL_RE), 0)).alias(
            "url"
        ),
    )
    dom = F.regexp_extract(F.col("url"), DOMAIN_RE, 1)
    return (
        urls.select("doc_id", dom.alias("domain"))
        .withColumn(
            "status",
            F.when(F.col("domain") == "cdn.assets.net", "blocked").otherwise(
                "allowed"
            ),
        )
        .groupBy("domain", "status")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .select("domain", "n_urls", "n_docs", "status")
        .orderBy("domain")
    )


@register(
    "q81_unigram_surprisal",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), freq AS (
      SELECT w, count(*) AS cnt FROM tok GROUP BY w
    ), tot AS (
      SELECT sum(cnt) AS total FROM freq
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-ln(f.cnt / tot.total)), 2) AS mean_surprisal
    FROM tok t JOIN freq f ON t.w = f.w CROSS JOIN tot
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal scoring: corpus unigram probabilities, then
    per-doc mean -ln p(w) (the perplexity-proxy quality filter of
    data-curation pipelines).

    The token stream reduces to per-(doc, word) TYPE counts first and
    is pinned, so the explode runs exactly once and everything
    downstream - the corpus unigram table, the broadcast probe, and
    the per-doc weighted mean - works on the type grain, not the
    token grain (the r12 stress bench charged the old plan two full
    explode passes plus a token-grain broadcast probe).  The unigram
    table is vocabulary-sized - broadcast back, so the corpus is
    never reshuffled by vocabulary."""
    d = load(spark, sf_dir, "documents")
    docw = (
        d.select("doc_id", F.explode(text.words(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    freq = docw.groupBy("w").agg(F.sum("c").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("total"))
    # no broadcast hint on freq: the unigram table grows with corpus
    # vocabulary (Heaps's law - unbounded at 100 TB), so the join
    # strategy is left to AQE (runtime-small -> broadcast, else SMJ
    # keyed on the word); the 1-row total stays an explicit broadcast
    scored = docw.join(freq, "w").join(F.broadcast(tot))
    surprisal = -F.log(F.col("cnt") / F.col("total"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * surprisal) / F.sum("c"), 2
            ).alias("mean_surprisal"),
        )
        .orderBy("doc_id")
    )


@register(
    "q82_keyword_extract",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), ranked AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 2) AS tfidf,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.term ASC
             ) AS rk
      FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           tfidf
    FROM ranked WHERE rk <= 3
    ORDER BY doc_id, tf DESC, df ASC, term ASC
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by (tf DESC,
    rarity ASC, term ASC) with a tf-idf score column.  The ranking key
    is INTEGER-only (tf, df, term) so Spark and the oracle agree
    bit-for-bit - the float tf-idf is reported, never compared.  Plan:
    one (doc,term) partial+final agg, a broadcast of the vocab-sized
    df table, and a per-doc WindowGroupLimit top-k (partial below the
    shuffle) - no global sort of the term table."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(text.words(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(n))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 2
            ).alias("tfidf"),
        )
        .orderBy("doc_id", F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    )


@register(
    "q83_source_drift",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), per AS (
      SELECT source, w, count(*) AS n_sw FROM tok GROUP BY source, w
    ), st AS (
      SELECT source, sum(n_sw) AS n_s FROM per GROUP BY source
    ), gw AS (
      SELECT w, sum(n_sw) AS n_w FROM per GROUP BY w
    ), tot AS (
      SELECT sum(n_w) AS n FROM gw
    )
    SELECT p.source,
           CAST(st.n_s AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(sum(
             pow(p.n_sw - st.n_s * gw.n_w / tot.n, 2)
             / (st.n_s * gw.n_w / tot.n)
           ), 2) AS chi2_drift
    FROM per p
    JOIN st ON p.source = st.source
    JOIN gw ON p.w = gw.w
    CROSS JOIN tot
    GROUP BY p.source, st.n_s
    ORDER BY p.source
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift: Pearson chi-square of each
    source's unigram counts against the corpus-wide distribution
    (restricted to the source's observed vocabulary - the statistic a
    curation pipeline tracks to spot a crawl source going off-mix).
    Plan: one (source, word) partial+final agg; the global word table
    and the per-source totals are vocabulary-/source-sized and
    broadcast back, so the corpus is never reshuffled to score - the
    same posture as q81."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(text.words(F.col("text"))).alias("w"))
    per = tok.groupBy("source", "w").agg(F.count("*").alias("n_sw"))
    st = per.groupBy("source").agg(F.sum("n_sw").alias("n_s"))
    gw = per.groupBy("w").agg(F.sum("n_sw").alias("n_w"))
    tot = gw.agg(F.sum("n_w").alias("n"))
    exp = F.col("n_s") * F.col("n_w") / F.col("n")
    return (
        per.join(F.broadcast(st), "source")
        .join(F.broadcast(gw), "w")
        .join(F.broadcast(tot))
        .groupBy("source", "n_s")
        .agg(
            F.count("*").cast("long").alias("n_distinct"),
            F.round(F.sum(F.pow(F.col("n_sw") - exp, 2) / exp), 2).alias(
                "chi2_drift"
            ),
        )
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            "n_distinct",
            "chi2_drift",
        )
        .orderBy("source")
    )


_QUALITY_SQL = """
      round(least(
        0.2
        + 0.5 * (len(list_filter(w, x -> x IN ({stop}))) * 1.0 / greatest(len(w), 1))
        + 0.3 * least(len(w) / 200.0, 1.0)
        - 0.2 * (len(regexp_extract_all(text, '[.!?,;]')) * 1.0 / greatest(length(text), 1)),
        1.0), 3)
"""


@register(
    "q95_readability",
    oracle=r"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
               AS n_sentences,
             CAST(greatest(len(regexp_extract_all(text, '[aeiou]+')), 1) AS BIGINT)
               AS n_syllables
      FROM documents
    ), s AS (
      SELECT *,
             round(CAST(206.835 AS DOUBLE)
                   - CAST(1.015 AS DOUBLE) * n_words / n_sentences
                   - CAST(84.6 AS DOUBLE) * n_syllables / n_words, 2) AS flesch
      FROM m
    )
    SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
           CASE WHEN flesch >= 60 THEN 'easy'
                WHEN flesch >= 30 THEN 'medium'
                ELSE 'hard' END AS band
    FROM s
    ORDER BY doc_id
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring: Flesch reading-ease per document with a
    vowel-group syllable proxy (the curation-pipeline complexity
    filter; reference analog: per-document quality metadata, A34-A38).
    Map-only - two JVM regexp_count + one split per row, no shuffle,
    streams at scan speed at any corpus size."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_syll = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[aeiou]+")), F.lit(1)
    ).cast("long")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * n_words / n_sent
        - F.lit(84.6) * n_syll / n_words,
        2,
    )
    return (
        d.select(
            "doc_id",
            n_words.alias("n_words"),
            n_sent.alias("n_sentences"),
            n_syll.alias("n_syllables"),
            flesch.alias("flesch"),
        )
        .withColumn(
            "band",
            F.when(F.col("flesch") >= 60, "easy")
            .when(F.col("flesch") >= 30, "medium")
            .otherwise("hard"),
        )
        .orderBy("doc_id")
    )


@register(
    "q96_curriculum_bins",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ), s AS (
      SELECT doc_id, lang, {quality} AS quality FROM tok
    ), b AS (
      SELECT lang, quality,
             ntile(4) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS bin
      FROM s
    )
    SELECT lang, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(quality), 3) AS min_q,
           round(max(quality), 3) AS max_q,
           round(avg(quality), 2) AS avg_q
    FROM b
    GROUP BY lang, bin
    ORDER BY lang, bin
    """.format(quality=_QUALITY_SQL.format(stop=_STOP_SQL)),
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: exact per-language quality QUARTILES
    (NTILE(4)) with per-bin statistics - the stage that orders
    training data easy-to-hard per language.

    A naive ``ntile() OVER (PARTITION BY lang ...)`` puts each
    language in ONE task - 5 tasks for a billion-doc corpus.  This
    uses :func:`operators.ranking.grouped_ntile`: range-partition by
    (lang, quality, doc_id), per-slice counts to the driver (scalars,
    #partitions x #langs of them), broadcast offsets back, exact
    SQL-NTILE bucket arithmetic - every language spans many ordered
    partitions, and the DuckDB ntile() oracle hash-checks bucket
    boundaries exactly."""
    from iceberg_daq_spark.operators.ranking import grouped_ntile
    from iceberg_daq_spark.operators import text as T

    d = load(spark, sf_dir, "documents")
    w = T.words(F.col("text"))
    scored = d.select(
        "doc_id", "lang", T.quality_score(F.col("text"), w).alias("quality")
    )
    binned = grouped_ntile(
        scored, ["lang"], ["quality", "doc_id"], 4, out="bin"
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.min("quality"), 3).alias("min_q"),
            F.round(F.max("quality"), 3).alias("max_q"),
            F.round(F.avg("quality"), 2).alias("avg_q"),
        )
        .orderBy("lang", "bin")
    )


@register(
    "q105_quality_percentile_rank",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
    ), s AS (
      SELECT doc_id, lang, {quality} AS quality FROM tok
    )
    SELECT lang, doc_id, quality,
           round(percent_rank() OVER (
             PARTITION BY lang ORDER BY quality, doc_id), 4) AS pct_rank,
           round(cume_dist() OVER (
             PARTITION BY lang ORDER BY quality, doc_id), 4) AS cume
    FROM s
    ORDER BY lang, doc_id
    """.format(quality=_QUALITY_SQL.format(stop=_STOP_SQL)),
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality percentile ranks (percent_rank +
    cume_dist) - the normalized score a curation pipeline stores so
    downstream mixture weights are comparable across languages.

    Computed on the SAME distributed substrate as q96
    (ranking.grouped_rank: two-pass range layout, no per-language
    single task): under a TOTAL order (quality, doc_id) SQL's
    percent_rank equals (rank-1)/(total-1) and cume_dist equals
    rank/total, so the DuckDB window-function oracle hash-checks the
    distributed layout exactly."""
    from iceberg_daq_spark.operators import text as T
    from iceberg_daq_spark.operators.ranking import grouped_rank

    d = load(spark, sf_dir, "documents")
    w = T.words(F.col("text"))
    scored = d.select(
        "doc_id", "lang", T.quality_score(F.col("text"), w).alias("quality")
    )
    ranked = grouped_rank(scored, ["lang"], ["quality", "doc_id"])
    pr = F.when(
        F.col("_gtotal") > 1,
        (F.col("_grank") - 1) / (F.col("_gtotal") - 1),
    ).otherwise(F.lit(0.0))
    return (
        ranked.select(
            "lang",
            "doc_id",
            "quality",
            F.round(pr, 4).alias("pct_rank"),
            F.round(F.col("_grank") / F.col("_gtotal"), 4).alias("cume"),
        )
        .orderBy("lang", "doc_id")
    )


@register(
    "q120_source_vocab_overlap",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), v AS (
      SELECT source, token FROM vocab WHERE token <> ''
    ), sizes AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.token = b.token AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_common,
           round(i.n_common * 1.0 / (sa.n + sb.n - i.n_common), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY source_a, source_b
    """,
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources - "how much does
    crawl A's lexicon overlap crawl B's?" - the source-redundancy map
    a corpus curator reads before deciding mixture weights.

    100 TB shape: vocab pre-reduces to DISTINCT (source, token)
    (partial-agg shuffle; output bounded by vocabulary size, not
    corpus size), the intersection is a token-keyed inverted-index
    self-join whose per-token fan-out is bounded by
    C(#sources, 2) - a few hundred rows per token however many
    documents share it - and the union sizes arrive by broadcast
    (tiny per-source table).  Nothing scales with document count
    past the first reduce."""
    d = load(spark, sf_dir, "documents")
    v = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    sizes = v.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("_na")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("_nb")))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("_na") + F.col("_nb") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "q135_mutual_information",
    oracle="""
    WITH j AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ), t AS (
      SELECT sum(n) AS total FROM j
    ), ml AS (
      SELECT lang, sum(n) AS nl FROM j GROUP BY lang
    ), ms AS (
      SELECT source, sum(n) AS ns FROM j GROUP BY source
    )
    SELECT j.lang AS lang, j.source AS source, j.n AS n,
           round(ln(CAST(j.n * t.total AS DOUBLE) / (ml.nl * ms.ns)), 4)
             AS pmi,
           round((CAST(j.n AS DOUBLE) / t.total)
                 * ln(CAST(j.n * t.total AS DOUBLE) / (ml.nl * ms.ns)), 6)
             AS mi_contrib
    FROM j, t
    JOIN ml ON ml.lang = j.lang
    JOIN ms ON ms.source = j.source
    ORDER BY lang, source
    """,
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between the language and source
    columns - the feature-association probe of corpus curation: which
    sources over- or under-produce which languages, and how much of
    the total lang/source dependence each cell carries (its
    mi_contrib term; summing them gives I(lang; source) in nats).

    100 TB shape: ONE scan, ONE partial-agg shuffle (the joint
    (lang, source) contingency table - cardinality is langs x
    sources, never data-sized); the marginals come from window sums
    OVER the cell table itself (partitioned by lang / by source /
    global), so the raw documents are never re-read - re-deriving
    the marginals as separate aggregations would rescan the source
    once per marginal, which Spark will not common-subexpression
    away.  The unpartitioned total window is safe by construction:
    its input is the bounded cell table.  Every per-cell double is a
    fixed-shape expression over exact BIGINT counts - no double
    summation anywhere - so both engines compute bit-identical
    values before the rounding."""
    d = load(spark, sf_dir, "documents")
    j = d.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n")
    )
    cells = j.select(
        "lang",
        "source",
        "n",
        F.sum("n").over(Window.partitionBy("lang")).alias("nl"),
        F.sum("n").over(Window.partitionBy("source")).alias("ns"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    ratio = (F.col("n") * F.col("total")).cast("double") / (
        F.col("nl") * F.col("ns")
    )
    return (
        cells.select(
            "lang",
            "source",
            "n",
            F.round(F.log(ratio), 4).alias("pmi"),
            F.round(
                (F.col("n").cast("double") / F.col("total")) * F.log(ratio), 6
            ).alias("mi_contrib"),
        )
        .orderBy("lang", "source")
    )


@register(
    "q139_quantile_normalize",
    oracle="""
    WITH hist AS (
      SELECT n_chars, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY n_chars
    ), ranks AS (
      SELECT n_chars, c,
             sum(c) OVER (ORDER BY n_chars
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - c + 1 AS start_rank,
             sum(c) OVER (ORDER BY n_chars
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS end_rank
      FROM hist
    ), tot AS (
      SELECT sum(c) AS n FROM hist
    ), src AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
             ) AS r,
             count(*) OVER (PARTITION BY source) AS m
      FROM documents
    ), idx AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN m > 1
                  THEN ((r - 1) * (tot.n - 1)) // (m - 1) + 1
                  ELSE (tot.n + 1) // 2
             END AS gidx
      FROM src, tot
    )
    SELECT i.doc_id, i.source, i.n_chars,
           rk.n_chars AS norm_chars
    FROM idx i
    JOIN ranks rk ON i.gidx BETWEEN rk.start_rank AND rk.end_rank
    ORDER BY doc_id
    """,
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources: each
    document's in-source rank maps onto the GLOBAL length
    distribution's order statistic at the same relative position -
    the cross-source calibration trick (borrowed from microarray
    normalization) that makes per-source length quotas comparable
    when sources have wildly different length profiles.

    The global quantile function is built WITHOUT a global row sort:
    a value histogram (one partial-agg shuffle, cardinality =
    distinct lengths) plus a cumulative window over the HISTOGRAM
    gives each value its [start_rank, end_rank] global-rank span;
    the per-document target index joins that span table by range -
    broadcast-size, each doc matches exactly one row.  In-source
    ranks are bounded per-source windows, and the index mapping
    ((r-1)*(N-1)) div (m-1) + 1 is all-integer, so both engines pick
    the identical order statistic - no percentile interpolation to
    disagree over.

    100 TB shape: the histogram window is value-space-sized and the
    range join is against a broadcast table.  The per-source ranks
    are the one data-scaled window: above Q139_GIANT_SOURCE_ROWS the
    plan switches to :func:`operators.ranking.grouped_rank` (exact
    two-pass range layout - no task holds a whole source), so both
    paths produce identical indexes and the oracle agrees on
    either - the q103/q143 registered-plan discipline."""
    d = load(spark, sf_dir, "documents")
    return _q139_impl(d)


Q139_GIANT_SOURCE_ROWS = 15_000


def _q139_impl(d: DataFrame) -> DataFrame:
    """q139 core over a (doc_id, source, n_chars) DataFrame (factored
    out so tests can drive the giant-source branch synthetically)."""
    hist = d.groupBy("n_chars").agg(F.count("*").cast("bigint").alias("c"))
    cum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranks = hist.select(
        F.col("n_chars").alias("g_chars"),
        (F.sum("c").over(cum) - F.col("c") + 1).alias("start_rank"),
        F.sum("c").over(cum).alias("end_rank"),
    )
    tot = hist.agg(F.sum("c").alias("n"))
    max_src = (
        d.groupBy("source")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]["m"]
    ) or 0
    if max_src > Q139_GIANT_SOURCE_ROWS:
        from iceberg_daq_spark.operators.ranking import grouped_rank

        g = grouped_rank(
            d.select("doc_id", "source", "n_chars"),
            ["source"],
            ["n_chars", "doc_id"],
        )
        src = g.select(
            "doc_id",
            "source",
            "n_chars",
            F.col("_grank").alias("r"),
            F.col("_gtotal").alias("m"),
        )
    else:
        wsrc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
        src = d.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(wsrc).cast("bigint").alias("r"),
            F.count("*").over(Window.partitionBy("source")).alias("m"),
        )
    idx = src.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("m") > 1,
            F.expr("((r - 1) * (n - 1)) div (m - 1)") + 1,
        )
        .otherwise(F.expr("(n + 1) div 2"))
        .alias("gidx"),
    )
    return (
        idx.join(
            F.broadcast(ranks),
            (F.col("gidx") >= F.col("start_rank"))
            & (F.col("gidx") <= F.col("end_rank")),
        )
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("g_chars").alias("norm_chars"),
        )
        .orderBy("doc_id")
    )
