"""Q254-Q257: the data-mixing & selection battery.

Four published LLM-corpus-curation methods the earlier batteries
don't cover: DSIR hashed-n-gram importance resampling (Xie et al.
2023, arXiv:2302.03169), CCNet perplexity head/middle/tail bucketing
(Wenzek et al. 2019, arXiv:1911.00359), the Gopher document-quality
rule battery (Rae et al. 2021, arXiv:2112.11446 Table A1), and
temperature-scaled source mixing (GLaM / PaLM, T=0.7).  Together
with q70 (uniform language rebalance), q81/q190/q250 (LM scoring),
q87 (quality classifier) and q96 (curriculum bins) these complete
the selection/mixing stage of a corpus build.

Determinism discipline (same as sequence.py): every log-probability
quantizes to BIGINT micro-nats per TYPE and multiplies by integer
multiplicity before any per-doc reduction, ratios that feed rules or
shares are integer-scaled (x100 / x1e4 / x1e6) with integer `div`,
and the one sampling primitive (q254's Gumbel key) draws its uniform
from salted md5 exactly like q64/q70/q99, so both engines rank the
same docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


def md5_bucket(col, salt: str, mod: int):
    """First 32 md5 bits of (salt || col) mod ``mod`` - the hashed
    feature map shared by q254's buckets, its Gumbel uniform, and
    q258's sign matrix (embedding_eval imports it);
    identical expression in the DuckDB oracles (q70's pattern)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % mod
    )


@register(
    "q254_dsir_selection",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    ), dt AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5(concat('dsir:', w)), 1, 8))
                  AS BIGINT) % 256 AS b,
             CAST(count(*) AS BIGINT) AS m
      FROM tok GROUP BY 1, 2, 3
    ), raw AS (
      SELECT b, CAST(sum(m) AS BIGINT) AS r FROM dt GROUP BY 1
    ), tgt AS (
      SELECT b, CAST(sum(m) AS BIGINT) AS t
      FROM dt WHERE lang = 'en' GROUP BY 1
    ), tots AS (
      SELECT (SELECT sum(r) FROM raw) AS rt,
             (SELECT coalesce(sum(t), 0) FROM tgt) AS tt
    ), lr AS (
      SELECT raw.b,
             CAST(round((ln((coalesce(tgt.t, 0) + 0.5) / (tots.tt + 128.0))
                         - ln((raw.r + 0.5) / (tots.rt + 128.0)))
                        * 1000000) AS BIGINT) AS lr_micro
      FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tots
    ), scored AS (
      SELECT dt.doc_id, min(dt.lang) AS lang,
             CAST(sum(dt.m) AS BIGINT) AS n_tokens,
             CAST(sum(dt.m * lr.lr_micro) AS BIGINT) AS lw_micro
      FROM dt JOIN lr ON lr.b = dt.b
      GROUP BY dt.doc_id
    ), keyed AS (
      SELECT doc_id, lang, n_tokens,
             round(lw_micro / 1000000.0, 3) AS lw_nats,
             round(lw_micro / 1000000.0
                   - ln(-ln((CAST(concat('0x', substr(md5(concat('dsirg:',
                         CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 0.5)
                       / 4294967296.0)), 6) AS skey
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, lw_nats, skey
    FROM keyed ORDER BY skey DESC, doc_id LIMIT 64
    """,
)
def q254(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): importance-resample the
    raw corpus toward a target domain using hashed unigram features.
    Token types hash into 256 buckets; the target distribution is the
    English slice, the raw distribution the whole corpus; each doc's
    importance log-weight is its bucket-multiplicity dot the smoothed
    bucket log-ratios; selection is Gumbel-top-k (add -ln(-ln(u)) to
    the log-weight, take the top 64), which IS sampling-without-
    replacement proportional to the importance weight - but with the
    uniform drawn from salted md5, so it is reproducible and
    oracle-checkable, the same trick as q99's A-ES sample.

    Engine parity: bucket log-ratios quantize to BIGINT micro-nats
    per BUCKET and multiply by integer multiplicity, so every per-doc
    sum is order-insensitive integer addition; the Gumbel key rounds
    to 6 decimals with doc_id tie-break before the cut.

    100 TB shape: the token stream reduces once to (doc, bucket,
    multiplicity); the model is a 256-row broadcast (hashing bounds it
    regardless of vocabulary - the point of DSIR's hashed features);
    the top-64 is a TakeOrderedAndProject, never a global sort."""
    scored = dsir_scores(spark, sf_dir)
    u = (
        md5_bucket(F.col("doc_id"), "dsirg:", 4294967296) + 0.5
    ) / F.lit(4294967296.0)
    return (
        scored.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round(F.col("lw_micro") / 1_000_000.0, 3).alias("lw_nats"),
            F.round(
                F.col("lw_micro") / 1_000_000.0 - F.log(-F.log(u)), 6
            ).alias("skey"),
        )
        .orderBy(F.desc("skey"), "doc_id")
        .limit(64)
    )


def dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's DSIR importance log-weight (micro-nats,
    BIGINT) plus lang and token count - the pre-selection stage of
    q254, exposed so tests can compare the selected sample's mean
    weight against the corpus mean."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    # pin the (doc, bucket) reduction once (q190's discipline): raw,
    # tgt and the per-doc score all re-read it, so without the pin the
    # token stream is exploded three times
    dt = (
        tok.groupBy("doc_id", "lang", md5_bucket(F.col("w"), "dsir:", 256).alias("b"))
        .agg(F.count("*").cast("bigint").alias("m"))
        .localCheckpoint()
    )
    raw = dt.groupBy("b").agg(F.sum("m").cast("bigint").alias("r"))
    tgt = (
        dt.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("m").cast("bigint").alias("t"))
    )
    tots = (
        raw.agg(F.sum("r").alias("rt"))
        .withColumn("_j", F.lit(0))
        .join(
            tgt.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("tt")).withColumn(
                "_j", F.lit(0)
            ),
            "_j",
        )
    )
    lr_micro = (
        F.round(
            (
                F.log((F.coalesce(F.col("t"), F.lit(0)) + 0.5) / (F.col("tt") + 128.0))
                - F.log((F.col("r") + 0.5) / (F.col("rt") + 128.0))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("lr_micro")
    )
    # the model table is 256 rows BY CONSTRUCTION (hashed features cap
    # the dimensionality - DSIR's own scaling argument), so the
    # broadcasts are safe at any corpus size
    lr = (
        raw.join(tgt, "b", "left")
        .withColumn("_j", F.lit(0))
        .join(F.broadcast(tots), "_j")
        .select("b", lr_micro)
    )
    return (
        dt.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.sum("m").cast("bigint").alias("n_tokens"),
            F.sum(F.col("m") * F.col("lr_micro")).cast("bigint").alias("lw_micro"),
        )
    )


@register(
    "q255_ccnet_ppl_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), dt AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS m
      FROM tok GROUP BY 1, 2, 3
    ), lm AS (
      SELECT lang, w, CAST(sum(m) AS BIGINT) AS c FROM dt GROUP BY 1, 2
    ), lt AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS vocab
      FROM lm GROUP BY 1
    ), scored AS (
      SELECT dt.doc_id, dt.lang,
             CAST(sum(dt.m) AS BIGINT) AS n_tokens,
             CAST(sum(dt.m * CAST(round(ln((lm.c + 1.0)
                  / (lt.total + lt.vocab)) * 1000000) AS BIGINT))
                  AS BIGINT) AS micro
      FROM dt
      JOIN lm ON lm.lang = dt.lang AND lm.w = dt.w
      JOIN lt ON lt.lang = dt.lang
      GROUP BY 1, 2
    ), perdoc AS (
      SELECT doc_id, lang,
             CAST(round(-micro / (1.0 * n_tokens) / 1000.0) AS BIGINT)
               AS nll_milli
      FROM scored
    ), ranked AS (
      SELECT lang, nll_milli,
             row_number() OVER (
               PARTITION BY lang ORDER BY nll_milli, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM perdoc
    )
    SELECT lang,
           CASE WHEN rk * 3 <= n THEN 'head'
                WHEN rk * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(nll_milli) / 1000.0, 3) AS min_nll,
           round(max(nll_milli) / 1000.0, 3) AS max_nll,
           round(sum(nll_milli) / (1000.0 * count(*)), 3) AS mean_nll
    FROM ranked
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q255(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2019): score every
    document with a PER-LANGUAGE unigram LM (CCNet trains one LM per
    language; add-one smoothing here, the bucket logic is
    LM-agnostic), then split each language's docs into head / middle
    / tail perplexity tertiles - CCNet's signature quality
    stratification, where "head" (lowest perplexity = most
    Wikipedia-like) feeds training first.

    Tertile edges are INTEGER rank arithmetic (rk*3 <= n) over
    milli-nat-quantized scores with doc_id tie-break - no
    percent_rank float, so both engines cut identically.

    100 TB shape: token stream reduces once to per-doc types; the LM
    is (lang, word) counts that join back vocabulary-bounded; the
    rank window partitions BY LANGUAGE (bounded state per partition,
    never a global sort); output is 3 rows per language."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    # pinned once, same reason as q254/q190: the LM re-aggregates from
    # the type table and then joins back onto it
    dt = (
        tok.groupBy("doc_id", "lang", "w")
        .agg(F.count("*").cast("bigint").alias("m"))
        .localCheckpoint()
    )
    lm = dt.groupBy("lang", "w").agg(F.sum("m").cast("bigint").alias("c"))
    lt = lm.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    micro = (
        F.round(
            F.log((F.col("c") + 1.0) / (F.col("total") + F.col("vocab")))
            * 1_000_000
        )
        .cast("bigint")
        .alias("w_micro")
    )
    # same vocabulary-bounded broadcast discipline as q190/q250 (the
    # measured note lives at q190): the per-language model tables are
    # Heaps-law sublinear, and the hint keeps the type table from
    # being shuffle-written for an SMJ
    model = lm.join(F.broadcast(lt), "lang").select("lang", "w", micro)
    scored = (
        dt.join(F.broadcast(model), ["lang", "w"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("m").cast("bigint").alias("n_tokens"),
            F.sum(F.col("m") * F.col("w_micro")).cast("bigint").alias("micro"),
        )
    )
    perdoc = scored.select(
        "doc_id",
        "lang",
        F.round(-F.col("micro") / (1.0 * F.col("n_tokens")) / 1000.0)
        .cast("bigint")
        .alias("nll_milli"),
    )
    wlang = Window.partitionBy("lang")
    ranked = perdoc.select(
        "lang",
        "nll_milli",
        F.row_number().over(wlang.orderBy("nll_milli", "doc_id")).alias("rk"),
        F.count("*").over(wlang).alias("n"),
    )
    bucket = (
        F.when(F.col("rk") * 3 <= F.col("n"), F.lit("head"))
        .when(F.col("rk") * 3 <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket")
    )
    return (
        ranked.select("lang", bucket, "nll_milli")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.min("nll_milli") / 1000.0, 3).alias("min_nll"),
            F.round(F.max("nll_milli") / 1000.0, 3).alias("max_nll"),
            F.round(F.sum("nll_milli") / (1000.0 * F.count("*")), 3).alias(
                "mean_nll"
            ),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "q256_gopher_rules",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '),
                  w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
               AS alpha_words,
             (CASE WHEN list_contains(string_split(text, ' '), 'the')
                   THEN 1 ELSE 0 END
              + CASE WHEN list_contains(string_split(text, ' '), 'a')
                     THEN 1 ELSE 0 END
              + CASE WHEN list_contains(string_split(text, ' '), 'of')
                     THEN 1 ELSE 0 END
              + CASE WHEN list_contains(string_split(text, ' '), 'to')
                     THEN 1 ELSE 0 END
              + CASE WHEN list_contains(string_split(text, ' '), 'and')
                     THEN 1 ELSE 0 END) AS stop_hits,
             CAST(len(list_filter(string_split(text, ' '),
                  w -> w = '...' OR w LIKE '#%')) AS BIGINT) AS sym_words
      FROM documents
    ), derived AS (
      SELECT doc_id, n_words,
             (n_chars - (n_words - 1)) * 100 // n_words AS mean_len_x100,
             alpha_words * 100 // n_words AS alpha_pct,
             stop_hits,
             sym_words * 100 // n_words AS symbol_pct
      FROM feat
    )
    SELECT doc_id, n_words, mean_len_x100, alpha_pct,
           CAST(stop_hits AS BIGINT) AS stop_hits, symbol_pct,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                     THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
           CAST(CASE WHEN mean_len_x100 BETWEEN 300 AND 1000
                     THEN 1 ELSE 0 END AS BIGINT) AS r_meanlen,
           CAST(CASE WHEN alpha_pct >= 80 THEN 1 ELSE 0 END AS BIGINT)
             AS r_alpha,
           CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT)
             AS r_stop,
           CAST(CASE WHEN symbol_pct < 10 THEN 1 ELSE 0 END AS BIGINT)
             AS r_symbol,
           CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                      AND mean_len_x100 BETWEEN 300 AND 1000
                      AND alpha_pct >= 80 AND stop_hits >= 2
                      AND symbol_pct < 10
                     THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass
    FROM derived ORDER BY doc_id
    """,
)
def q256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021, Table A1): the
    named document filters - word count in [50, 100000], mean word
    length in [3, 10], >=80% of words contain an alphabetic
    character, >=2 distinct stop words present, <10% symbol words
    ('...' / '#'-prefixed) - each emitted as its own 0/1 column plus
    the conjunction, so a curation pipeline can audit WHICH rule
    rejected a doc (q76's funnel reads exactly this shape).

    All ratios are integer-scaled (x100, integer div) and mean word
    length exploits the single-space join invariant (sum of word
    lengths = n_chars - (n_words - 1), asserted against the data by
    the oracle's identical formula) - no floats anywhere, so the
    engines cannot diverge.

    100 TB shape: map-only scan (one projection, no shuffle, no UDF -
    the word tests are JVM higher-order array functions), so it
    pipelines at parquet-read speed on any cluster."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_hits = sum(
        F.when(F.array_contains(words, s), 1).otherwise(0)
        for s in ("the", "a", "of", "to", "and")
    ).alias("stop_hits")
    feat = d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(
            F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
        ).cast("bigint").alias("alpha_words"),
        stop_hits,
        F.size(
            F.filter(
                words, lambda w: (w == "...") | w.startswith("#")
            )
        ).cast("bigint").alias("sym_words"),
    )
    derived = feat.select(
        "doc_id",
        "n_words",
        F.expr("(n_chars - (n_words - 1)) * 100 div n_words").alias(
            "mean_len_x100"
        ),
        F.expr("alpha_words * 100 div n_words").alias("alpha_pct"),
        "stop_hits",
        F.expr("sym_words * 100 div n_words").alias("symbol_pct"),
    )
    r_wordcount = F.col("n_words").between(50, 100000)
    r_meanlen = F.col("mean_len_x100").between(300, 1000)
    r_alpha = F.col("alpha_pct") >= 80
    r_stop = F.col("stop_hits") >= 2
    r_symbol = F.col("symbol_pct") < 10
    as_flag = lambda c, n: F.when(c, 1).otherwise(0).cast("bigint").alias(n)
    return derived.select(
        "doc_id",
        "n_words",
        "mean_len_x100",
        "alpha_pct",
        F.col("stop_hits").cast("bigint").alias("stop_hits"),
        "symbol_pct",
        as_flag(r_wordcount, "r_wordcount"),
        as_flag(r_meanlen, "r_meanlen"),
        as_flag(r_alpha, "r_alpha"),
        as_flag(r_stop, "r_stop"),
        as_flag(r_symbol, "r_symbol"),
        as_flag(
            r_wordcount & r_meanlen & r_alpha & r_stop & r_symbol,
            "gopher_pass",
        ),
    ).orderBy("doc_id")


@register(
    "q257_temperature_mixture",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM src
    ), pw AS (
      SELECT source, n_tokens,
             CAST(round(pow(n_tokens * 1.0 / tot.total, 0.7) * 1000000000)
                  AS BIGINT) AS pw_nano
      FROM src CROSS JOIN tot
    ), spw AS (
      SELECT CAST(sum(pw_nano) AS BIGINT) AS sum_pw FROM pw
    )
    SELECT pw.source, pw.n_tokens,
           pw.n_tokens * 1000000 // tot.total AS share_x1e6,
           pw.pw_nano * 10000 // spw.sum_pw AS temp_share_x1e4,
           round((pw.pw_nano * 1.0 / spw.sum_pw)
                 / (pw.n_tokens * 1.0 / tot.total), 3) AS boost
    FROM pw CROSS JOIN tot CROSS JOIN spw
    ORDER BY pw.source
    """,
)
def q257(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the GLaM / PaLM mixing rule,
    T = 0.7): sampling weight per source proportional to
    (token share)^T, which upweights small high-quality sources and
    damps the dominant crawl - the standard fix for "the biggest
    source swallows the mixture" that q70's hard uniform target
    overshoots.  `boost` is the resampling factor each source gets
    (scaled share / natural share; >1 means oversampled).

    Engine parity: the one float primitive, pow(share, 0.7),
    quantizes to BIGINT nano-units per SOURCE before the normalizing
    sums, so the shares are exact integer ratios (a raw double
    sum-of-pows is where libm ulp differences would bite).

    100 TB shape: one partial-agg shuffle reduces the corpus to a
    SOURCE-cardinality table (dozens of rows at any scale); the
    normalizing totals are broadcast-joined scalars, never an
    unpartitioned window (q70's note)."""
    d = load(spark, sf_dir, "documents")
    # pin the source-cardinality reduction: tot, pw and the final
    # select all re-read it, and without the pin each consumer
    # re-derives it FROM THE CORPUS SCAN (4 parquet scans of the fact
    # table for a 20-row result - the one shape that cannot ship at
    # 100 TB)
    src = (
        d.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"))
        .localCheckpoint()
    )
    tot = src.agg(F.sum("n_tokens").cast("bigint").alias("total")).withColumn(
        "_j", F.lit(0)
    )
    pw = (
        src.withColumn("_j", F.lit(0))
        .join(F.broadcast(tot), "_j")
        .select(
            "source",
            "n_tokens",
            "total",
            F.round(
                F.pow(F.col("n_tokens") * 1.0 / F.col("total"), 0.7)
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("pw_nano"),
        )
    )
    spw = pw.agg(F.sum("pw_nano").cast("bigint").alias("sum_pw")).withColumn(
        "_j", F.lit(0)
    )
    return (
        pw.withColumn("_j", F.lit(0))
        .join(F.broadcast(spw), "_j")
        .select(
            "source",
            "n_tokens",
            F.expr("n_tokens * 1000000 div total").alias("share_x1e6"),
            F.expr("pw_nano * 10000 div sum_pw").alias("temp_share_x1e4"),
            F.round(
                (F.col("pw_nano") * 1.0 / F.col("sum_pw"))
                / (F.col("n_tokens") * 1.0 / F.col("total")),
                3,
            ).alias("boost"),
        )
        .orderBy("source")
    )
