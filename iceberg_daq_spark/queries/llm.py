"""Q40-Q78: LLM-data-pipeline operators (north-star extensions).

Dedup, similarity search, and text analysis over the documents /
embeddings tables (BASELINE.json north star).  Oracle SQL is provided
wherever DuckDB can express the exact semantics; the hash-based
approximate operators (MinHash LSH, SimHash, LSH-ANN) use Spark's
xxhash64 and are verified in tests against their exact counterparts
instead (driver records rows-only checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.operators import dedup, similarity, text
from iceberg_daq_spark.operators.ranking import grouped_exact_percentile
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load, table_rows

_STOP_SQL = "'" + "', '".join(text.STOPWORDS) + "'"

# q57 (dedup groups) and q73 (cluster retention) both consume the same
# pair-discovery + connected-components stage; in a real pipeline
# retention runs over the STORED dedup-groups table, so a suite pass
# computes the closure once and both queries read the persisted result.
_DEDUP_GROUPS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _dedup_groups_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared q41-pairs -> connected-components -> groups stage:
    prefix-filtered (lossless AllPairs) pair discovery + min-label/
    shortcut propagation, memoized per (session, sf_dir).

    No .persist() here - deliberately: the expensive part (pair
    discovery + the closure rounds) is already materialized by the
    localCheckpoint inside connected_components when the first
    consumer builds the handle, so the retained lineage is one cheap
    docs-side join; a persist() would wrap the stage in an
    InMemoryRelation barrier that blocks AQE re-optimization of the
    plan above it (measured ~2x on q57's bench cell)."""
    import os as _os

    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    df = _DEDUP_GROUPS_CACHE.get(key)
    if df is None:
        d = load(spark, sf_dir, "documents")
        pairs = dedup.ngram_jaccard_prefix_pairs(d, threshold=0.5)
        df = dedup.dedup_groups(d, pairs)
        _DEDUP_GROUPS_CACHE[key] = df
    return df


@register(
    "q40_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    ORDER BY canonical_doc_id
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (one shuffle on the 128-bit hash)."""
    d = load(spark, sf_dir, "documents")
    return dedup.exact_dedup(d).orderBy("canonical_doc_id")


@register(
    "q41_dedup_ngram_jaccard",
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
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via AllPairs prefix-filter
    discovery (operators/dedup.py ngram_jaccard_prefix_pairs).

    Discovery joins only each doc's PROBE PREFIX - its rarest
    n - ceil(t*n) + 1 shingles under the global (df, hash) order -
    which provably contains a shared token for every pair with
    Jaccard >= t, so the output is identical to complete discovery
    at EVERY corpus (unlike the earlier df_max valve, which lost
    pairs whose shared shingles were all hot).  Boilerplate
    shingles fall out of prefixes by construction: per-shingle
    fanout is (prefix occupancy)^2, not df^2, the bounded 100 TB
    shape.  Equality with the unvalved inverted-index path is
    asserted in tests/test_operators.py including a hot-shingle
    corpus where the valve demonstrably drops pairs."""
    d = load(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_prefix_pairs(d, threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


@register(
    "q57_dedup_components",
    oracle="""
    WITH RECURSIVE tok AS (
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
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ), reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), comp AS (
      SELECT u, min(v) AS component FROM reach GROUP BY u
    )
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
           coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.u
    ORDER BY doc_id
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups: transitive closure of the exact near-dup pairs
    (q41) via iterative min-label propagation; every doc gets the min
    doc_id of its component as its group, docs in no pair stand alone.
    The oracle walks the same graph with a recursive CTE - feasible on
    test scale; the engine's propagation loop is the cluster path.
    Pair generation runs the same lossless AllPairs/PPJoin prefix
    discovery as q41 (no hot-shingle cap needed: boilerplate shingles
    fall out of probe prefixes by construction).  The
    pair/CC stage is shared with q73 through a persisted handle - one
    closure per suite pass, the stored-groups-table shape of a real
    pipeline."""
    return _dedup_groups_cached(spark, sf_dir).orderBy("doc_id")


@register(
    "q44_sim_topk_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                              (acc, x) -> acc + x)) AS norm
      FROM v
    ), scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             list_reduce(
               list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
                                                i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.norm * b.norm) AS cos
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    )
    SELECT qid, cid, CAST(rk AS BIGINT) AS rk, round(cos, 3) AS cos_sim
    FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      FROM scored
    )
    WHERE rk <= 5
    ORDER BY qid, rk
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 neighbors per embedding.

    The dot product is a sequential left fold on both engines so the
    doubles are bit-identical and the rank order cannot diverge.
    """
    e = load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_bruteforce(e, k=5).orderBy("qid", "rk")


@register(
    "q54_embed_near_dup",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                              (acc, x) -> acc + x)) AS norm
      FROM v
    )
    SELECT a.vec_id AS qid, b.vec_id AS cid,
           round(list_reduce(
             list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
                                              i -> a.v[i] * b.v[i])),
             (acc, x) -> acc + x) / (a.norm * b.norm), 3) AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_reduce(
            list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
                                             i -> a.v[i] * b.v[i])),
            (acc, x) -> acc + x) / (a.norm * b.norm) >= 0.4
    ORDER BY qid, cid
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline, cos >= 0.4 -
    the synthetic embeddings are random, max pairwise cos ~0.51)."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.cosine_near_dup_pairs(e, threshold=0.4).orderBy("qid", "cid")


@register(
    "q46_text_langid",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           round(len(list_filter(w, x -> x IN ({_STOP_SQL}))) * 1.0
                 / greatest(len(w), 1), 4) AS stop_ratio,
           CASE WHEN len(list_filter(w, x -> x IN ({_STOP_SQL}))) * 1.0
                     / greatest(len(w), 1) >= 0.05
                THEN 'en' ELSE 'unk' END AS lang_pred,
           lang AS lang_label
    FROM tok
    ORDER BY doc_id
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID by stopword density."""
    d = load(spark, sf_dir, "documents")
    w = text.words(F.col("text"))
    return d.select(
        "doc_id",
        F.round(text.stopword_ratio(w), 4).alias("stop_ratio"),
        text.langid(w).alias("lang_pred"),
        F.col("lang").alias("lang_label"),
    ).orderBy("doc_id")


@register(
    "q47_text_quality",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(w) AS BIGINT) AS n_words,
           round(least(
             0.2
             + 0.5 * (len(list_filter(w, x -> x IN ({_STOP_SQL}))) * 1.0 / greatest(len(w), 1))
             + 0.3 * least(len(w) / 200.0, 1.0)
             - 0.2 * (len(regexp_extract_all(text, '[.!?,;]')) * 1.0 / greatest(length(text), 1)),
             1.0), 3) AS quality
    FROM tok
    ORDER BY doc_id
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (length / stopword / punctuation mix)."""
    d = load(spark, sf_dir, "documents")
    w = text.words(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(w).cast("long").alias("n_words"),
        text.quality_score(F.col("text"), w).alias("quality"),
    ).orderBy("doc_id")


@register(
    "q48_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    d = load(spark, sf_dir, "documents")
    w = text.words(F.col("text"))
    ws, bpe = text.token_counts(F.col("text"), w)
    return d.select(
        "doc_id", ws.alias("n_ws_tokens"), bpe.alias("n_re_tokens")
    ).orderBy("doc_id")


@register(
    "q58_corpus_profile",
    oracle="""
    WITH tok AS (
      SELECT lang, len(string_split(text, ' ')) AS n_words FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(quantile_disc(n_words, 0.5) AS DOUBLE), 2)  AS p50_words,
           round(CAST(quantile_disc(n_words, 0.9) AS DOUBLE), 2)  AS p90_words,
           round(CAST(quantile_disc(n_words, 0.99) AS DOUBLE), 2) AS p99_words,
           round(avg(n_words), 2) AS mean_words
    FROM tok
    GROUP BY lang
    ORDER BY lang
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profiling: percentiles of the per-doc token count
    by language - the distribution scan every training-data pipeline
    runs before setting length filters.

    Registered as ``percentile_approx`` (Greenwald-Khanna sketch,
    map-side combinable - partial aggregation shows in the plan, no
    per-group full sort), which is the only shape that survives 100 TB.
    With accuracy >= group cardinality the sketch is exact and returns
    the same discrete order statistic as DuckDB's ``quantile_disc``, so
    the oracle stays a hash check at test scale; at production scale
    the sketch degrades gracefully to epsilon = 1/accuracy rank error
    (approx-vs-exact tolerance asserted in tests/test_operators.py)."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(text.words(F.col("text"))).cast("double")
    tok = d.select("lang", n_words.alias("n_words"))
    acc = 100_000
    return (
        tok.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile_approx("n_words", 0.5, acc), 2).alias("p50_words"),
            F.round(F.percentile_approx("n_words", 0.9, acc), 2).alias("p90_words"),
            F.round(F.percentile_approx("n_words", 0.99, acc), 2).alias("p99_words"),
            F.round(F.avg("n_words"), 2).alias("mean_words"),
        )
        .orderBy("lang")
    )


@register(
    "q49_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              w -> CAST(ascii(w[1]) + length(w) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % {text.FINGERPRINT_MOD}
           ) AS BIGINT) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (A24's fold shape)."""
    d = load(spark, sf_dir, "documents")
    w = text.words(F.col("text"))
    return d.select("doc_id", text.fingerprint(w).alias("fingerprint")).orderBy("doc_id")


@register(
    "q63_text_clean",
    oracle="""
    WITH cleaned AS (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g')) AS clean
      FROM documents
    )
    SELECT doc_id,
           substr(clean, 1, 40) AS clean_prefix,
           CAST(length(text) - length(clean) AS BIGINT) AS n_chars_removed,
           CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_clean_words
    FROM cleaned
    ORDER BY doc_id
    """,
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning/normalization (the first stage of a training-data
    pipeline, upstream of q46-q49's analysis): lowercase, strip
    non-alphanumerics, collapse whitespace - all JVM regexp_replace,
    map-only, no Python."""
    d = load(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        d.select(
            "doc_id",
            clean.alias("clean"),
            F.length("text").alias("len_raw"),
        )
        .select(
            "doc_id",
            F.substring("clean", 1, 40).alias("clean_prefix"),
            (F.col("len_raw") - F.length("clean")).cast("long").alias("n_chars_removed"),
            F.size(F.split("clean", " ")).cast("long").alias("n_clean_words"),
        )
        .orderBy("doc_id")
    )


@register(
    "q64_stratified_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             substr(md5(concat('graft42:', CAST(doc_id AS VARCHAR))), 1, 8) AS skey,
             CASE WHEN lang = 'en' THEN '80000000' ELSE '40000000' END AS cut
      FROM documents
    )
    SELECT doc_id, lang, skey
    FROM keyed
    WHERE skey < cut
    ORDER BY doc_id
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling - the split/sample stage of a
    training-data pipeline.  Membership is a pure hash predicate
    (md5 of a salted id vs a per-stratum threshold: ~50% of the 'en'
    majority stratum, ~25% of every minority stratum), so the sample
    is reproducible across engines and runs, needs no stored split
    table, and is a map-only pushdown-able filter at any scale - the
    industry-standard alternative to rand()-based sampling, which is
    neither repeatable nor oracle-checkable.  md5 is bit-identical in
    Spark and DuckDB, so this is hash-verified end to end."""
    d = load(spark, sf_dir, "documents")
    skey = F.substring(
        F.md5(F.concat(F.lit("graft42:"), F.col("doc_id").cast("string"))), 1, 8
    )
    cut = F.when(F.col("lang") == "en", "80000000").otherwise("40000000")
    return (
        d.select("doc_id", "lang", skey.alias("skey"), cut.alias("cut"))
        .filter(F.col("skey") < F.col("cut"))
        .select("doc_id", "lang", "skey")
        .orderBy("doc_id")
    )


@register(
    "q65_contamination_check",
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
    ), shared AS (
      SELECT e.doc_id AS eval_doc, t.doc_id AS train_doc, count(*) AS n_shared
      FROM sh e JOIN sh t ON e.s = t.s
      WHERE e.doc_id % 10 = 0 AND t.doc_id % 10 <> 0
      GROUP BY 1, 2
      HAVING count(*) >= 5
    )
    SELECT eval_doc,
           CAST(count(*) AS BIGINT) AS n_sources,
           CAST(max(n_shared) AS BIGINT) AS max_shared
    FROM shared
    GROUP BY eval_doc
    ORDER BY eval_doc
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: for every held-out document
    (doc_id % 10 == 0), find training documents sharing >= 5 distinct
    3-gram shingles - the decontamination scan every LLM data pipeline
    runs before reporting eval numbers.

    Same inverted-index shape as legacy q41 discovery (shuffle on the
    shingle), but the join is eval x train instead of a self-join, so
    the fanout is |eval_postings| x |train_postings| per shingle - at
    100 TB a hot-shingle df cap bounds that fanout (boilerplate
    shingles carry no contamination signal; calibrate the cap from
    q75's df table).  Unvalved here: the >= 5-shared-shingles count
    must see every shingle to stay exact, and the 10x stress ratio
    (stress artifact, output-normalized) shows the corpus-scale
    posture holds without it."""
    return (
        contamination_pairs(spark, sf_dir)
        .groupBy("eval_doc")
        .agg(
            F.count("*").alias("n_sources"),
            F.max("n_shared").alias("max_shared"),
        )
        .orderBy("eval_doc")
    )


def contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q65's pair-discovery stage, factored so the stress bench's
    true-output counter measures EXACTLY the quantity the query
    computes (any tuning of the split rule / shingle hash / shared
    gate changes both in lockstep): (eval_doc, train_doc, n_shared)
    for held-out docs (doc_id % 10 == 0) sharing >= 5 distinct 3-gram
    shingles with a training doc."""
    from iceberg_daq_spark.operators.dedup import shingles

    d = load(spark, sf_dir, "documents")
    # join on xxhash64(shingle) instead of the ~25-byte string: same
    # counts (per-doc shingles are distinct; 64-bit collision odds are
    # the accepted content-hash risk), far smaller shuffles at scale
    sh = shingles(d).select("doc_id", F.xxhash64("shingle").alias("h"))
    ev = sh.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("eval_doc"), "h"
    )
    tr = sh.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").alias("train_doc"), "h"
    )
    return (
        ev.join(tr, "h")
        .groupBy("eval_doc", "train_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


@register(
    "q66_vocab_topk",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ), counts AS (
      SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2
    ), ranked AS (
      SELECT lang, token, CAST(n AS BIGINT) AS n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
      FROM counts
    )
    SELECT lang, token, n, CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= 20
    ORDER BY lang, rk
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary head: top-20 tokens by frequency - the
    vocabulary/frequency pass of tokenizer training.  Explode -> two
    partial+final hash aggs -> per-group top-k window over the (small)
    distinct-token table; the exploded token stream itself never feeds
    the window, so the expensive cardinality stays in the combinable
    aggregation at any scale."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(text.words(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "token", "n", F.col("rk").cast("long").alias("rk"))
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# Approximate operators (no SQL oracle - exactness/recall asserted in
# tests against their exact counterparts above).  Registered AFTER the
# oracle-backed queries so the driver's hash-check window is spent on
# queries it can actually hash-verify; these record rows-only checks.
# ---------------------------------------------------------------------------


@register("q42_dedup_minhash_lsh", oracle=None)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, exact-verified (the 100 TB path;
    recall vs q41 asserted in tests)."""
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, threshold=0.5).orderBy("doc_a", "doc_b")


@register("q43_dedup_simhash", oracle=None)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 8) via 16-bit chunk banding."""
    d = load(spark, sf_dir, "documents")
    return dedup.simhash_pairs(d, max_hamming=8).orderBy("doc_a", "doc_b")


@register("q45_sim_ann_lsh", oracle=None)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (bucket equi-join, no cross join);
    recall vs q44 asserted in tests."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(e, k=5).orderBy("qid", "rk")


@register("q56_sim_ann_ivf", oracle=None)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: spherical-kmeans coarse quantizer fitted
    by distributed Lloyd's iterations, nprobe-cell candidate join, exact
    cosine verify; recall vs q44 asserted in tests."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(e, k=5).orderBy("qid", "rk")


@register("q97_sim_ann_pq", oracle=None)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5: product-quantized posting lists
    (8-byte codes instead of 512-byte vectors), asymmetric-distance
    shortlist per probed cell, exact cosine re-rank of the shortlist;
    recall vs q44 asserted in tests (test_pq_ann_recall)."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.pq_ann_topk(e, k=5).orderBy("qid", "rk")


@register("q55_embed_near_dup_lsh", oracle=None)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned embedding near-dup (the 100 TB path; recall vs q54
    asserted in tests, precision 1 by exact verification)."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.lsh_near_dup_pairs(e, threshold=0.4).orderBy("qid", "cid")


@register(
    "q69_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT *,
             sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM t
    )
    SELECT lang,
           CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           CAST(floor(sum(n_tokens) * 100.0 / 2048.0) AS BIGINT) AS fill_pct
    FROM c
    GROUP BY lang, bin_id
    ORDER BY lang, bin_id
    """,
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing - the batch-prep step that concatenates docs
    into fixed context windows (2048 whitespace tokens) for training.

    Deterministic streaming-fill rule: docs are laid out per language
    in doc_id order; a doc's bin is the window its first token lands in
    (docs may straddle a boundary - the pack-with-truncation
    convention).  One window-function pass assigns bins, one partial
    agg summarizes them; no UDF, no driver state, and the per-language
    ordering shuffle is the only wide stage at any scale."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    t = d.select("doc_id", "lang", n_tok.alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = t.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(2048.0)).cast(
            "long"
        ),
    )
    return (
        binned.groupBy("lang", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .withColumn(
            "fill_pct",
            F.floor(F.col("bin_tokens") * 100.0 / 2048.0).cast("long"),
        )
        .orderBy("lang", "bin_id")
    )


@register(
    "q70_mixture_rebalance",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(n) AS t FROM counts
    ), rates AS (
      SELECT lang, least(1.0, (0.2 * t) / n) AS rate FROM counts, tot
    ), keyed AS (
      SELECT d.doc_id, d.lang, r.rate,
             CAST(concat('0x', substr(md5(concat('mix7:', CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
      FROM documents d JOIN rates r USING (lang)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(floor(rate * 100.0) AS BIGINT) AS rate_pct
    FROM keyed
    WHERE u < rate
    GROUP BY lang, rate
    ORDER BY lang
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing - downsample over-represented languages to a
    uniform 20%-per-language target mixture (the domain/language
    re-weighting stage of a corpus build).

    Keep rates are computed FROM the data (target_share / actual_share,
    capped at 1) and membership is the salted-md5 uniform u < rate -
    reproducible across engines and runs, map-only after one tiny
    broadcast-joined rate table, so the plan is a scan + filter at any
    corpus size (same discipline as q64's stratified sample)."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("double").alias("n"))
    # share-of-total over the per-language COUNTS (dimension-sized at
    # any corpus scale): a broadcast equi-join of the 1-row total onto
    # the counts - an unpartitioned window here would plan a
    # single-partition WindowExec (and warn); the join keeps the whole
    # rate computation broadcast-local
    total = counts.agg(F.sum("n").alias("t")).withColumn("_j", F.lit(0))
    rates = (
        counts.withColumn("_j", F.lit(0))
        .join(F.broadcast(total), "_j")
        .select(
            "lang",
            F.least(F.lit(1.0), (0.2 * F.col("t")) / F.col("n")).alias("rate"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix7:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    return (
        d.select("doc_id", "lang")
        .join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .groupBy("lang", "rate")
        .agg(F.count("*").alias("n_kept"))
        .select(
            "lang",
            "n_kept",
            F.floor(F.col("rate") * 100.0).cast("long").alias("rate_pct"),
        )
        .orderBy("lang")
    )


@register(
    "q71_repetition_score",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
      SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
    ), top AS (
      SELECT doc_id, word AS top_token, c AS top_count,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY c DESC, word ASC
             ) AS rn
      FROM wc
    ), t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      FROM documents
    )
    SELECT t.doc_id, n_tokens, n_distinct,
           CAST(floor((n_tokens - n_distinct) * 100.0 / n_tokens) AS BIGINT) AS rep_pct,
           top_token,
           CAST(top_count AS BIGINT) AS top_count
    FROM t JOIN top ON t.doc_id = top.doc_id AND top.rn = 1
    ORDER BY t.doc_id
    """,
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring - the Gopher-style quality
    rule that drops boilerplate/template docs: type-token ratio plus
    the single most repeated token per document.

    The distinct count comes from array_distinct on the already-split
    token array (no second tokenization), and the per-doc top token is
    a count + row_number window over the exploded words - partial
    aggregation keeps the exploded stream from ever hitting the window
    unaggregated.  Ties break lexicographically so the result is
    engine-deterministic."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    warr = F.split(F.col("text"), " ")
    t = d.select(
        "doc_id",
        F.size(warr).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(warr)).cast("long").alias("n_distinct"),
    )
    wc = (
        d.select("doc_id", F.explode(warr).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("word"))
    )
    top = (
        wc.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_token"), F.col("c").alias("top_count"))
    )
    return (
        t.join(top, "doc_id")
        .withColumn(
            "rep_pct",
            F.floor(
                (F.col("n_tokens") - F.col("n_distinct")) * 100.0 / F.col("n_tokens")
            ).cast("long"),
        )
        .select("doc_id", "n_tokens", "n_distinct", "rep_pct", "top_token", "top_count")
        .orderBy("doc_id")
    )


@register(
    "q72_source_cap",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50
    ORDER BY source, rk
    """,
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source capping - bound each source/domain's contribution to
    the corpus at K docs (longest-first, doc_id tiebreak), the
    over-representation control every crawl-derived corpus applies
    before mixing.

    Idiomatic rank<=K window filter: Catalyst rewrites it to
    WindowGroupLimit with a PARTIAL pass before the shuffle (asserted
    in tests/test_plans.py), so every map task forwards at most K rows
    per source it sees - a million-doc hot domain ships K rows per
    task, not a million rows to one reducer.  That optimizer rewrite
    is the whole scale story; no manual salting needed."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("source", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 50)
        .orderBy("source", "rk")
    )


@register(
    "q73_cluster_retention",
    oracle="""
    WITH RECURSIVE tok AS (
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
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ), reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), comp AS (
      SELECT u, min(v) AS component FROM reach GROUP BY u
    ), members AS (
      SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.u
    )
    SELECT component,
           CAST(max_by(doc_id, n_chars * 4294967296 - doc_id) AS BIGINT) AS rep_doc,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM members
    GROUP BY component
    ORDER BY component
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative retention - the step after dedup
    clustering that keeps exactly ONE doc per near-dup cluster (the
    longest; doc_id tiebreak) and drops the rest, turning q57's
    components into the final keep/drop decision.

    Composes the q41/q57 machinery (lossless prefix-filtered pair
    discovery + min-label propagation), then resolves representatives with a
    single hash aggregate: argmax via max_by on the composite key
    n_chars * 2^32 - doc_id (longest wins, lowest doc_id breaks ties;
    stays far under int64 at any plausible doc size) - partial+final
    combinable, so no per-cluster sort and no window shuffle; the
    giant-cluster case (boilerplate collapsing a corpus slice to one
    group) costs one combiner row per map task, not a reducer-side
    sort of the whole cluster.  Consumes the SAME persisted pair/CC
    stage as q57 (retention over the stored dedup-groups table), so a
    suite pass computes the closure once."""
    d = load(spark, sf_dir, "documents")
    members = _dedup_groups_cached(spark, sf_dir).join(
        d.select("doc_id", "n_chars"), "doc_id"
    )
    key = F.col("n_chars") * F.lit(4294967296) - F.col("doc_id")
    return (
        members.groupBy("component")
        .agg(
            F.max_by("doc_id", key).cast("long").alias("rep_doc"),
            F.count("*").alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
        )
        .withColumn("n_dropped", F.col("n_members") - 1)
        .orderBy("component")
    )


@register(
    "q74_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
           round(quantile_cont(l_discount, 0.5), 4) AS p50_discount
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (linear interpolation) - the
    ground-truth twin of q58's percentile_approx sketch profiling.

    Runs through the size-aware ``grouped_exact_percentile``: while
    each return flag's rows fit one task's sort it is Spark's
    buffered ``percentile`` aggregate (the calibration run you do
    once to validate sketch accuracy); above the threshold - the
    100 TB case, 3 flags x billions of lineitems - it switches to
    the distributed two-pass rank selection, which computes the SAME
    interpolated order statistics without any single-task sort.
    q58's sketch (mergeable, constant-size partial state) remains
    the registered approximate path; keeping both lets the tests
    measure sketch error against this exact result."""
    li = load(spark, sf_dir, "lineitem")
    res = grouped_exact_percentile(
        li,
        ["l_returnflag"],
        [
            ("l_extendedprice", 0.5, "_p50"),
            ("l_extendedprice", 0.9, "_p90"),
            ("l_extendedprice", 0.99, "_p99"),
            ("l_discount", 0.5, "_pd"),
        ],
        extra_aggs=[F.count("*").alias("n_items")],
        input_rows=table_rows(sf_dir, "lineitem"),
    )
    return res.select(
        "l_returnflag",
        "n_items",
        F.round("_p50", 4).alias("p50_price"),
        F.round("_p90", 4).alias("p90_price"),
        F.round("_p99", 4).alias("p99_price"),
        F.round("_pd", 4).alias("p50_discount"),
    ).orderBy("l_returnflag")


@register(
    "q75_boilerplate_shingles",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    )
    SELECT shingle,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(count(*) AS BIGINT) AS n_occur
    FROM g
    GROUP BY shingle
    ORDER BY df DESC, n_occur DESC, shingle
    LIMIT 20
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate shingle mining: the top-20 3-gram shingles by
    document frequency (+ total occurrences) - the survey pass that
    CALIBRATES any hot-shingle df cap (e.g. the one q65's docstring
    prescribes at corpus scale; you pick the cap by looking at exactly
    this table's tail) and sizes the prefix-filter fan-out q41 pays.

    One explode + one hash aggregate with both measures partial-agg
    combinable (count-distinct rewrites to a two-phase agg), then a
    global top-k: TakeOrderedAndProject, never a full sort.  Fully
    deterministic ordering (df desc, n_occur desc, shingle asc) so the
    20-row cut is engine-independent."""
    d = load(spark, sf_dir, "documents")
    k = 3
    w = F.split(F.col("text"), " ")
    n_sh = F.greatest(F.size(w) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(w, 1 + j, n_sh) for j in range(k)])
    sh = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    occ = (
        d.select("doc_id", F.explode_outer(sh).alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    return (
        occ.groupBy("shingle")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("n_occur"),
        )
        .orderBy(F.desc("df"), F.desc("n_occur"), "shingle")
        .limit(20)
    )


@register(
    "q76_quality_funnel",
    oracle="""
    WITH t AS (
      SELECT lang,
             len(string_split(text, ' ')) AS nw,
             len(list_distinct(string_split(text, ' '))) AS nd
      FROM documents
    ), v AS (
      SELECT lang, nw,
             CASE WHEN nw < 30 THEN 'short'
                  WHEN nd * 1.0 / nw < 0.35 THEN 'repetitive'
                  ELSE 'keep' END AS verdict
      FROM t
    )
    SELECT lang, verdict,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(nw), 2) AS avg_words
    FROM v
    GROUP BY lang, verdict
    ORDER BY lang, verdict
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel: every doc gets ONE keep/drop verdict
    (first matching rule wins - too short, then too repetitive by
    type-token ratio) and the report counts docs per (lang, verdict) -
    the drop-reason accounting every curation pipeline publishes next
    to its output corpus.

    Map-only rule evaluation (split + array_distinct + CASE, all JVM)
    feeding one partial-agg groupBy; at 100 TB the verdict column is
    also what the keep-filter pushes down on, so the funnel report and
    the filtered write share one scan.  Thresholds (30 words, 0.35
    TTR) sit inside this corpus's distribution so every verdict class
    is populated."""
    d = load(spark, sf_dir, "documents")
    w = text.words(F.col("text"))
    nw = F.size(w)
    ttr = F.size(F.array_distinct(w)) / nw
    verdict = (
        F.when(nw < 30, F.lit("short"))
        .when(ttr < 0.35, F.lit("repetitive"))
        .otherwise(F.lit("keep"))
    )
    return (
        d.select("lang", verdict.alias("verdict"), nw.alias("nw"))
        .groupBy("lang", "verdict")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("nw"), 2).alias("avg_words"))
        .orderBy("lang", "verdict")
    )


@register(
    "q77_label_centroids",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ), cent AS (
      SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos
    ), cn AS (
      SELECT label, sqrt(sum(c * c)) AS nc FROM cent GROUP BY label
    ), dots AS (
      SELECT e.vec_id, e.label,
             sum(e.val * c.c) AS dot,
             sqrt(sum(e.val * e.val)) AS nv
      FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      GROUP BY e.vec_id, e.label
    )
    SELECT d.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(any_value(cn.nc), 3) AS centroid_norm,
           round(avg(d.dot / (d.nv * cn.nc)), 3) AS avg_cos,
           round(min(d.dot / (d.nv * cn.nc)), 3) AS min_cos
    FROM dots d JOIN cn ON d.label = cn.label
    GROUP BY d.label
    ORDER BY d.label
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids + cluster cohesion (mean/min
    cosine of members to their centroid) - the calibration table for
    semantic dedup and IVF cell sizing (how tight are the label
    clusters before you trust cluster-level retention).

    Centroids via posexplode + partial-agg avg per (label, dim) -
    map-side combinable at any scale - reassembled into arrays and
    BROADCAST back (bounded label count, the same shape as the IVF
    probe's broadcast centroids); member cosine is then a map-only
    zip_with fold over the embeddings scan - no second shuffle of
    vector data."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    cent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    cent_arr = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "label",
            F.transform("pc", lambda s: s["c"]).alias("centroid"),
        )
        .withColumn(
            "nc",
            F.sqrt(
                F.aggregate(
                    "centroid", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ),
        )
    )
    j = e.join(F.broadcast(cent_arr), "label")
    dot = F.aggregate(
        F.zip_with("embedding", "centroid", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    cos = dot / (nv * F.col("nc"))
    return (
        j.select("label", F.col("nc").alias("nc"), cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.first("nc"), 3).alias("centroid_norm"),
            F.round(F.avg("cos"), 3).alias("avg_cos"),
            F.round(F.min("cos"), 3).alias("min_cos"),
        )
        .orderBy("label")
    )


@register(
    "q78_doc_chunking",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks, g.start AS start
      FROM t, UNNEST(generate_series(0, greatest(len(toks) - 1, 0), 24))
             AS g(start)
    ), c AS (
      SELECT doc_id,
             CAST(start // 24 AS BIGINT) AS chunk_idx,
             CAST(least(32, len(toks) - start) AS BIGINT) AS n_tokens,
             md5(array_to_string(
               list_slice(toks, start + 1, least(start + 32, len(toks))),
               ' ')) AS chunk_hash
      FROM s
    )
    SELECT doc_id, chunk_idx, n_tokens, chunk_hash,
           CAST(count(*) OVER (PARTITION BY chunk_hash) AS BIGINT)
             AS n_dups,
           (row_number() OVER (PARTITION BY chunk_hash
                               ORDER BY doc_id, chunk_idx) = 1) AS keep
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (32-token chunks, stride 24)
    with chunk-level exact dedup: every chunk gets a content hash, a
    corpus-wide duplicate count, and a ``keep`` bit marking the
    canonical occurrence (first by doc_id, chunk_idx) - the op that
    turns a curated corpus into training sequences while dropping the
    repeated spans sequence-level dedup misses.

    Chunk generation is MAP-ONLY (split + sequence + explode + slice,
    all JVM; no shuffle, so it streams at scan speed at 100 TB); the
    dedup pass is one hash-partitioned shuffle on chunk_hash - no
    global ordering, bounded state per key - the same shape as exact
    doc dedup (operators/dedup.py:83) one level down.  Reference
    analog: corpus preparation for sequence models, SURVEY.md
    section 2 LLM-pipeline family.
    """
    from pyspark.sql import Window

    chunk, stride = 32, 24
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    ch = d.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n"),
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
            )
        ).alias("start"),
    ).select(
        "doc_id",
        (F.col("start") / stride).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(chunk), F.col("n") - F.col("start"))
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start") + 1, chunk)
            )
        ).alias("chunk_hash"),
    )
    wdup = Window.partitionBy("chunk_hash")
    wrank = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    return (
        ch.select(
            "doc_id",
            "chunk_idx",
            "n_tokens",
            "chunk_hash",
            F.count("*").over(wdup).cast("bigint").alias("n_dups"),
            (F.row_number().over(wrank) == 1).alias("keep"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "q84_bm25_search",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ), tf AS (
      SELECT doc_id, dl, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM t, UNNEST(ws) AS u(w)
      WHERE w IN ('scan', 'merge', 'hash')
      GROUP BY doc_id, dl, w
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM t
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(sum(
             ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))
           ), 3) AS bm25
    FROM tf JOIN df USING (term) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id
    LIMIT 20
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (k1=1.2, b=0.75) for a fixed query
    ('scan merge hash'): the retrieval op of a RAG / corpus-inspection
    stack, scored exactly as Okapi BM25 over whitespace tokens.

    100 TB shape: the token stream is filtered to the QUERY TERMS
    before any shuffle (explode + IN-filter is map-only), so the
    aggregated (doc, term) tf table is bounded by docs-matching-query,
    not corpus size; df and the corpus stats are one tiny agg each,
    broadcast back (plan: BroadcastHashJoin, no corpus reshuffle); the
    final top-20 is TakeOrderedAndProject, never a global sort.
    Rounded to 3 decimals with doc_id tiebreak for engine-portable
    ordering."""
    return (
        bm25_scores(spark, sf_dir, ["scan", "merge", "hash"])
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


#: Okapi BM25 parameters shared by q84/q108 (bm25_scores) and the
#: q265 retrieval eval's multi-query scorer - one source of truth so
#: the eval always measures the ranker the search queries actually
#: run (test-asserted lockstep in tests/test_corpus_tuning.py).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 scores per matching document (the shared lexical leg
    of q84 and the q108 hybrid-retrieval fusion): (doc_id, n_terms,
    bm25 rounded 3), unordered.  Map-only term filter before any
    shuffle; df/corpus stats broadcast back (see q84 docstring)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select("doc_id", toks.alias("ws"), F.size(toks).cast("bigint").alias("dl"))
    tf = (
        t.select("doc_id", "dl", F.explode("ws").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    stats = t.agg(
        F.count("*").cast("bigint").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.round(F.sum(contrib), 3).alias("bm25"),
        )
    )


@register(
    "q85_shard_assignment",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
      FROM t
    )
    SELECT CAST((rn - 1) % 8 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens
    FROM r
    GROUP BY 1
    ORDER BY shard
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard assignment: docs ranked by token count
    (longest first, doc_id tiebreak) and dealt round-robin over 8
    shards - the size-balancing layout step before writing training
    shards (round-robin over a size-sorted list bounds shard skew to
    one document).

    The global rank is NOT a single-partition window: it uses the
    two-pass range-partition + offsets plan in
    ``operators/ranking.global_row_number`` (TeraSort's layout), so no
    task ever sees more than its range slice and the only driver
    traffic is one count per partition.  The per-shard rollup is an
    ordinary 8-group partial agg."""
    from iceberg_daq_spark.operators.ranking import global_row_number

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    r = global_row_number(t, [F.desc("n_tokens"), F.asc("doc_id")], out="rn")
    return (
        r.select(((F.col("rn") - 1) % 8).cast("bigint").alias("shard"), "n_tokens")
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
        )
        .orderBy("shard")
    )


@register(
    "q87_quality_classifier",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), z AS (
      SELECT doc_id,
             len(ws) AS n_tok,
             list_sum(list_transform(ws, w ->
               ((((length(w) * 7 + ascii(substr(w, 1, 1))) % 64)
                  * 37 + 11) % 97) / 97.0 - 0.5
             )) AS acc
      FROM t
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(acc / n_tok * 8.0 + 0.2))), 3) AS score,
           (1.0 / (1.0 + exp(-(acc / n_tok * 8.0 + 0.2))) >= 0.5) AS keep
    FROM z
    WHERE n_tok > 0
    ORDER BY doc_id
    """,
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (the fasttext-style
    model-based filter of crawl curation): each token hashes into one
    of 64 buckets, each bucket carries a fixed weight, and the doc's
    mean feature weight goes through a sigmoid into a keep/drop score.
    The weights here are a deterministic portable stand-in (a real
    deployment would broadcast trained weights); what is exercised is
    the exact 100 TB execution shape.

    Map-only end to end: the per-token hash + weight + fold runs as a
    JVM higher-order function (transform + aggregate) INSIDE the scan
    stage - no explode, no shuffle, no Python.  A trained 64-float
    weight vector changes nothing in the plan (it would arrive as a
    broadcast literal array)."""
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")

    def _weight(w):
        # portable stand-in hash: bucket in [0, 64) from token shape,
        # then a fixed pseudo-weight per bucket in [-0.5, 0.5)
        bucket = (F.length(w) * 7 + F.ascii(F.substring(w, 1, 1))) % 64
        return ((bucket * 37 + 11) % 97) / F.lit(97.0) - 0.5

    acc = F.aggregate(
        F.transform(ws, _weight), F.lit(0.0), lambda a, x: a + x
    )
    z = d.select(
        "doc_id",
        F.size(ws).alias("n_tok"),
        acc.alias("acc"),
    ).filter(F.col("n_tok") > 0)
    logit = F.col("acc") / F.col("n_tok") * 8.0 + 0.2
    score = 1.0 / (1.0 + F.exp(-logit))
    return (
        z.select(
            "doc_id",
            F.round(score, 3).alias("score"),
            (score >= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "q88_ngram_novelty",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ), df AS (
      SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY shingle
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           round(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 3) AS novelty
    FROM g JOIN df USING (shingle)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-gram shingles that appear NOWHERE else in the corpus - high
    novelty marks fresh content, low novelty marks near-boilerplate
    (the doc-level readout of the q75 shingle survey, and the metric
    SemDeDup-style pruning thresholds on).

    Same inverted-index shape as q41/q65: one distinct (doc, shingle)
    exchange, a combinable df agg, and a join back on the shingle key
    (AQE handles hot shingles; at scale the join would key on
    xxhash64(shingle) like q41 to keep shuffle keys narrow).  No
    all-pairs anything - novelty needs only each shingle's corpus
    df."""
    d = load(spark, sf_dir, "documents")
    k = 3
    w = F.split(F.col("text"), " ")
    n_sh = F.greatest(F.size(w) - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(w, 1 + j, n_sh) for j in range(k)])
    sh = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    g = (
        d.select("doc_id", F.explode_outer(sh).alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )
    dfreq = g.groupBy("shingle").agg(F.count("*").cast("bigint").alias("df"))
    uniq = F.when(F.col("df") == 1, 1).otherwise(0)
    return (
        g.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(uniq).cast("bigint").alias("n_unique"),
            F.round(F.sum(uniq) / F.count("*"), 3).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register("q86_semdedup", oracle=None)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (cluster -> within-cluster
    near-dup pruning -> one representative per group); approximate by
    construction (k-means cells), so rows-only for the driver - recall
    vs the exact near-dup closure is asserted in
    tests/test_operators.py::test_semdedup_recall_and_keep.

    Threshold 0.45, just under the random synthetic embeddings' max
    pairwise cos (~0.51): high enough that components stay small and
    local (realistic near-dup topology), low enough to exercise real
    pruning."""
    e = load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(e, threshold=0.45)


@register("q89_bpe_vocab", oracle=None)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training: the learned merge table
    (rank, left, right, merged) for 24 merges over the documents
    corpus.  Iterative (one tiny top-1 row to the driver per round,
    vocab-table-sized work otherwise - see operators/bpe.py for the
    100 TB shape), so no SQL oracle; the training loop is asserted
    EQUAL to the reference algorithm in
    tests/test_operators.py::test_bpe_train_matches_reference."""
    from iceberg_daq_spark.operators import bpe

    d = load(spark, sf_dir, "documents")
    return bpe.bpe_vocab(d, n_merges=24)


@register("q90_training_prep_pipeline", oracle=None)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep pipeline, composed from the
    engine's own stages: exact dedup (keep the canonical copy) ->
    Gopher-style quality gate (length + repetition) -> BPE tokenize
    with merges TRAINED ON THE SURVIVING CORPUS -> pack the real BPE
    token counts into 512-token windows per language -> per-language
    packing summary (docs kept/dropped, sequences, tokens, mean fill).

    Rows-only by design (the BPE stage is iterative); pipeline
    invariants (kept-set containment, token conservation through
    packing, fill bounds) are asserted in
    tests/test_operators.py::test_q90_pipeline_invariants.

    100 TB shape: every stage is one already-verified bounded
    operator - dedup is the q40 hash exchange, the quality gate is
    map-only, BPE training is vocab-sized (operators/bpe.py), encoding
    is Arrow-batched map-only, packing is q69's per-language window +
    partial agg.  Nothing here introduces a new shuffle class."""
    from pyspark.sql import Window

    from iceberg_daq_spark.operators import bpe

    d = load(spark, sf_dir, "documents")
    # stage 1: exact dedup - canonical copy per content hash
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        d.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # stage 2: quality gate (q76's first-match rules, map-only)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    kept = kept.filter((n_tok >= 5) & (distinct_ratio >= 0.3))
    # stage 3: BPE merges from the SURVIVING corpus, then encode
    merges = bpe.train_bpe(kept, n_merges=16)
    enc = bpe.bpe_encode(kept, merges).select("doc_id", "n_tokens")
    enc = enc.join(kept.select("doc_id", "lang"), "doc_id")
    # stage 4: pack real token counts into 512-token windows (q69 rule)
    wpack = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = enc.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(wpack) - F.col("n_tokens")) / F.lit(512.0)
        ).cast("long"),
    )
    # stage 5: per-language summary
    return (
        binned.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs_kept"),
            F.countDistinct("bin_id").cast("bigint").alias("n_seqs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.floor(
                F.sum("n_tokens") * 100.0 / (F.countDistinct("bin_id") * 512.0)
            )
            .cast("bigint")
            .alias("mean_fill_pct"),
        )
        .orderBy("lang")
    )


@register(
    "q91_pmi_collocations",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), uni AS (
      SELECT u AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM w, UNNEST(ws) AS t(u) GROUP BY u
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens FROM uni
    ), bi AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2, CAST(count(*) AS BIGINT) AS cnt
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS t(i)
      GROUP BY ws[i], ws[i + 1]
    ), nb AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n_bigrams FROM bi
    )
    SELECT bi.w1, bi.w2, bi.cnt AS pair_count,
           round(ln(
             (bi.cnt * 1.0 / nb.n_bigrams)
             / ((u1.cnt * 1.0 / tot.n_tokens) * (u2.cnt * 1.0 / tot.n_tokens))
           ), 3) AS pmi
    FROM bi
    JOIN uni u1 ON bi.w1 = u1.word
    JOIN uni u2 ON bi.w2 = u2.word
    CROSS JOIN tot CROSS JOIN nb
    WHERE bi.cnt >= 25
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: the top-20 adjacent word pairs by
    pointwise mutual information (with a min-count floor, the standard
    noise guard) - the corpus-linguistics pass behind multi-word
    expression lists and tokenizer sanity checks.

    100 TB shape: unigram and bigram tables are combinable aggs (the
    corpus shuffles once per n-gram order, keyed by the gram); the
    scoring joins attach VOCABULARY-sized tables to the BIGRAM-sized
    table, then TakeOrdered cuts top-20.  The corpus itself is never
    joined or re-shuffled; the count floor keeps the ranked set away
    from the long singleton tail.
    """
    d = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    w = d.select(ws.alias("ws"))
    uni = (
        w.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    tot = uni.agg(F.sum("cnt").cast("bigint").alias("n_tokens"))
    n_bi = F.greatest(F.size("ws") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice("ws", 1, n_bi), F.slice("ws", 2, n_bi)
    )
    bi = (
        w.select(F.explode(pairs).alias("p"))
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= 25)
    )
    nb = (
        w.select(F.explode(pairs).alias("p"))
        .agg(F.count("*").cast("bigint").alias("n_bigrams"))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("cnt").alias("c1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("cnt").alias("c2"))
    pmi = F.log(
        (F.col("cnt") / F.col("n_bigrams"))
        / ((F.col("c1") / F.col("n_tokens")) * (F.col("c2") / F.col("n_tokens")))
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("cnt").alias("pair_count"),
            F.round(pmi, 3).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@register(
    "q92_dup_cluster_sizes",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS shingle
      FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
    ), counts AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id
    ), pair2 AS (
      SELECT p.doc_a, p.doc_b
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM g a JOIN g b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      ) p
      JOIN counts ca ON p.doc_a = ca.doc_id
      JOIN counts cb ON p.doc_b = cb.doc_id
      WHERE p.n_common * 1.0 / (ca.n + cb.n - p.n_common) >= 0.5
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pair2
      UNION ALL SELECT doc_b, doc_a FROM pair2
    ), cc AS (
      WITH RECURSIVE r(node, comp) AS (
        SELECT u, least(u, min(v)) FROM edges GROUP BY u
        UNION
        SELECT e.u, least(r.comp, rr.comp)
        FROM edges e JOIN r ON e.u = r.node JOIN r rr ON e.v = rr.node
        WHERE least(r.comp, rr.comp) < r.comp
      )
      SELECT node, min(comp) AS comp FROM r GROUP BY node
    ), sizes AS (
      SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size FROM cc GROUP BY comp
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM sizes
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: how many dedup clusters of
    each size the corpus contains (singletons excluded - docs in no
    pair) - the curation dashboard number that tells you whether
    duplication is a long tail of pairs or a few giant families, and
    the direct input for choosing q73's retention policy.

    Reuses the SHARED pair/CC stage (one computation serves q57, q73
    and this histogram in a suite pass); the histogram itself is two
    tiny combinable aggs over the (node, component) table.  DuckDB
    oracle: recursive-CTE closure over the same exact pair set."""
    groups = _dedup_groups_cached(spark, sf_dir)
    # component size counts every member (the min-id representative
    # included); singletons - docs in no pair - are size 1 and leave
    sizes = (
        groups.groupBy("component")
        .agg(F.count("*").cast("bigint").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@register(
    "q93_zipf_slope",
    oracle="""
    WITH uni AS (
      SELECT u AS word, CAST(count(*) AS BIGINT) AS freq
      FROM documents, UNNEST(string_split(text, ' ')) AS t(u)
      GROUP BY u
    ), ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, word) AS rank
      FROM uni
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vocab,
           round(regr_slope(ln(freq), ln(rank)), 3) AS zipf_slope,
           round(regr_intercept(ln(freq), ln(rank)), 3) AS zipf_intercept
    FROM ranked
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: the least-squares slope
    of ln(freq) on ln(rank) (natural text sits near -1; synthetic or
    heavily-boilerplated corpora drift off it) - a one-number corpus
    health check curation dashboards track across crawl snapshots.

    The unigram table is one combinable agg; ranking the VOCABULARY
    (not the corpus) uses the distributed two-pass layout
    (operators/ranking.global_row_number - no single-partition
    window even when the vocabulary is billions of types); the fit is
    regr_slope/regr_intercept, both map-side-combinable aggregates, so
    nothing beyond the vocab table ever shuffles."""
    from iceberg_daq_spark.operators.ranking import global_row_number

    d = load(spark, sf_dir, "documents")
    uni = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    ranked = global_row_number(
        uni, [F.desc("freq"), F.asc("word")], out="rank"
    )
    lnf, lnr = F.log("freq"), F.log("rank")
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.round(F.regr_slope(lnf, lnr), 3).alias("zipf_slope"),
        F.round(F.regr_intercept(lnf, lnr), 3).alias("zipf_intercept"),
    )


@register(
    "q94_source_dup_rates",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5(text) AS th FROM documents
    ), dupc AS (
      SELECT th, CAST(count(*) AS BIGINT) AS copies FROM h GROUP BY th
    )
    SELECT h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dupc.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           round(sum(CASE WHEN dupc.copies > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 3) AS dup_rate
    FROM h JOIN dupc USING (th)
    GROUP BY h.source
    ORDER BY h.source
    """,
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rates: for each crawl source, how
    many of its docs share their content hash with ANY doc in the
    corpus - the attribution step after q40 finds duplication (which
    feeds are mirroring each other, who to de-prioritize).

    One hash agg for corpus-wide copy counts, joined back on the
    128-bit hash (both sides combinable; the join key is the hash, so
    AQE's skew handling covers a mega-duplicated document), then a
    per-source rollup."""
    d = load(spark, sf_dir, "documents")
    h = d.select("doc_id", "source", F.md5("text").alias("th"))
    dupc = h.groupBy("th").agg(F.count("*").cast("bigint").alias("copies"))
    is_dup = F.when(F.col("copies") > 1, 1).otherwise(0)
    return (
        h.join(dupc, "th")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(is_dup).cast("bigint").alias("n_dup_docs"),
            F.round(F.sum(is_dup) / F.count("*"), 3).alias("dup_rate"),
        )
        .orderBy("source")
    )


@register(
    "q98_int8_quantization",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM v
    ), e AS (
      SELECT vec_id, scale, len(v) AS dim,
             list_transform(v, x -> pow(x - round(x / scale) * scale, 2)) AS err
      FROM s
    )
    SELECT vec_id,
           round(scale * 1000, 4) AS scale_x1e3,
           round(list_reduce(err, (a, b) -> a + b) / dim * 1000000, 3)
             AS mse_x1e6,
           round(sqrt(list_max(err)) * 1000, 3) AS max_err_x1e3
    FROM e
    ORDER BY vec_id
    """,
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column: per-vector
    symmetric scale (max-abs / 127), reconstruction MSE and max
    elementwise error - the compression-accuracy audit run before
    shipping a quantized ANN index (the stored payload drops 4x; the
    PQ path in q97 drops ~64x).

    Map-only, no shuffle - one Arrow-batched numpy kernel per scan
    task computes the per-element work (a Catalyst HOF formulation was
    4s at sf0.1: the fold expression tree evaluates interpreted, ~dim
    ops per row; the vectorized kernel is ~10x cheaper, the same
    rewrite history as q44's scorer).  Parity discipline: the error
    sum is ``cumsum`` - the oracle's sequential list_reduce fold,
    element-exact - the elementwise round is half-away-from-zero
    (``sign * floor(abs + 0.5)``, DuckDB's std::round), and the three
    DISPLAY roundings stay in Spark's F.round so the proven
    F.round<->DuckDB round pairing applies."""
    import numpy as np
    import pyarrow as pa

    e = load(spark, sf_dir, "embeddings")

    def quant_stats(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            col = rb.column(1)
            X = (
                col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, -1)
            )
            scale = np.abs(X).max(axis=1) / 127.0
            Xs = X / scale[:, None]
            codes = np.sign(Xs) * np.floor(np.abs(Xs) + 0.5)
            err = (X - codes * scale[:, None]) ** 2
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.array(scale),
                    pa.array(err.cumsum(axis=1)[:, -1]),  # list_reduce parity
                    pa.array(err.max(axis=1)),
                    pa.array(np.full(n, X.shape[1], dtype=np.int64)),
                ],
                names=["vec_id", "scale", "sse", "max_err2", "dim"],
            )

    stats = e.select("vec_id", "embedding").mapInArrow(
        quant_stats,
        "vec_id bigint, scale double, sse double, max_err2 double, dim bigint",
    )
    return stats.select(
        "vec_id",
        F.round(F.col("scale") * 1000, 4).alias("scale_x1e3"),
        F.round(F.col("sse") / F.col("dim") * 1000000, 3).alias("mse_x1e6"),
        F.round(F.sqrt("max_err2") * 1000, 3).alias("max_err_x1e3"),
    ).orderBy("vec_id")


@register(
    "q99_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             (CAST(concat('0x', substr(md5(concat('es17:',
                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1)
               / 4294967296.0 AS u
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, n_chars,
             round(ln(u) / n_chars * 1000, 7) AS es_key
      FROM keyed
    ), ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY lang ORDER BY es_key DESC, doc_id
             ) AS rk
      FROM scored
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, es_key,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 32
    ORDER BY lang, rk
    """,
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, per language stratum:
    the Efraimidis-Spirakis A-ES scheme - each doc draws a
    DETERMINISTIC hash-uniform u and is ranked by ln(u)/weight (the
    log of the classic u^(1/w) key; here weight = n_chars, i.e.
    length-proportional inclusion).  The top-32 per stratum IS an
    exact weighted sample, reproducible across engines and runs -
    the distributed answer to "sample k docs per language,
    probability proportional to size" that rand()-based sampling
    can't give (not repeatable, not oracle-checkable).

    Scale shape: the key is a map-only expression (md5 + ln), and the
    per-stratum top-k plans as WindowGroupLimit with a partial pass
    below the shuffle - hot strata ship k rows per map task, never
    their full membership.  The key is ROUNDED to 7 decimals with
    doc_id tie-break so libm ulp differences between engines cannot
    reorder the cut."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("es17:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    es_key = F.round(F.log(u) / F.col("n_chars") * 1000, 7)
    w = Window.partitionBy("lang").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        d.select(
            "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"),
            es_key.alias("es_key"),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 32)
        .select("lang", "doc_id", "n_chars", "es_key", "rk")
        .orderBy("lang", "rk")
    )


@register(
    "q100_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), tot AS (
      SELECT count(*) AS n FROM tok
    )
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM tok CROSS JOIN tot
    GROUP BY token, tot.n
    HAVING count(*) >= greatest(CAST(floor(n / 100.0) AS BIGINT), 1)
    ORDER BY cnt DESC, token
    """,
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (tokens holding >= 1% of all token
    mass) WITHOUT a vocabulary-wide shuffle: two-pass Misra-Gries -
    per-partition frequent-items summaries union into a bounded
    candidate set (a superset of every >= n/4096 item, so a fortiori
    of the 1% hitters), then an exact broadcast-semi-join recount.
    The oracle is the plain exact GROUP BY ... HAVING - the two plans
    must agree row-for-row, which is precisely the MG no-false-
    negative guarantee under test.  The only corpus-wide costs are
    the map-side summaries and one scalar count; the shuffle carries
    candidates only.  See operators/text.heavy_hitters for the 100 TB
    rationale."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    total = tok.count()  # one scalar action, the oracle's tot CTE
    floor = max(total // 100, 1)
    return (
        text.heavy_hitters(tok, count_floor=floor)
        .orderBy(F.desc("cnt"), F.asc("token"))
    )


@register(
    "q101_contrastive_pairs",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                              (acc, x) -> acc + x)) AS norm
      FROM v
    ), scored AS (
      SELECT a.vec_id AS qid, b.vec_id AS cid,
             list_reduce(
               list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
                                                i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) / (a.norm * b.norm) AS cos
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
    ), pos AS (
      SELECT qid, cid AS pos_id, round(cos, 3) AS pos_sim,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      FROM scored
    ), tot AS (
      SELECT count(*) AS nv FROM v
    ), raw AS (
      SELECT p.qid, p.pos_id, p.pos_sim,
             (p.qid * 40503 + 1 * 997) % tot.nv AS r1,
             (p.qid * 40503 + 2 * 997) % tot.nv AS r2,
             (p.qid * 40503 + 3 * 997) % tot.nv AS r3,
             tot.nv AS nv
      FROM pos p CROSS JOIN tot WHERE p.rk = 1
    )
    SELECT qid, pos_id, pos_sim,
           CAST(CASE WHEN r1 IN (qid, pos_id) THEN (r1 + 1) % nv ELSE r1 END
                AS BIGINT) AS neg_1,
           CAST(CASE WHEN r2 IN (qid, pos_id) THEN (r2 + 1) % nv ELSE r2 END
                AS BIGINT) AS neg_2,
           CAST(CASE WHEN r3 IN (qid, pos_id) THEN (r3 + 1) % nv ELSE r3 END
                AS BIGINT) AS neg_3
    FROM raw
    ORDER BY qid
    """,
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: for every anchor embedding,
    its EXACT nearest neighbor as the positive (true cosine, from the
    blocked all-pairs scorer) plus three DETERMINISTIC hash negatives
    (modular-arithmetic draws over the dense id space, bumped once on
    anchor/positive collision) - the (anchor, positive, negatives)
    tuples a contrastive embedding trainer consumes.

    Hash negatives instead of rand(): reproducible across engines and
    runs, so the whole mining stage is oracle-checkable; a residual
    double-collision after the bump is possible but identical on both
    engines by construction.  Scale shape: positives ride the q44
    blocked scorer (at real scale, swap in the IVF-PQ ANN from q97 -
    the contract is per-anchor top-1); negatives are map-only
    arithmetic."""
    e = load(spark, sf_dir, "embeddings")
    nv = e.count()  # one scalar action, the oracle's tot CTE
    pos = similarity.cosine_topk_bruteforce(e, k=1).select(
        "qid",
        F.col("cid").alias("pos_id"),
        F.col("cos_sim").alias("pos_sim"),
    )

    def neg(j: int) -> F.Column:
        r = (F.col("qid") * 40503 + j * 997) % nv
        return (
            F.when(r.isin(F.col("qid"), F.col("pos_id")), (r + 1) % nv)
            .otherwise(r)
            .cast("long")
            .alias(f"neg_{j}")
        )

    return pos.select("qid", "pos_id", "pos_sim", neg(1), neg(2), neg(3)).orderBy(
        "qid"
    )


@register("q104_hll_sketch_union", oracle=None)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-(lang, source) Datasketches HLL
    sketches of the distinct-token sets, UNIONED per language - the
    two-level pattern a 100 TB pipeline stores (leaf sketches persist
    per ingest partition; any rollup - per language, per day, global -
    is a cheap union of kilobyte payloads, never a re-scan of the
    corpus).  Both levels are map-side combinable JVM aggregates
    (hll_sketch_agg / hll_union_agg).

    Rows-only by design: the sketch binary is engine-specific, so no
    DuckDB oracle - tests assert the unioned estimate EQUALS the
    direct whole-language sketch estimate (union exactness) and tracks
    the exact distinct count within HLL error."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang", "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    leaf = tok.groupBy("lang", "source").agg(
        F.hll_sketch_agg("w").alias("sk")
    )
    return (
        leaf.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sources"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("est_distinct_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "q248_label_medoids",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
    ), nrm AS (
      SELECT vec_id, label, e,
             sqrt(list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
                              (a, b) -> a + b)) AS nn
      FROM v
    ), u AS (
      SELECT vec_id, label, i AS pos, e[i] / nn AS val
      FROM nrm, UNNEST(generate_series(1, len(e))) AS t(i)
    ), s AS (
      SELECT label, pos, sum(val) AS sv FROM u GROUP BY label, pos
    ), d AS (
      SELECT u.vec_id, u.label, sum(u.val * s.sv) AS score
      FROM u JOIN s ON u.label = s.label AND u.pos = s.pos
      GROUP BY u.vec_id, u.label
    ), m AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_members FROM v GROUP BY label
    ), r AS (
      SELECT label, vec_id, score,
             row_number() OVER (
               PARTITION BY label ORDER BY round(score, 6) DESC, vec_id
             ) AS rk
      FROM d
    )
    SELECT r.label, r.vec_id AS medoid_id, m.n_members,
           round(r.score / m.n_members, 4) AS mean_cos
    FROM r JOIN m ON r.label = m.label
    WHERE r.rk = 1
    ORDER BY r.label
    """,
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT cosine medoid per label cluster: the member vector with
    the highest mean cosine similarity to all members of its label -
    the robust prototype-selection step of a curation pipeline (q77's
    centroid is a synthetic point; the medoid is a REAL example you
    can ship as the cluster's exemplar).

    The naive medoid is all-pairs (m^2 dot products per label); the
    cosine identity argmin_j sum_i (1 - v_j.v_i) = argmax_j v_j.S
    with S = sum of normalized members makes it EXACT in O(m*dim):

      1. one partial-agg shuffle sums normalized coordinates per
         (label, pos) - map-side combinable at any scale,
      2. scores re-aggregate per vector from the exploded stream
         joined against the (bounded: labels x dim rows) direction
         table, again a partial agg,
      3. the winner per label is a max(struct(...)) partial aggregate
         (no window over data-sized partitions); score rounds to 6
         decimals BEFORE the argmax on both engines so float summation
         order cannot flip the pick, and ties break on lowest vec_id
         via the negated-id struct field.

    mean_cos includes the medoid's self-similarity term (score/m),
    matching the oracle exactly."""
    e = load(spark, sf_dir, "embeddings")
    nn = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    ex = e.select(
        "vec_id", "label", nn.alias("nn"), F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id", "label", "pos", (F.col("val").cast("double") / F.col("nn")).alias("val")
    )
    s = ex.groupBy("label", "pos").agg(F.sum("val").alias("sv"))
    d = (
        ex.join(s, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("val") * F.col("sv")).alias("score"))
    )
    m = e.groupBy("label").agg(F.count("*").cast("bigint").alias("n_members"))
    best = d.groupBy("label").agg(
        F.max(
            F.struct(
                F.round("score", 6).alias("sr"),
                (-F.col("vec_id")).alias("ni"),
                F.col("score").alias("score"),
                F.col("vec_id").alias("vec_id"),
            )
        ).alias("w")
    )
    return (
        best.join(m, "label")
        .select(
            "label",
            F.col("w.vec_id").alias("medoid_id"),
            "n_members",
            F.round(F.col("w.score") / F.col("n_members"), 4).alias("mean_cos"),
        )
        .orderBy("label")
    )


@register(
    "q251_embedding_anisotropy",
    oracle="""
    WITH v AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ), pd AS (
      SELECT label, pos, avg(x) AS m, avg(x * x) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY label, pos
    )
    SELECT label,
           CAST(max(c) AS BIGINT) AS n_vecs,
           round(sum(m * m), 4) AS mean_norm_sq,
           round(sum(s), 4) AS mean_sq_norm,
           round(sum(m * m) / sum(s), 4) AS anisotropy
    FROM pd GROUP BY label ORDER BY label
    """,
)
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding anisotropy: ||E[v]||^2 / E[||v||^2] - the
    "common direction" diagnostic of representation quality
    (Ethayarajh 2019: contextual embeddings collapse toward a shared
    mean direction; a healthy retrieval/clustering space scores near
    0, a collapsed one near 1).  Run per label so a single source /
    class with degenerate vectors is visible instead of averaged away.

    100 TB shape: one posexplode + one (label, dim) partial+final agg
    (the moment table is labels x dims rows - tiny), then a
    labels-sized rollup; no joins, no windows, nothing vector-count
    sized ever shuffles.  Both engines compute per-dim means then sum
    the 64 per-dim terms; round(4) absorbs float summation-order
    divergence (the per-term magnitudes are O(1))."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    pd_ = v.groupBy("label", "pos").agg(
        F.avg("x").alias("m"),
        F.avg(F.col("x") * F.col("x")).alias("s"),
        F.count("*").cast("bigint").alias("c"),
    )
    return (
        pd_.groupBy("label")
        .agg(
            F.max("c").cast("bigint").alias("n_vecs"),
            F.round(F.sum(F.col("m") * F.col("m")), 4).alias("mean_norm_sq"),
            F.round(F.sum("s"), 4).alias("mean_sq_norm"),
            F.round(
                F.sum(F.col("m") * F.col("m")) / F.sum("s"), 4
            ).alias("anisotropy"),
        )
        .orderBy("label")
    )


@register("q252_tokenizer_fertility", oracle=None)
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: train BPE merges on the corpus, then
    measure per-source encode quality - subword tokens per whitespace
    word ("fertility", the standard tokenizer-fit metric: ~1 means
    words survive whole, >>1 means the vocabulary shreds this source)
    and characters per token.  A curation stack runs this before
    committing a tokenizer: a source with outlier fertility (code,
    another language, OCR noise) either needs vocab budget or gets
    re-weighted.

    Rows-only by design (BPE's merge loop is iterative and the greedy
    encode is not SQL-expressible); exactness of the underlying
    trainer/encoder vs a reference implementation and this query's
    per-source accounting identities (tokens >= words, fertility/
    chars-per-token consistency) are asserted in
    tests/test_operators.py.

    100 TB shape: training is vocab-sized with one corpus pass
    (operators/bpe.py), the merge table broadcasts, encoding is
    Arrow-batched map-only, and the audit is one per-source partial
    agg - no new shuffle class.  Fertility rounds to 4 decimals from
    BIGINT token/word totals, so the output is order-insensitive."""
    from iceberg_daq_spark.operators import bpe

    d = load(spark, sf_dir, "documents")
    merges = bpe.train_bpe(d, n_merges=24)
    enc = bpe.bpe_encode(d, merges).select("doc_id", "n_tokens")
    toks = F.split(F.col("text"), " ")
    words = d.select(
        "doc_id",
        "source",
        F.size(F.filter(toks, lambda w: w != F.lit(""))).cast("bigint").alias(
            "n_words"
        ),
        F.length(F.regexp_replace("text", " ", "")).cast("bigint").alias(
            "n_chars"
        ),
    )
    return (
        enc.join(words, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.sum("n_tokens") / F.sum("n_words"), 4).alias("fertility"),
            F.round(F.sum("n_chars") / F.sum("n_tokens"), 4).alias(
                "chars_per_token"
            ),
        )
        .orderBy("source")
    )


@register("q253_embedding_spectrum", oracle=None)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding covariance spectrum: top-eigenvalue
    variance share, effective rank (exp of spectral entropy), and
    participation ratio - the dimensionality-collapse diagnostics run
    next to q251's anisotropy before trusting a representation for
    retrieval/clustering (a space whose effective rank is far below
    dim wastes its dimensions; a top-1 share near 1 is rank collapse).

    Rows-only by design (eigendecomposition is not SQL-expressible);
    exactness vs a single-node numpy computation and the spectral
    invariants (effective_rank <= dim, shares in [0, 1]) are asserted
    in tests/test_operators.py.

    100 TB shape: the mergeable-summary pattern (same class as q249's
    sketch) - each Arrow batch folds its vectors into per-label
    (n, sum, sum-of-outer-products) moments, a dim^2-sized constant
    per label; partials combine with one label-keyed shuffle of those
    constants and the 64x64 eigensolve runs once per label inside the
    final task.  No vector ever leaves its scan task; adding data
    grows only the map-side fold, never the shuffled state."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    part_schema = "label bigint, n long, s array<double>, ss array<double>"

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for lab, g in pdf.groupby("label"):
                V = np.stack([np.asarray(x, dtype=np.float64) for x in g["v"]])
                yield pd.DataFrame(
                    {
                        "label": [lab],
                        "n": [len(V)],
                        "s": [V.sum(axis=0).tolist()],
                        "ss": [(V.T @ V).reshape(-1).tolist()],
                    }
                )

    p = e.mapInPandas(partials, part_schema)
    out_schema = (
        "label bigint, n_vecs long, dim long, top1_var_share double, "
        "effective_rank double, participation_ratio double"
    )

    def finalize(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["n"].sum())
        s = np.sum(np.stack([np.asarray(x) for x in pdf["s"]]), axis=0)
        ss = np.sum(np.stack([np.asarray(x) for x in pdf["ss"]]), axis=0)
        d = len(s)
        mu = s / n
        C = ss.reshape(d, d) / n - np.outer(mu, mu)
        lam = np.clip(np.linalg.eigvalsh(C), 0.0, None)
        tot = float(lam.sum())
        if tot <= 0.0:
            top1, eff, pr = 0.0, 0.0, 0.0
        else:
            share = lam / tot
            nz = share[share > 0]
            eff = float(np.exp(-(nz * np.log(nz)).sum()))
            top1 = float(share[-1])  # eigvalsh returns ascending
            pr = float(tot * tot / (lam @ lam))
        return pd.DataFrame(
            {
                "label": [key[0]],
                "n_vecs": [n],
                "dim": [d],
                "top1_var_share": [round(top1, 4)],
                "effective_rank": [round(eff, 4)],
                "participation_ratio": [round(pr, 4)],
            }
        )

    return p.groupBy("label").applyInPandas(finalize, out_schema).orderBy("label")
