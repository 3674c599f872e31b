"""Q259-Q262 + Q264: the pre-flight corpus-tuning battery.

The ops a practitioner runs BEFORE committing a 100 TB curation
config: calibrate the MinHash-LSH band scheme against the true
Jaccard S-curve on a bounded sample (q259), calibrate the SimHash
Hamming radius against the same sample (q264), sweep the near-dup
threshold to see what each setting would actually delete (q262),
apply the classic C4-style token-blocklist filter (q260), and solve
the data-constrained token budget allocation (epoch caps + exact
waterfilling, Muennighoff et al. 2023, arXiv:2305.16264) in closed
form (q261).

Reference analog: SURVEY.md section 2 LLM-pipeline family; the
dedup substrate is operators/dedup.py (q41/q42's shingles and
prefix-filtered discovery).

Determinism discipline: q259's MinHash uses per-permutation salted
``md5`` with LEXICOGRAPHIC string minima, so Spark and DuckDB build
bit-identical signatures and band buckets from the same shingles
(P[min-md5 equal] = Jaccard exactly as with integer permutations);
ratios compare through integer scaling or round(_, 4) after
identically-structured double expressions.

Scale posture: q259 bounds itself to a ~1000-doc sample via an
in-plan ``doc_id % max(1, n/1000)`` gate (a calibration estimates
pair-collision PROBABILITIES - a fixed-size uniform sample is the
correct estimator at any corpus size, and it needs the non-colliding
pairs too, which is exactly what the production LSH join never
materializes); q260 is map-only + one source-sized agg; q261 reduces
to one row per SOURCE then runs the closed-form waterfill on that
tiny table (no iteration, unlike the naive redistribute loop); q262
rides q41's lossless prefix-filtered pair discovery - no new
pair-enumeration term at any threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators import dedup
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

# q259: 16 permutations folded into 8 bands x 2 rows.  The S-curve
# 1-(1-s^2)^8 has its steep section around s~0.3, which matches the
# 0.5 production threshold's "catch everything above, waste little
# below" tuning question.
_PERMS = 16
_BANDS = 8
_ROWS = _PERMS // _BANDS
_SAMPLE_TARGET = 1000

def _bounded_sample(d: DataFrame) -> DataFrame:
    """~_SAMPLE_TARGET-doc calibration sample via the in-plan
    ``doc_id % max(1, n/target) = 0`` gate, pinned so the full
    documents scan happens ONCE - without the checkpoint every
    downstream branch re-derives the sample from a fresh full-table
    scan (44 scans in q259's unpinned plan).  Mirrored by the ``md``/
    ``samp`` CTEs in the q259/q264 oracles."""
    md = d.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.count("*") / F.lit(_SAMPLE_TARGET)).cast("long"),
        ).alias("md")
    )
    return (
        d.join(F.broadcast(md))
        .filter(F.pmod(F.col("doc_id"), F.col("md")) == 0)
        .select("doc_id", "text")
        .localCheckpoint()
    )


_Q259_ORACLE = f"""
WITH md AS (
  SELECT greatest(1, count(*) // {_SAMPLE_TARGET}) AS md FROM documents
), samp AS (
  SELECT doc_id, text FROM documents, md WHERE doc_id % md.md = 0
), tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM samp
), sh AS (
  SELECT DISTINCT doc_id, s
  FROM tok, LATERAL UNNEST(
    list_transform(
      generate_series(1, greatest(len(w) - 2, 0)),
      i -> concat_ws(' ', w[i], w[i+1], w[i+2])
    )
  ) AS t(s)
), minh AS (
  SELECT doc_id, i, min(md5(s || ':' || i)) AS mh
  FROM sh, LATERAL UNNEST(generate_series(0, {_PERMS - 1})) AS p(i)
  GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, i // {_ROWS} AS band,
         md5(concat_ws('|',
           min(mh) FILTER (WHERE i % {_ROWS} = 0),
           min(mh) FILTER (WHERE i % {_ROWS} = 1))) AS bucket
  FROM minh GROUP BY doc_id, i // {_ROWS}
), collide AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT c.doc_a, c.doc_b,
         least(CAST(floor(
           c.n_common * 10.0 / (sa.n + sb.n - c.n_common)) AS BIGINT), 9
         ) AS jbin,
         CASE WHEN co.doc_a IS NULL THEN 0 ELSE 1 END AS hit
  FROM common c
  JOIN sizes sa ON c.doc_a = sa.doc_id
  JOIN sizes sb ON c.doc_b = sb.doc_id
  LEFT JOIN collide co ON c.doc_a = co.doc_a AND c.doc_b = co.doc_b
), grouped AS (
  SELECT jbin, count(*) AS n_pairs, sum(hit) AS n_collide FROM pairs
  GROUP BY jbin
), m AS (
  SELECT count(*) AS m FROM sizes
), zero_rest AS (
  -- pairs sharing NO shingle: Jaccard exactly 0 and (by the
  -- shared-min argument) never colliding; reconstructed
  -- arithmetically and UNIONed so decile 0 survives even when no
  -- shingle-sharing pair lands in it
  SELECT 0 AS jbin,
         (SELECT m * (m - 1) // 2 FROM m)
           - (SELECT coalesce(sum(n_pairs), 0) FROM grouped) AS n_pairs,
         0 AS n_collide
), filled AS (
  SELECT jbin, sum(n_pairs) AS n_pairs, sum(n_collide) AS n_collide
  FROM (
    SELECT * FROM grouped
    UNION ALL
    SELECT * FROM zero_rest WHERE n_pairs > 0
  )
  GROUP BY jbin
)
SELECT CAST(jbin AS INT) AS jbin,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_collide AS BIGINT) AS n_collide,
       round(n_collide * 1.0 / n_pairs, 4) AS empirical_p,
       round(1 - pow(1 - pow(jbin / 10.0 + 0.05, {_ROWS}), {_BANDS}), 4)
         AS theory_p
FROM filled
ORDER BY jbin
"""


@register("q259_lsh_band_calibration", oracle=_Q259_ORACLE)
def q259(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH band-scheme calibration: empirical band-collision
    probability vs true 3-gram Jaccard, bucketed by Jaccard decile,
    against the theoretical S-curve 1-(1-s^r)^b for b=8 bands
    of r=2 rows - the pre-flight measurement that tunes (b, r)
    before committing a corpus-scale near-dup run (q42's production
    path is the thing being calibrated).

    Signatures are per-permutation salted-md5 STRING minima - for a
    uniform hash, P[argmin shared] = Jaccard exactly, same guarantee
    as integer permutations, and both engines compute the identical
    bytes so the driver hash-checks an LSH pipeline end to end (the
    production q42 path is numpy-fused and rows-only; this is its
    oracle-matched twin).

    Collision pairs are a strict subset of positive-Jaccard pairs
    (equal min-md5 requires a shared shingle), so the j=0 decile's
    pair count is reconstructed arithmetically from the sample size
    (m*(m-1)/2 minus the joined pairs) - the all-pairs denominator is
    never materialized.  The in-plan sample gate (doc_id % max(1,
    n/1000) = 0) bounds every downstream term to ~1000
    docs at ANY corpus size: the common-shingle join and the band
    join both live inside the sample."""
    d = load(spark, sf_dir, "documents")
    samp = _bounded_sample(d)
    sh = dedup.shingles(samp, "text", k=3).localCheckpoint()
    minh = (
        sh.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_PERMS - 1))).alias("i"),
            F.col("shingle"),
        )
        .groupBy("doc_id", "i")
        .agg(
            F.min(
                F.md5(F.concat(F.col("shingle"), F.lit(":"), F.col("i")))
            ).alias("mh")
        )
    )
    bands = minh.groupBy(
        "doc_id", (F.col("i") / _ROWS).cast("long").alias("band")
    ).agg(
        F.md5(
            F.concat_ws(
                "|",
                F.min(F.when(F.pmod("i", F.lit(_ROWS)) == 0, F.col("mh"))),
                F.min(F.when(F.pmod("i", F.lit(_ROWS)) == 1, F.col("mh"))),
            )
        ).alias("bucket")
    )
    b2 = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band"),
        F.col("bucket").alias("bucket"),
    )
    collide = (
        bands.alias("a")
        .join(b2.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_b"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_b").alias("doc_b"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    s2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    common = (
        sh.alias("a")
        .join(s2.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_b"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") * 10.0 / (F.col("na") + F.col("nb") - F.col("n_common"))
    pairs = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .join(collide, ["doc_a", "doc_b"], "left")
        .select(
            F.least(F.floor(jac).cast("long"), F.lit(9).cast("long")).alias("jbin"),
            F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
        )
    )
    grouped = pairs.groupBy("jbin").agg(
        F.count("*").alias("n_pairs"), F.sum("hit").alias("n_collide")
    )
    m = sizes.agg(
        (F.count("*") * (F.count("*") - 1) / 2).cast("long").alias("all_pairs")
    )
    tot = grouped.agg(
        F.coalesce(F.sum("n_pairs"), F.lit(0)).alias("joined_pairs")
    )
    # pairs sharing NO shingle: Jaccard exactly 0, never colliding
    # (shared-min argument); UNIONed as an explicit remainder row so
    # decile 0 survives even when no shingle-sharing pair lands in it
    zero_rest = (
        m.join(F.broadcast(tot))
        .select(
            F.lit(0).cast("long").alias("jbin"),
            (F.col("all_pairs") - F.col("joined_pairs")).alias("n_pairs"),
            F.lit(0).cast("long").alias("n_collide"),
        )
        .filter(F.col("n_pairs") > 0)
    )
    filled = (
        grouped.select("jbin", "n_pairs", F.col("n_collide").cast("long"))
        .unionByName(zero_rest)
        .groupBy("jbin")
        .agg(
            F.sum("n_pairs").cast("long").alias("n_pairs"),
            F.sum("n_collide").cast("long").alias("n_collide"),
        )
        .select(
            F.col("jbin").cast("int").alias("jbin"), "n_pairs", "n_collide"
        )
    )
    theory = F.round(
        F.lit(1.0)
        - F.pow(
            F.lit(1.0) - F.pow(F.col("jbin") / 10.0 + 0.05, F.lit(float(_ROWS))),
            F.lit(float(_BANDS)),
        ),
        4,
    )
    return filled.select(
        "jbin",
        "n_pairs",
        "n_collide",
        F.round(F.col("n_collide") * 1.0 / F.col("n_pairs"), 4).alias("empirical_p"),
        theory.alias("theory_p"),
    ).orderBy("jbin")


# q260: C4-style token blocklist (Raffel et al. 2020 section 2.2 used
# the "List of Dirty, Naughty ..." wordlist; the synthetic corpus gets
# a synthetic blocklist).  Flag = blocklisted token share > 4%.
_BLOCKLIST = ("slow", "dup", "big")
_FLAG_BP = 400  # basis points of tokens

_Q260_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
  FROM documents
), per_doc AS (
  SELECT doc_id, source, count(*) AS n_tok,
         sum(CASE WHEN term IN {_BLOCKLIST!r} THEN 1 ELSE 0 END) AS n_bad
  FROM tok GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_bad * 10000 > {_FLAG_BP} * n_tok
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(n_bad) AS BIGINT) AS total_bad,
       round(sum(CASE WHEN n_bad * 10000 > {_FLAG_BP} * n_tok
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS flag_rate
FROM per_doc
GROUP BY source
ORDER BY source
"""


@register("q260_blocklist_filter", oracle=_Q260_ORACLE)
def q260(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist filter report: per-source document counts,
    docs whose blocklisted-token share exceeds 400 basis
    points, and total blocklist hits.  The flag compares integers
    (n_bad * 10000 > 400 * n_tok) so both engines agree at the
    boundary.

    Plan: the per-doc token/hit counts come from array expressions on
    the UNSPLIT row (size + filter over the split array - no explode,
    no per-token rows, no shuffle), then one source-keyed partial+
    final agg.  Map-only until a #sources-row exchange: the 100 TB
    cost is exactly one scan."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bad = F.size(F.filter(w, lambda t: t.isin(*_BLOCKLIST)))
    per = d.select(
        "source",
        F.size(w).alias("n_tok"),
        bad.alias("n_bad"),
    )
    flagged = F.when(
        F.col("n_bad") * 10000 > F.lit(_FLAG_BP) * F.col("n_tok"), 1
    ).otherwise(0)
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(flagged).cast("long").alias("n_flagged"),
            F.sum("n_bad").cast("long").alias("total_bad"),
            F.round(F.sum(flagged) * 1.0 / F.count("*"), 4).alias("flag_rate"),
        )
        .orderBy("source")
    )


# q261: data-constrained token allocation.  Budget = 3x corpus tokens,
# per-source cap = 4 epochs, target weights n_s^0.5 (flattened
# mixture).  Exact waterfill via the sorted-breakpoint closed form -
# no redistribute loop.
_BUDGET_X = 3
_EPOCH_CAP = 4

_Q261_ORACLE = f"""
WITH src AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
  FROM documents GROUP BY source
), base AS (
  SELECT source, n_tok,
         CAST({_EPOCH_CAP} * n_tok AS DOUBLE) AS cap,
         sqrt(CAST(n_tok AS DOUBLE)) AS w,
         {_EPOCH_CAP} * n_tok / sqrt(CAST(n_tok AS DOUBLE)) AS rho
  FROM src
), ordered AS (
  SELECT *,
         row_number() OVER (ORDER BY rho, source) AS k,
         sum(cap) OVER (ORDER BY rho, source
                        ROWS UNBOUNDED PRECEDING) AS cum_cap,
         sum(w) OVER (ORDER BY rho, source
                      ROWS UNBOUNDED PRECEDING) AS cum_w,
         lead(rho, 1, 1e308) OVER (ORDER BY rho, source) AS rho_next
  FROM base
), tot AS (
  -- budget from the exact integer token sum; w_all as the LAST value
  -- of the ORDERED prefix sum (max of an increasing sequence), so
  -- both engines accumulate the sqrt doubles in the identical
  -- (rho, source) order - an unordered sum(w) aggregate could differ
  -- in the last ulp between engines and shift lambda
  SELECT CAST({_BUDGET_X} AS DOUBLE) * sum(n_tok) AS budget,
         max(cum_w) AS w_all
  FROM ordered
), cand AS (
  SELECT k, (budget - cum_cap) / (w_all - cum_w) AS lam, rho, rho_next
  FROM ordered, tot WHERE cum_w < w_all
  UNION ALL
  SELECT 0, budget / w_all,
         CAST('-infinity' AS DOUBLE),
         (SELECT min(rho) FROM base)
  FROM tot
), lam AS (
  SELECT lam FROM cand
  WHERE rho <= lam AND lam <= rho_next
  ORDER BY k LIMIT 1
)
SELECT b.source,
       b.n_tok AS n_tokens,
       CAST(b.cap AS BIGINT) AS cap_tokens,
       CAST(floor(least(b.cap, lam.lam * b.w)) AS BIGINT) AS alloc_tokens,
       CAST(floor(least(b.cap, lam.lam * b.w)) AS BIGINT) * 100 // b.n_tok
         AS epochs_x100,
       b.rho <= lam.lam AS capped
FROM base b, lam
ORDER BY b.source
"""


@register("q261_token_waterfill", oracle=_Q261_ORACLE)
def q261(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained token-budget allocation (Muennighoff et al.
    2023): give each source tokens proportional to sqrt(n_s) (the
    flattened target mixture) under a 4-epoch repetition
    cap, spending a 3x-corpus budget exactly.

    min(cap_s, lambda*w_s) summed over sources is increasing and
    piecewise-linear in lambda with breakpoints rho_s = cap_s/w_s, so
    the unique lambda solving sum = budget is found by sorting the
    PER-SOURCE table by rho and scanning prefix sums - the closed
    form, not the iterative redistribute loop.  At 100 TB the corpus
    reduces to one row per source in a single partial+final agg
    (token counts come from size(split) on the unsplit row - no
    explode); every window/sort after that runs on a #sources-row
    table, so scale cost is again exactly one scan."""
    d = load(spark, sf_dir, "documents")
    # One corpus scan: the per-source reduction is #sources rows; pin
    # it so the waterfill's window/agg branches (tot, min_rho, cand,
    # final join) read the tiny table instead of re-scanning text.
    src = (
        d.groupBy("source")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tok"))
        .localCheckpoint()
    )
    base = src.select(
        "source",
        "n_tok",
        (F.lit(_EPOCH_CAP) * F.col("n_tok")).cast("double").alias("cap"),
        F.sqrt(F.col("n_tok").cast("double")).alias("w"),
        (
            F.lit(_EPOCH_CAP)
            * F.col("n_tok")
            / F.sqrt(F.col("n_tok").cast("double"))
        ).alias("rho"),
    )
    ow = Window.orderBy("rho", "source")
    cum = Window.orderBy("rho", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = base.select(
        "*",
        F.row_number().over(ow).alias("k"),
        F.sum("cap").over(cum).alias("cum_cap"),
        F.sum("w").over(cum).alias("cum_w"),
        F.lead("rho", 1, 1e308).over(ow).alias("rho_next"),
    )
    # budget from the exact integer token sum; w_all as the LAST value
    # of the ORDERED prefix sum, so both engines accumulate the sqrt
    # doubles in the identical (rho, source) order (an unordered
    # sum("w") aggregate could differ in the last ulp and shift lam)
    tot = ordered.agg(
        (F.lit(float(_BUDGET_X)) * F.sum("n_tok")).alias("budget"),
        F.max("cum_w").alias("w_all"),
    )
    min_rho = base.agg(F.min("rho").alias("min_rho"))
    cand = (
        ordered.join(F.broadcast(tot))
        .filter(F.col("cum_w") < F.col("w_all"))
        .select(
            "k",
            ((F.col("budget") - F.col("cum_cap")) / (F.col("w_all") - F.col("cum_w"))).alias("lam"),
            "rho",
            "rho_next",
        )
        .unionAll(
            tot.join(F.broadcast(min_rho)).select(
                F.lit(0).cast("int").alias("k"),
                (F.col("budget") / F.col("w_all")).alias("lam"),
                F.lit(float("-inf")).alias("rho"),
                F.col("min_rho").alias("rho_next"),
            )
        )
    )
    lam = (
        cand.filter((F.col("rho") <= F.col("lam")) & (F.col("lam") <= F.col("rho_next")))
        .orderBy("k")
        .limit(1)
        .select("lam")
    )
    alloc = F.floor(F.least(F.col("cap"), F.col("lam") * F.col("w"))).cast("long")
    return (
        base.join(F.broadcast(lam))
        .select(
            "source",
            F.col("n_tok").alias("n_tokens"),
            F.col("cap").cast("long").alias("cap_tokens"),
            alloc.alias("alloc_tokens"),
            "rho",
            "lam",
        )
        .select(
            "source",
            "n_tokens",
            "cap_tokens",
            "alloc_tokens",
            # exact BIGINT division like the oracle's `//`: routing
            # alloc*100 through doubles would lose integers past 2^53
            F.expr("alloc_tokens * 100 div n_tokens").alias("epochs_x100"),
            (F.col("rho") <= F.col("lam")).alias("capped"),
        )
        .orderBy("source")
    )


# q262: what would each near-dup threshold actually delete?  Reuses
# q41's lossless prefix-filtered pair discovery at the loosest
# threshold, then reports the sweep per threshold from ONE pair table.
_SWEEP = (0.5, 0.6, 0.8)

_Q262_ORACLE = f"""
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
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jac AS (
  SELECT doc_a, doc_b,
         round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS j
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {min(_SWEEP)}
), grid AS (
  SELECT CAST(unnest(ARRAY{list(_SWEEP)}) AS DOUBLE) AS t
), dropped AS (
  SELECT g.t, j.doc_b
  FROM grid g JOIN jac j ON j.j >= g.t
  GROUP BY g.t, j.doc_b
), ntok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), tot AS (
  SELECT sum(n_tok) AS corpus_tok FROM ntok
)
SELECT g.t AS threshold,
       CAST(count(d.doc_b) AS BIGINT) AS n_dropped_docs,
       CAST(coalesce(sum(n.n_tok), 0) AS BIGINT) AS dropped_tokens,
       round(coalesce(sum(n.n_tok), 0) * 1.0 / (SELECT corpus_tok FROM tot), 4)
         AS dropped_frac
FROM grid g
LEFT JOIN dropped d ON g.t = d.t
LEFT JOIN ntok n ON d.doc_b = n.doc_id
GROUP BY g.t
ORDER BY g.t
"""


@register("q262_dedup_threshold_sweep", oracle=_Q262_ORACLE)
def q262(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sweep: for each candidate Jaccard threshold
    in (0.5, 0.6, 0.8), how many documents the keep-lowest-doc_id dedup rule
    would drop and how many tokens that deletes - the what-if report
    that picks the production threshold before a corpus-scale run.

    Discovery runs ONCE at the loosest threshold through q41's
    lossless AllPairs prefix filter (operators/dedup.py:113); every
    tighter threshold is a filter over that single verified pair
    table, so the sweep costs one discovery pass regardless of grid
    size.  The drop rule (drop doc_b of any surviving pair) is the
    same greedy keep-first that exact dedup (q40) applies, stated on
    pairs so it stays one groupBy - no transitive closure needed for
    the count."""
    d = load(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_prefix_pairs(
        d.select("doc_id", "text"), threshold=min(_SWEEP)
    ).select("doc_b", "jaccard")
    grid = spark.createDataFrame(
        [(float(t),) for t in _SWEEP], "threshold double"
    )
    dropped = (
        pairs.crossJoin(F.broadcast(grid))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .select("threshold", "doc_b")
        .distinct()
    )
    # Narrow (doc_id, n_tok) projection read by two branches (the
    # dropped-token join and the corpus total); pin it so the fat text
    # column is scanned once for it, not once per branch.
    ntok = d.select(
        F.col("doc_id").alias("doc_b"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    ).localCheckpoint()
    tot = ntok.agg(F.sum("n_tok").alias("corpus_tok"))
    return (
        grid.join(dropped, "threshold", "left")
        .join(ntok, "doc_b", "left")
        .join(F.broadcast(tot))
        .groupBy("threshold")
        .agg(
            F.count("doc_b").cast("long").alias("n_dropped_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("dropped_tokens"),
            F.round(
                F.coalesce(F.sum("n_tok"), F.lit(0)) * 1.0 / F.first("corpus_tok"), 4
            ).alias("dropped_frac"),
        )
        .orderBy("threshold")
    )


# q264: SimHash distance calibration - the q259 move for the OTHER
# near-dup signature family.  md5-derived 64-bit simhash so both
# engines build identical bits; strict s > 0 makes the tie (sign sum
# exactly zero) deterministic.
_Q264_ORACLE = f"""
WITH md AS (
  SELECT greatest(1, count(*) // {_SAMPLE_TARGET}) AS md FROM documents
), samp AS (
  SELECT doc_id, text FROM documents, md WHERE doc_id % md.md = 0
), tokc AS (
  SELECT doc_id, term, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM samp)
  GROUP BY doc_id, term
), tokh AS (
  SELECT doc_id, cnt, substr(md5(term), 1, 16) AS h16 FROM tokc
), sig AS (
  SELECT doc_id, j,
         CASE WHEN sum(cnt * (2 * (
           (strpos('0123456789abcdef', substr(h16, CAST(j // 4 AS INT) + 1, 1))
             - 1) // CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
                                WHEN 2 THEN 2 ELSE 1 END % 2
         ) - 1)) > 0 THEN 1 ELSE 0 END AS bit
  FROM tokh, LATERAL UNNEST(generate_series(0, 63)) AS b(j)
  GROUP BY doc_id, j
), tok3 AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM samp
), sh AS (
  SELECT DISTINCT doc_id, s
  FROM tok3, LATERAL UNNEST(
    list_transform(
      generate_series(1, greatest(len(w) - 2, 0)),
      i -> concat_ws(' ', w[i], w[i+1], w[i+2])
    )
  ) AS t(s)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         least(CAST(floor(
           count(*) * 10.0 / (min(sa.n) + min(sb.n) - count(*))) AS BIGINT),
           9) AS jbin
  FROM sh a
  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN sizes sa ON a.doc_id = sa.doc_id
  JOIN sizes sb ON b.doc_id = sb.doc_id
  GROUP BY 1, 2
), ham AS (
  SELECT p.doc_a, p.doc_b, p.jbin,
         sum(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
  FROM pairs p
  JOIN sig x ON x.doc_id = p.doc_a
  JOIN sig y ON y.doc_id = p.doc_b AND y.j = x.j
  GROUP BY 1, 2, 3
)
SELECT CAST(jbin AS INT) AS jbin,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(hamming) * 100 // count(*) AS BIGINT) AS mean_hamming_x100,
       CAST(min(hamming) AS BIGINT) AS min_hamming,
       CAST(max(hamming) AS BIGINT) AS max_hamming
FROM ham
GROUP BY jbin
ORDER BY jbin
"""


@register("q264_simhash_hamming_calibration", oracle=_Q264_ORACLE)
def q264(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash distance calibration: Hamming-distance statistics
    (mean/min/max per true-Jaccard decile) between md5-derived 64-bit
    simhash signatures on the bounded calibration sample - the
    measurement that picks q43's production Hamming radius before a
    corpus-scale run, and the SimHash family's oracle-matched twin
    (the production kernel is numpy-fused and rows-only; any uniform
    hash gives the same distance-vs-similarity mapping, so the md5
    formulation calibrates it exactly).

    Bits are sign sums of count-weighted +-1 contributions per bit
    position, built from the md5 hex nibbles CHARACTER-wise so DuckDB
    reproduces them byte-for-byte; the tie (sign sum exactly 0) maps
    to bit 0 under strict > in both engines.  Pairs come from the
    common-shingle join inside the sample (deciles with no shingle-
    sharing pair carry no distance signal), and the Hamming sum runs
    on the 64-row-per-pair bit join - every term sample-bounded, same
    scale posture as q259."""
    d = load(spark, sf_dir, "documents")
    samp = _bounded_sample(d)
    tokc = (
        samp.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
        .select(
            "doc_id",
            "cnt",
            F.substring(F.md5(F.col("term")), 1, 16).alias("h16"),
        )
    )
    nib = (
        F.conv(
            F.expr("substring(h16, CAST(j div 4 AS INT) + 1, 1)"), 16, 10
        ).cast("int")
    )
    bit_in = (
        F.floor(
            nib
            / F.when(F.pmod("j", F.lit(4)) == 0, 8)
            .when(F.pmod("j", F.lit(4)) == 1, 4)
            .when(F.pmod("j", F.lit(4)) == 2, 2)
            .otherwise(1)
        ).cast("long")
        % 2
    )
    sig = (
        tokc.select(
            "doc_id",
            "cnt",
            "h16",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("j"),
        )
        .select(
            "doc_id",
            "j",
            (F.col("cnt") * (2 * bit_in - 1)).alias("contrib"),
        )
        .groupBy("doc_id", "j")
        .agg(
            F.when(F.sum("contrib") > 0, 1).otherwise(0).alias("bit")
        )
        .localCheckpoint()
    )
    sh = dedup.shingles(samp, "text", k=3).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    s2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    jac = (
        F.count("*") * 10.0 / (F.min("na") + F.min("nb") - F.count("*"))
    )
    pairs = (
        sh.alias("a")
        .join(s2.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_b"))
        .join(
            sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na")),
            F.col("a.doc_id") == F.col("da"),
        )
        .join(
            sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")),
            F.col("doc_b") == F.col("db"),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("doc_b"))
        .agg(
            F.least(F.floor(jac).cast("long"), F.lit(9).cast("long")).alias("jbin")
        )
    )
    sx = sig.select(F.col("doc_id").alias("doc_a"), "j", F.col("bit").alias("bx"))
    sy = sig.select(F.col("doc_id").alias("doc_b"), "j", F.col("bit").alias("by"))
    ham = (
        pairs.join(sx, "doc_a")
        .join(sy, ["doc_b", "j"])
        .groupBy("doc_a", "doc_b", "jbin")
        .agg(
            F.sum(
                F.when(F.col("bx") != F.col("by"), 1).otherwise(0)
            ).alias("hamming")
        )
    )
    return (
        ham.groupBy("jbin")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.floor(F.sum("hamming") * 100 / F.count("*"))
            .cast("long")
            .alias("mean_hamming_x100"),
            F.min("hamming").cast("long").alias("min_hamming"),
            F.max("hamming").cast("long").alias("max_hamming"),
        )
        .select(
            F.col("jbin").cast("int").alias("jbin"),
            "n_pairs",
            "mean_hamming_x100",
            "min_hamming",
            "max_hamming",
        )
        .orderBy("jbin")
    )


# q265: retrieval-quality eval over the BM25 ranker (the measurement
# loop of a RAG stack: is the lexical leg actually ranking relevant
# docs first?).  Relevance comes from a channel the bag-of-words
# ranker cannot see: graded EXACT-PHRASE matches (the query's
# consecutive bigrams, space-padded so matches are word-aligned), so
# the metrics measure how well BM25 proxies phrase relevance instead
# of trivially saturating on a small vocabulary.  Ranking = q84's
# rounded-BM25 with doc_id tiebreak.
_EVAL_QUERIES = (
    ("q1", ("scan", "merge", "hash")),
    ("q2", ("join", "filter", "sort")),
    ("q3", ("window", "stream", "batch")),
    ("q4", ("vector", "spark", "query")),
)
_EVAL_K = 10

def _eval_phrases(terms):
    return [f"{a} {b}" for a, b in zip(terms, terms[1:])]

from iceberg_daq_spark.queries.llm import BM25_B as _BM25_B
from iceberg_daq_spark.queries.llm import BM25_K1 as _BM25_K1

_Q265_QT_SQL = " UNION ALL ".join(
    f"SELECT '{qid}' AS qid, '{t}' AS term"
    for qid, terms in _EVAL_QUERIES
    for t in terms
)
_Q265_REL_SQL = " UNION ALL ".join(
    "SELECT doc_id, '{qid}' AS qid, {expr} AS rel FROM documents".format(
        qid=qid,
        expr=" + ".join(
            f"CAST(contains(' ' || text || ' ', ' {p} ') AS INT)"
            for p in _eval_phrases(terms)
        ),
    )
    for qid, terms in _EVAL_QUERIES
)
_ALL_EVAL_TERMS = tuple(sorted({t for _, ts in _EVAL_QUERIES for t in ts}))

_Q265_ORACLE = f"""
WITH qt AS (
  {_Q265_QT_SQL}
), rel AS (
  {_Q265_REL_SQL}
), t AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
), tf AS (
  SELECT doc_id, dl, w AS term, CAST(count(*) AS BIGINT) AS tf
  FROM t, UNNEST(ws) AS u(w)
  WHERE w IN {_ALL_EVAL_TERMS!r}
  GROUP BY doc_id, dl, w
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM t
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT qt.qid, tf.doc_id,
         round(sum(
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * {_BM25_K1 + 1}
           / (tf.tf + {_BM25_K1} * ({round(1 - _BM25_B, 10)} + {_BM25_B} * tf.dl / stats.avgdl))
         ), 3) AS bm25
  FROM tf
  JOIN qt USING (term)
  JOIN df USING (term)
  CROSS JOIN stats
  GROUP BY qt.qid, tf.doc_id
), ranked AS (
  SELECT s.qid, s.doc_id, s.bm25, r.rel,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY s.bm25 DESC, s.doc_id) AS rk,
         row_number() OVER (PARTITION BY s.qid
                            ORDER BY r.rel DESC, s.doc_id) AS irk
  FROM scored s JOIN rel r ON s.qid = r.qid AND s.doc_id = r.doc_id
)
SELECT qid,
       CAST(count(*) AS BIGINT) AS n_ranked,
       CAST(sum(CASE WHEN rel >= 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_relevant,
       round(coalesce(
         sum(CASE WHEN rk <= {_EVAL_K}
                  THEN (pow(2, rel) - 1) / log2(rk + 1) ELSE 0 END)
         / nullif(sum(CASE WHEN irk <= {_EVAL_K}
                    THEN (pow(2, rel) - 1) / log2(irk + 1) ELSE 0 END), 0),
         0), 4) AS ndcg10,
       round(coalesce(max(CASE WHEN rk <= {_EVAL_K} AND rel >= 1
                               THEN 1.0 / rk END), 0), 4) AS mrr10,
       round(sum(CASE WHEN rk <= {_EVAL_K} AND rel >= 1
                      THEN 1 ELSE 0 END) / {_EVAL_K}.0, 4) AS p10
FROM ranked
GROUP BY qid
ORDER BY qid
"""


@register("q265_retrieval_ndcg", oracle=_Q265_ORACLE)
def q265(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the BM25 lexical ranker (q84's
    scorer) over a fixed 4-query probe set: nDCG@10 / MRR@10 / P@10
    against graded exact-phrase relevance (count of the query's
    consecutive bigrams present word-aligned in the doc) - the eval
    harness that guards a RAG stack's retrieval leg, judged from a
    channel the bag-of-words ranker cannot see.

    ONE token-stream pass serves all queries: the exploded stream
    filters to the union of probe terms map-side, the (qid, term)
    probe table and df/corpus stats broadcast back, and the phrase-
    relevance labels come from a second map-only pass (substring
    probes on the padded text, no explode) joined to candidates on
    (qid, doc_id).  Ranking ties break on (rounded bm25, doc_id) so
    both engines rank identically; DCG/IDCG are sums of <= 10 smooth
    terms rounded to 4, far outside accumulation-order noise, with
    nDCG defined 0 when no candidate carries any phrase."""
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _EVAL_QUERIES for t in terms],
        "qid string, term string",
    )
    d = load(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    toks = F.split(F.col("text"), " ")
    # ONE narrow per-doc pass (doc_id, dl, one rel int per query)
    # pinned so the fat text column is scanned twice in total (here
    # and in the token explode below) instead of once per branch -
    # the stats and relevance branches read this tiny table
    per_doc = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("dl"),
        *[
            sum(
                (F.instr(padded, f" {p} ") > 0).cast("int")
                for p in _eval_phrases(terms)
            ).alias(f"rel_{qid}")
            for qid, terms in _EVAL_QUERIES
        ],
    ).localCheckpoint()
    rel = per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).alias("qid"), F.col(f"rel_{qid}").alias("rel")
                    )
                    for qid, _ in _EVAL_QUERIES
                ]
            )
        ).alias("qr"),
    ).select("doc_id", "qr.qid", "qr.rel")
    tf = (
        d.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .filter(F.col("term").isin(*_ALL_EVAL_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    stats = per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1) / (
        F.col("tf")
        + _BM25_K1 * ((1 - _BM25_B) + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(contrib), 3).alias("bm25"))
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    wi = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    ranked = scored.join(rel, ["qid", "doc_id"]).select(
        "*",
        F.row_number().over(wr).alias("rk"),
        F.row_number().over(wi).alias("irk"),
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1
    in_k = F.col("rk") <= _EVAL_K
    hit = F.col("rel") >= 1
    dcg = F.sum(F.when(in_k, gain / F.log2(F.col("rk") + 1)).otherwise(0.0))
    idcg = F.sum(
        F.when(F.col("irk") <= _EVAL_K, gain / F.log2(F.col("irk") + 1)).otherwise(
            0.0
        )
    )
    return (
        ranked.groupBy("qid")
        .agg(
            F.count("*").cast("long").alias("n_ranked"),
            F.sum(hit.cast("int")).cast("long").alias("n_relevant"),
            F.round(
                F.coalesce(dcg / F.nullif(idcg, F.lit(0.0)), F.lit(0.0)), 4
            ).alias("ndcg10"),
            F.round(
                F.coalesce(
                    F.max(F.when(in_k & hit, 1.0 / F.col("rk"))), F.lit(0.0)
                ),
                4,
            ).alias("mrr10"),
            F.round(
                F.sum(F.when(in_k & hit, 1).otherwise(0)) / F.lit(float(_EVAL_K)),
                4,
            ).alias("p10"),
        )
        .orderBy("qid")
    )
