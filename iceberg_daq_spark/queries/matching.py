"""Q106-Q108: record matching, Pareto selection, hybrid retrieval.

Three curation-stack operators the earlier inventory lacked:

  - q106: fuzzy record matching (entity resolution) - multi-attribute
    blocking + edit-distance verification, the classic record-linkage
    shape (block -> compare -> aggregate) over the part names.
  - q107: 2-D Pareto-frontier (skyline) selection over the documents
    table - "keep every document no other document beats on BOTH
    quality and length", the multi-objective data-selection step of a
    curation pipeline, computed with a distributed prefix-max scan
    instead of the quadratic NOT EXISTS the oracle uses.
  - q108: hybrid retrieval - reciprocal-rank fusion (RRF, k=60) of the
    BM25 lexical ranking (q84's scorer) and a dense cosine ranking
    against a query embedding, the standard RAG retrieval fusion.

Reference analog: the curation/query family of SURVEY.md section 2's
LLM-pipeline extension; all scoring is JVM-side (levenshtein,
zip_with/aggregate folds), no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from iceberg_daq_spark.operators import text as T
from iceberg_daq_spark.queries.curation import _QUALITY_SQL, _STOP_SQL
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


SNM_WINDOW = 10
"""q106 sorted-neighborhood window: each record is compared with its
+-10 name-sorted neighbors WITHIN its block.  Candidate volume is
n * W unordered pairs - LINEAR in rows - where the round-8
all-pairs-per-block form was sum(|block|^2) with block sizes growing
linearly in data (the part table has a FIXED ~200 (tok1, brand)
blocks, so 10x rows meant 100x comparisons; at 100 TB it was q117's
disease again).  Classic Hernandez-Stolfo merge/purge; the window is
mirrored verbatim in the DuckDB oracle."""

NEAREST_D_CAP = 8
"""q106 reports the nearest non-identical edit distance only within
this bound (NULL beyond it).  The cap IS the contract - an ER
pipeline only acts on near-matches, and an uncapped min forces the
full O(len^2) Levenshtein DP on every candidate pair; with the cap
Spark runs the banded O(cap*len) form (levenshtein's threshold
argument), ~4x less verify compute on ~30-char names.  Mirrored in
the oracle via CASE WHEN d <= cap."""


@register(
    "q106_fuzzy_match",
    oracle=f"""
    WITH t AS (
      SELECT p_partkey, p_name, p_brand,
             split_part(p_name, ' ', 1) AS tok1
      FROM part
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY tok1, p_brand ORDER BY p_name, p_partkey) AS rn
      FROM t
    ), p AS (
      SELECT a.p_partkey AS k, levenshtein(a.p_name, b.p_name) AS d
      FROM r a JOIN r b
        ON a.tok1 = b.tok1 AND a.p_brand = b.p_brand
       AND b.rn BETWEEN a.rn - {SNM_WINDOW} AND a.rn + {SNM_WINDOW}
       AND a.rn <> b.rn
    )
    SELECT k AS p_partkey,
           CAST(count(*) FILTER (WHERE d = 0) AS BIGINT) AS n_exact,
           CAST(count(*) FILTER (WHERE d BETWEEN 1 AND 4) AS BIGINT) AS n_near,
           CAST(min(CASE WHEN d BETWEEN 1 AND {NEAREST_D_CAP} THEN d END)
                AS BIGINT) AS nearest_d
    FROM p
    GROUP BY k
    ORDER BY p_partkey
    """,
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record matching (entity resolution) over part names:
    multi-attribute blocking on (first name token, brand), then
    SORTED-NEIGHBORHOOD matching inside each block - order by name
    and Levenshtein-verify each record against its +-SNM_WINDOW
    neighbors only - aggregated to per-record match statistics
    (exact-duplicate count, near-match count at edit distance 1-4,
    nearest non-identical distance within NEAREST_D_CAP).

    100 TB shape: candidates are n * W unordered pairs, LINEAR in
    data (the all-pairs-per-block form is quadratic once block sizes
    grow with the corpus, which they do here - the blocking
    vocabulary is fixed).  The within-block ranks come from
    :func:`operators.ranking.grouped_rank` (two-pass range layout -
    no single-task giant block anywhere), and the neighbor join is an
    EQUI join on (block, rn-bucket): each unordered pair is generated
    ONCE at its lower-rank endpoint (a.rn < b.rn <= a.rn + W, so the
    probe side replicates each row into only its own and the previous
    W-width bucket - 2x constant fan-out) and verified ONCE; the
    per-record stats then come from exploding each pair to both
    endpoints, which is map-side.  Levenshtein is the JVM built-in in
    its BANDED form (threshold = NEAREST_D_CAP, O(cap*len) per pair
    instead of O(len^2)) behind a free equality short-circuit for the
    d=0 duplicates - half the pairs and ~4x cheaper verification than
    the symmetric full-DP layout, identical output."""
    from iceberg_daq_spark.operators.ranking import grouped_rank

    t = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("tok1"),
    )
    r = grouped_rank(t, ["tok1", "p_brand"], ["p_name", "p_partkey"]).withColumnRenamed(
        "_grank", "rn"
    )
    bkt = F.floor(F.col("rn") / SNM_WINDOW)
    a = r.withColumn("_bkt", bkt).alias("a")
    b = r.withColumn("_bkt", F.explode(F.array(bkt - 1, bkt))).alias("b")
    d = F.when(F.col("a.p_name") == F.col("b.p_name"), F.lit(0)).otherwise(
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), NEAREST_D_CAP)
    )
    pairs = a.join(
        b,
        (F.col("a.tok1") == F.col("b.tok1"))
        & (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a._bkt") == F.col("b._bkt"))
        & (F.col("b.rn") > F.col("a.rn"))
        & (F.col("b.rn") <= F.col("a.rn") + SNM_WINDOW),
    ).select(
        F.explode(
            F.array(
                F.struct(F.col("a.p_partkey").alias("k")),
                F.struct(F.col("b.p_partkey").alias("k")),
            )
        ).alias("e"),
        d.alias("d"),
    ).select(F.col("e.k").alias("k"), "d")
    return (
        pairs.groupBy("k")
        .agg(
            F.count(F.when(F.col("d") == 0, 1)).cast("bigint").alias("n_exact"),
            F.count(F.when(F.col("d").between(1, 4), 1))
            .cast("bigint")
            .alias("n_near"),
            # banded levenshtein returns -1 past the cap; BETWEEN 1
            # AND cap excludes both it and the d=0 exacts
            F.min(F.when(F.col("d").between(1, NEAREST_D_CAP), F.col("d")))
            .cast("bigint")
            .alias("nearest_d"),
        )
        .select(F.col("k").alias("p_partkey"), "n_exact", "n_near", "nearest_d")
        .orderBy("p_partkey")
    )


@register(
    "q107_pareto_frontier",
    oracle="""
    WITH tok AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
    ), s AS (
      SELECT doc_id, {quality} AS q,
             CAST(len(w) AS BIGINT) AS n_tokens
      FROM tok
    )
    SELECT a.doc_id, a.q AS quality, a.n_tokens
    FROM s a
    WHERE NOT EXISTS (
      SELECT 1 FROM s b
      WHERE (b.q > a.q AND b.n_tokens >= a.n_tokens)
         OR (b.q >= a.q AND b.n_tokens > a.n_tokens)
    )
    ORDER BY quality DESC, doc_id
    """.format(quality=_QUALITY_SQL.format(stop=_STOP_SQL)),
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier (skyline) document selection: keep every
    document no other document dominates on BOTH quality score and
    token count - the multi-objective "best data" selection step
    (quality vs. length here; quality vs. diversity in production).

    The oracle states the contract quadratically (NOT EXISTS over all
    pairs); the Spark plan is the O(n) scan shape that survives 100 TB:

      1. reduce to one row per distinct (rounded) quality value with
         the group's max token count - a partial-agg shuffle that
         collapses the corpus to <=1001 rows (quality rounds to 3
         decimals in [0,1], so the reduced set is bounded by
         construction, NOT by data size),
      2. :func:`operators.ranking.prefix_max` over quality-descending
         order gives each quality level the running max token count of
         all strictly-better / at-least-as-good levels (two-pass range
         layout - no single-partition window),
      3. broadcast the reduced frontier table back and keep rows
         neither condition dominates: an earlier level already reached
         your token count (strict) or any >=-level exceeds it (incl).

    Dominance is evaluated on the SAME rounded quality both engines
    emit, so the frontier sets agree bit-for-bit."""
    from iceberg_daq_spark.operators.ranking import prefix_max

    d = load(spark, sf_dir, "documents")
    w = T.words(F.col("text"))
    s = d.select(
        "doc_id",
        T.quality_score(F.col("text"), w).alias("q"),
        F.size(w).cast("bigint").alias("n_tokens"),
    )
    per_q = s.groupBy("q").agg(F.max("n_tokens").alias("mq"))
    pm = prefix_max(
        per_q, [F.desc("q")], "mq", out_incl="incl", out_strict="strict"
    )
    dominated = (F.col("strict") >= F.col("n_tokens")) | (
        F.col("incl") > F.col("n_tokens")
    )
    return (
        s.join(F.broadcast(pm.select("q", "incl", "strict")), "q")
        .filter(~F.coalesce(dominated, F.lit(False)))
        .select("doc_id", F.col("q").alias("quality"), "n_tokens")
        .orderBy(F.desc("quality"), "doc_id")
    )


@register(
    "q108_hybrid_rrf",
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
    ), bm AS (
      SELECT tf.doc_id,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))
             ), 3) AS bm25
      FROM tf JOIN df USING (term) CROSS JOIN stats
      GROUP BY tf.doc_id
    ), btop AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn_b
      FROM bm QUALIFY rn_b <= 50
    ), v AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
                              (acc, x) -> acc + x)) AS norm
      FROM v
    ), qv AS (
      SELECT v, norm FROM n WHERE vec_id = 0
    ), sc AS (
      SELECT n.vec_id,
             round(list_reduce(
               list_prepend(0.0, list_transform(generate_series(1, len(n.v)),
                                                i -> n.v[i] * qv.v[i])),
               (acc, x) -> acc + x) / (n.norm * qv.norm), 6) AS cos
      FROM n CROSS JOIN qv
    ), dtop AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY cos DESC, vec_id) AS rn_d
      FROM sc QUALIFY rn_d <= 50
    )
    SELECT COALESCE(btop.doc_id, dtop.doc_id) AS doc_id,
           CAST(btop.rn_b AS BIGINT) AS bm25_rank,
           CAST(dtop.rn_d AS BIGINT) AS cos_rank,
           round(COALESCE(1.0 / (60 + btop.rn_b), 0)
                 + COALESCE(1.0 / (60 + dtop.rn_d), 0), 5) AS rrf
    FROM btop FULL OUTER JOIN dtop ON btop.doc_id = dtop.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 20
    """,
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (RRF, k=60) of the
    BM25 lexical top-50 (q84's scorer, shared via
    :func:`llm.bm25_scores`) and the dense cosine top-50 against a
    query embedding (vec_id 0's vector standing in for the encoded
    query; the embeddings table holds the corpus's vectors keyed by
    doc id).  The standard RAG fusion: rrf = sum over legs of
    1/(60 + rank), a full outer join of the two candidate lists.

    100 TB shape: each leg reduces to a FIXED top-K (TakeOrdered, not
    a global sort) before any ranking window, so the fusion operates
    on <=2K rows however large the corpus - the windows and the outer
    join are bounded by construction.  The dense leg is a map-only
    zip_with/aggregate fold against the broadcast query vector (one
    row), and the lexical leg's plan is q84's (term filter before any
    shuffle, broadcast df/stats).  Cosine is rounded to 6 decimals
    BEFORE ranking on both engines so rank order is ulp-stable."""
    from iceberg_daq_spark.queries.llm import bm25_scores

    bm = (
        bm25_scores(spark, sf_dir, ["scan", "merge", "hash"])
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(50)
    )
    # ranking windows below run over <=50 rows by construction (post-
    # limit), so the unpartitioned window is bounded, not a scale risk
    wb = Window.orderBy(F.desc("bm25"), "doc_id")
    btop = bm.select(
        "doc_id", F.row_number().over(wb).cast("bigint").alias("bm25_rank")
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    n = emb.withColumn("norm", norm(F.col("v")))
    qv = n.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sc = n.crossJoin(F.broadcast(qv)).select(
        "vec_id", F.round(dot / (F.col("norm") * F.col("qnorm")), 6).alias("cos")
    )
    dtop50 = sc.orderBy(F.desc("cos"), "vec_id").limit(50)
    wd = Window.orderBy(F.desc("cos"), "vec_id")
    dtop = dtop50.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).cast("bigint").alias("cos_rank"),
    )

    rrf = F.round(
        F.coalesce(1.0 / (60 + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (60 + F.col("cos_rank")), F.lit(0.0)),
        5,
    )
    return (
        btop.join(dtop, "doc_id", "full_outer")
        .select("doc_id", "bm25_rank", "cos_rank", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(20)
    )


_PR_ITER_SQL = """
    , i{k} AS (
      SELECT ed.dst AS id, sum(r{j}.r / ed.deg) AS inc
      FROM r{j} JOIN ed ON r{j}.id = ed.src
      GROUP BY ed.dst
    ), r{k} AS (
      SELECT d.doc_id AS id,
             0.15 / nn.n + 0.85 * COALESCE(i{k}.inc, 0) AS r
      FROM documents d CROSS JOIN nn LEFT JOIN i{k} ON i{k}.id = d.doc_id
    )
"""


@register(
    "q109_pagerank",
    oracle="""
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    e0 AS (
      SELECT doc_id AS src, (doc_id * 7 + 1) % nn.n AS dst
      FROM documents CROSS JOIN nn
      UNION ALL
      SELECT doc_id AS src, (doc_id * 13 + 5) % nn.n AS dst
      FROM documents CROSS JOIN nn
    ), e1 AS (
      SELECT src,
             CASE WHEN dst = src THEN (src + 1) % nn.n ELSE dst END AS dst
      FROM e0 CROSS JOIN nn
    ), e AS (
      SELECT DISTINCT src, dst FROM e1
    ), deg AS (
      SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), ed AS (
      SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)
    ), r0 AS (
      SELECT doc_id AS id, 1.0 / nn.n AS r FROM documents CROSS JOIN nn
    )
    {i1} {i2} {i3}
    SELECT r3.id AS doc_id, round(r3.r * nn.n, 6) AS rank_rel
    FROM r3 CROSS JOIN nn
    ORDER BY rank_rel DESC, doc_id
    LIMIT 20
    """.format(
        i1=_PR_ITER_SQL.format(k=1, j=0),
        i2=_PR_ITER_SQL.format(k=2, j=1),
        i3=_PR_ITER_SQL.format(k=3, j=2),
    ),
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) over a deterministic
    citation graph derived from the corpus (each document links to
    two affine-map neighbors; self-loops remapped so out-degree >= 1
    and no mass dangles) - the link-authority scorer of a web-corpus
    curation stack, scored by :func:`operators.graph.pagerank`.

    The oracle UNROLLS the same three iterations in SQL; the Spark
    side is the real iterative operator - one equi-join + one
    partial-agg shuffle per round, both keyed on the node id (the
    partitioning is reused round to round), lineage checkpointed so
    the plan stays flat however many rounds run.  Ranks are reported
    relative to N (sum ~ N) rounded to 6 so cross-engine float
    summation cannot flip the hash: in-degrees here are ~2, so each
    rank is a sum of <=3 addends - no long-chain reassociation."""
    from iceberg_daq_spark.operators.graph import pagerank

    d = load(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    nodes = d.select(F.col("doc_id").alias("id"))

    def target(mult: int, add: int) -> F.Column:
        t = (F.col("doc_id") * mult + add) % n
        return F.when(t == F.col("doc_id"), (F.col("doc_id") + 1) % n).otherwise(t)

    e = (
        d.select(F.col("doc_id").alias("src"), target(7, 1).alias("dst"))
        .union(d.select(F.col("doc_id").alias("src"), target(13, 5).alias("dst")))
        .distinct()
    )
    ranks = pagerank(nodes, e, iterations=3, damping=0.85)
    return (
        ranks.select(
            F.col("id").alias("doc_id"),
            F.round(F.col("rank") * n, 6).alias("rank_rel"),
        )
        .orderBy(F.desc("rank_rel"), "doc_id")
        .limit(20)
    )


CELL_MEMBER_MAX = 64
"""q117 co-presence valve: per-(event_type, day) cell member cap.

Cell occupancy grows linearly with data (every user active on a type
that day lands in one cell), so an unvalved pair build is quadratic
and - because each cell is a near-clique - the downstream wedge stage
is CUBIC in occupancy.  The valve keeps, per cell, the
CELL_MEMBER_MAX members with the smallest (md5(user_id), user_id) -
a deterministic, engine-agnostic sample (Spark and DuckDB md5 agree
byte-for-byte on the decimal string form) - bounding pairs per cell
at C(64,2)=2016 and wedges at C(64,3) whatever the data volume.
Same valve shape as LSH_BUCKET_MAX (operators/similarity.py) and the
shingle df_max cap (operators/dedup.py); mirrored IDENTICALLY in the
DuckDB oracle so the hash check verifies the valved graph itself
(at sf0.01 max cell occupancy is ~67, so the valve ENGAGES at oracle
scale and its behavior is hash-checked, not just asserted)."""


# the valved co-presence edge CTE, shared verbatim by every oracle
# that consumes the graph (q117, q128) - MUST stay in lockstep with
# copresence_edges() below
_COPRESENCE_CTE = f"""cells AS (
      SELECT DISTINCT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             user_id
      FROM events
    ), kept AS (
      SELECT event_type, d, user_id
      FROM cells
      QUALIFY row_number() OVER (
        PARTITION BY event_type, d
        ORDER BY md5(CAST(user_id AS VARCHAR)), user_id
      ) <= {CELL_MEMBER_MAX}
    ), e AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM kept a
      JOIN kept b ON a.event_type = b.event_type AND a.d = b.d
                 AND a.user_id < b.user_id
    )"""


@register(
    "q117_triangle_count",
    oracle=f"""
    WITH {_COPRESENCE_CTE}, nodes AS (
      SELECT u AS id FROM e UNION SELECT v FROM e
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes)  AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e)      AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
              FROM e e1
              JOIN e e2 ON e2.u = e1.v
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)  AS n_triangles
    """,
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the user co-presence graph (users who
    acted on the same event type the same day are linked) - the
    clustering-structure probe of social/interaction analytics, and
    the third graph primitive next to connected components and
    PageRank.

    The Spark side is :func:`operators.graph.triangle_count`:
    degree-ordered orientation generates each wedge at its
    smallest-(degree, id) corner, bounding per-node fan-out by
    O(sqrt(m)) instead of the hot vertex's degree^2 - THE difference
    between finishing and dying on a power-law graph at 100 TB.  The
    oracle counts the same triangles with the naive a<b<c three-way
    self-join, which is fine at oracle scale; both count each
    triangle exactly once so the totals agree.

    Edge construction pre-reduces the event stream to DISTINCT
    (type, day, user) cells, then applies the CELL_MEMBER_MAX valve
    (see module constant above): keep the 64 smallest-md5 members per
    cell before pairing.  Without the valve, cell occupancy - and
    therefore pair fan-out (occupancy^2) and wedge fan-out
    (occupancy^3, the cells are near-cliques) - grows linearly with
    data volume; with it, per-cell work is a constant.  The
    row_number + <= filter compiles to WindowGroupLimit (per-partition
    top-k, no full sort), and the valve is mirrored verbatim in the
    oracle SQL so both engines count triangles of the SAME graph.
    Day is epoch-day arithmetic - no timezone-dependent truncation."""
    from iceberg_daq_spark.operators.graph import triangle_count

    return triangle_count(copresence_edges(load(spark, sf_dir, "events")))


def copresence_edges(e: DataFrame, pin: bool = True) -> DataFrame:
    """The valved user co-presence edge list (u < v, deduplicated) -
    the shared graph substrate of q117 (triangles), q128 (degree
    distribution), q133 (BFS) and q157 (k-core).  See the
    CELL_MEMBER_MAX note above for the valve contract; the oracle SQL
    of every consumer mirrors it verbatim.  ``pin=False`` returns the
    un-materialized plan (tests assert the valve/join shape on it;
    consumers take the default pinned stage)."""
    cells = e.select(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400).cast("bigint").alias("d"),
        "user_id",
    ).distinct()
    w = Window.partitionBy("event_type", "d").orderBy(
        F.md5(F.col("user_id").cast("string")), "user_id"
    )
    kept = (
        cells.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= CELL_MEMBER_MAX)
        .drop("_rn")
    )
    a, b = kept.alias("a"), kept.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    if not pin:
        return edges
    # pin the substrate ONCE (the q162 pattern): the consumers
    # reference the edge list many times (triangle_count alone seven
    # times - degrees, orientation, wedge closure, counts), and
    # without the pin every reference re-derives the events scan +
    # valve + pair join (the r12 plan audit charged q117 28 scans /
    # 82 exchanges for what is one bounded edge list)
    return edges.localCheckpoint()


@register(
    "q128_degree_distribution",
    oracle=f"""
    WITH {_COPRESENCE_CTE}, deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
      GROUP BY id
    )
    SELECT degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 2) AS pct_nodes
    FROM deg
    GROUP BY degree
    ORDER BY degree
    """,
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the user co-presence graph: how many
    nodes have each degree, with the share of the node population -
    the first diagnostic run on any social/interaction graph (is it
    power-law? where is the hub tail the skew valves must absorb?),
    and the fourth graph primitive next to connected components
    (q57), PageRank (q109), and triangles (q117).

    100 TB shape: degrees are one partial-agg shuffle over the edge
    list (each endpoint contributes once via the union), and the
    histogram is a second partial agg over the degree table - node-
    not edge-sized.  The percent-of-total window runs over the
    HISTOGRAM (at most max-degree rows, bounded by CELL_MEMBER_MAX x
    cells-per-user - never data-sized), so the unpartitioned window
    is safe by construction.  Shares the valved
    :func:`copresence_edges` substrate with q117 - the oracle reuses
    the identical edge CTE."""
    edges = copresence_edges(load(spark, sf_dir, "events"))
    deg = (
        edges.select(F.col("u").alias("id"))
        .unionAll(edges.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count("*").cast("bigint").alias("n_nodes"))
    return (
        hist.withColumn(
            "pct_nodes",
            F.round(
                F.col("n_nodes") * 100.0 / F.sum("n_nodes").over(Window.partitionBy()),
                2,
            ),
        )
        .orderBy("degree")
    )


@register(
    "q133_bfs_reach",
    oracle=f"""
    WITH RECURSIVE {_COPRESENCE_CTE}, sym AS (
      SELECT u AS s, v AS t FROM e
      UNION ALL
      SELECT v AS s, u AS t FROM e
    ), walk(id, h) AS (
      SELECT (SELECT min(u) FROM e), 0
      UNION
      SELECT sym.t, walk.h + 1
      FROM walk JOIN sym ON sym.s = walk.id
      WHERE walk.h < 8
    )
    SELECT id, CAST(min(h) AS BIGINT) AS hops
    FROM walk GROUP BY id
    ORDER BY hops, id
    """,
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the lowest-id vertex of the user
    co-presence graph - the fourth graph primitive next to connected
    components (q57), PageRank (q109) and triangles (q117), and the
    substrate of "degrees of separation" / influence-radius
    analytics.

    The Spark side is :func:`operators.graph.bfs_hops`: per-round
    frontier-only expansion (join the LAST round's discoveries
    against the symmetrized edge list, anti-join the visited set,
    localCheckpoint to flatten lineage), so per-round cost is
    frontier-adjacent edges, total rounds is the graph eccentricity
    (capped at 8), and nothing vertex-sized ever collects to the
    driver.  The oracle walks the same graph with a recursive CTE -
    UNION-dedup on (id, hops) pairs, min(hops) per id - which is
    exact BFS at oracle scale.  Both sides share the valved
    co-presence edge CTE (CELL_MEMBER_MAX), so they traverse the
    SAME graph."""
    from iceberg_daq_spark.operators.graph import bfs_hops

    edges = copresence_edges(load(spark, sf_dir, "events"))
    return bfs_hops(edges, seed=None, max_hops=8).orderBy("hops", "id")


@register("q157_kcore")
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition summary of the user co-presence graph:
    iteratively peel vertices below degree k until the maximal
    subgraph where everyone keeps k neighbors remains - the
    community-density primitive (next to components/PageRank/
    triangles/BFS) that finds the stable interaction core behind
    power-user analysis.

    Rows-only for the driver: the peeling fixed point is not
    expressible in (non-recursive) SQL; exact semantics are asserted
    in tests on hand-built graphs (a path has an empty 2-core; a
    triangle plus tails IS its own 2-core) plus an invariant check
    here - every surviving vertex's induced degree >= k.  The Spark
    side is :func:`operators.graph.k_core`: per-round degree agg +
    two semi-joins over a monotonically shrinking, checkpointed edge
    list; rounds bound by peeling depth.  k = 48 sits below the
    valved graph's typical cell-clique degree (CELL_MEMBER_MAX - 1 =
    63) so the core is non-trivial but strictly smaller than the
    graph."""
    from iceberg_daq_spark.operators.graph import k_core

    edges = copresence_edges(load(spark, sf_dir, "events"))
    core = k_core(edges, k=48)
    nodes = edges.select(F.col("u").alias("id")).unionAll(
        edges.select(F.col("v").alias("id"))
    ).distinct()
    core_nodes = core.select(F.col("u").alias("id")).unionAll(
        core.select(F.col("v").alias("id"))
    ).distinct()
    return (
        nodes.agg(F.count("*").cast("bigint").alias("n_nodes"))
        .crossJoin(edges.agg(F.count("*").cast("bigint").alias("n_edges")))
        .crossJoin(
            core_nodes.agg(F.count("*").cast("bigint").alias("n_core_nodes"))
        )
        .crossJoin(core.agg(F.count("*").cast("bigint").alias("n_core_edges")))
        .select(
            F.lit(48).cast("bigint").alias("k"),
            "n_nodes",
            "n_edges",
            "n_core_nodes",
            "n_core_edges",
        )
    )
