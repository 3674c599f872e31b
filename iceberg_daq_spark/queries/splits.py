"""Training-prep set operations: deterministic stratified splits and
context-window sequence packing - the two steps between a curated
corpus (q40-q96 family) and a tokenized training run.

Both are exact and seed-deterministic so re-running the pipeline on a
grown corpus reproduces identical assignments for unchanged rows
(split membership must never flap between runs - eval contamination
otherwise; cf. q65).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load

SPLIT_SALT = "split42"  # version the assignment; bump = full re-split
CTX = 128  # tokens per packed training sequence (config constant)


@register(
    "q244_stratified_split",
    oracle=f"""
    WITH ranked AS (
      SELECT source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR || ':{SPLIT_SALT}'), doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), assigned AS (
      SELECT source, n,
             CASE WHEN rn <= floor(0.8 * n) THEN 'train'
                  WHEN rn <= floor(0.8 * n) + floor(0.1 * n) THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / max(n), 4) AS frac
    FROM assigned
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split (80/10/10 per
    source): docs rank by md5(doc_id || salt) within their stratum -
    a seeded hash order both engines compute identically - and the
    split boundaries are exact floors, so every stratum's proportions
    are exact to the row, not in expectation (a bernoulli split under-
    fills small strata).  Reports per (source, split) counts and
    fractions.

    100 TB shape: the within-stratum rank comes from
    :func:`operators.ranking.grouped_rank` (two-pass range layout -
    one scalar per (partition, stratum) to the driver, broadcast
    offsets, local rank), NOT a per-stratum window, because a
    stratum is a giant group: a window's PARTITION BY source would
    sort an entire source's trillions of rows in ONE task.
    Assignment is pure (doc_id, salt) - adding new docs never moves
    an old doc between splits except at the floor boundaries of its
    stratum (the documented re-split semantics; pin SPLIT_SALT per
    corpus release to freeze assignments entirely)."""
    from iceberg_daq_spark.operators.ranking import grouped_rank

    d = load(spark, sf_dir, "documents")
    ranked = grouped_rank(
        d.select("source", "doc_id"),
        ["source"],
        [
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(f":{SPLIT_SALT}"))
            ),
            "doc_id",
        ],
    ).select(
        "source", F.col("_grank").alias("rn"), F.col("_gtotal").alias("n")
    )
    assigned = ranked.select(
        "source",
        "n",
        F.when(F.col("rn") <= F.floor(0.8 * F.col("n")), "train")
        .when(
            F.col("rn") <= F.floor(0.8 * F.col("n")) + F.floor(0.1 * F.col("n")),
            "val",
        )
        .otherwise("test")
        .alias("split"),
    )
    return (
        assigned.groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.count("*") / F.max("n"), 4).alias("frac"),
        )
        .orderBy("source", "split")
    )


_pack_schema = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
        T.StructField("n_sequences", T.LongType()),
        T.StructField("waste_tokens", T.LongType()),
        T.StructField("fill_rate", T.DoubleType()),
    ]
)


def _pack_source(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy boundary-respecting packing of one source shard, docs in
    doc_id order: a doc joins the open sequence iff it fits; an
    oversize doc (>= CTX tokens) takes ceil(n/CTX) dedicated blocks
    and closes them (its remainder block is not shared).  Sequential
    BY DESIGN - packing is order-dependent - so the shard, not the
    row, is the parallel unit (exactly how production packer jobs
    shard by input file)."""
    pdf = pdf.sort_values("doc_id")
    fill = 0
    seqs = 0
    total = 0
    for n in pdf["n_toks"].to_numpy():
        n = int(n)
        total += n
        if n >= CTX:
            seqs += -(-n // CTX)
            fill = 0
        elif fill == 0 or fill + n > CTX:
            seqs += 1
            fill = n
        else:
            fill += n
    waste = seqs * CTX - total
    # fill_rate deliberately NOT rounded here: Python round() is
    # banker's (0.69375 -> 0.6937) while both engines' SQL round is
    # half-up - the final F.round in q245 keeps the hash cross-engine
    return pd.DataFrame(
        [
            {
                "source": pdf["source"].iloc[0],
                "n_docs": len(pdf),
                "total_tokens": total,
                "n_sequences": seqs,
                "waste_tokens": waste,
                "fill_rate": (total / (seqs * CTX)) if seqs else 0.0,
            }
        ]
    )


@register(
    "q245_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ), walk AS (
      -- sequential greedy fold per source: fill = open-sequence
      -- occupancy after each doc, seqs = sequences closed-or-open
      WITH RECURSIVE w(source, rn, fill, seqs) AS (
        SELECT source, rn,
               CASE WHEN n >= {CTX} THEN 0 ELSE n END,
               CASE WHEN n >= {CTX} THEN CAST(ceil(n / {CTX}.0) AS BIGINT)
                    ELSE 1 END
        FROM toks WHERE rn = 1
        UNION ALL
        SELECT t.source, t.rn,
               CASE WHEN t.n >= {CTX} THEN 0
                    WHEN w.fill = 0 OR w.fill + t.n > {CTX} THEN t.n
                    ELSE w.fill + t.n END,
               w.seqs + CASE
                 WHEN t.n >= {CTX} THEN CAST(ceil(t.n / {CTX}.0) AS BIGINT)
                 WHEN w.fill = 0 OR w.fill + t.n > {CTX} THEN 1
                 ELSE 0 END
        FROM w JOIN toks t ON t.source = w.source AND t.rn = w.rn + 1
      )
      SELECT * FROM w
    ), finals AS (
      SELECT source, max(rn) AS n_docs,
             max_by(seqs, rn) AS n_sequences
      FROM walk GROUP BY source
    ), totals AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS total_tokens
      FROM toks GROUP BY source
    )
    SELECT f.source AS source,
           CAST(f.n_docs AS BIGINT) AS n_docs,
           t.total_tokens,
           CAST(f.n_sequences AS BIGINT) AS n_sequences,
           CAST(f.n_sequences * {CTX} - t.total_tokens AS BIGINT)
             AS waste_tokens,
           round(t.total_tokens * 1.0 / (f.n_sequences * {CTX}), 4)
             AS fill_rate
    FROM finals f JOIN totals t ON t.source = f.source
    ORDER BY f.source
    """,
)
def q245(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing report: greedy boundary-
    respecting packing of each source's docs (doc_id order) into
    CTX-token training sequences - how many sequences a training run
    gets, how many pad tokens it wastes, and the fill rate the packer
    achieves (the number a curriculum/packing change is judged by).

    Packing is inherently order-sequential (each decision depends on
    the previous fill), so the SHARD is the parallel unit: one
    applyInPandas fold per shard, exactly production packer-job
    sharding.  The driver never sees rows; per-shard output is one
    summary row.  The oracle walks the same fold as a per-source
    recursive CTE - feasible at oracle scale.

    Registered semantics pack each source as ONE shard (what the
    oracle can express); at corpus scale a source is a giant group,
    so :func:`sequence_packing` (below) sub-shards by doc_id bucket -
    packing restarts at shard boundaries, the per-shard fold stays
    bounded, and the per-source report sums its shards.  Doc/token
    counts are shard-invariant and every packing respects the
    ceil(tokens/CTX) floor (test-asserted); the sequence count itself
    may move a little either way across shardings - greedy packing is
    order-dependent, which is precisely why the shard is the
    deterministic replay unit."""
    return sequence_packing(spark, sf_dir, shards_per_source=1)


def sequence_packing(
    spark: SparkSession, sf_dir: str, shards_per_source: int = 1
) -> DataFrame:
    """q245's engine with an explicit shard count: docs hash into
    ``shards_per_source`` doc_id buckets per source, each bucket packs
    independently (the fold restarts at bucket boundaries - real
    packers shard by input file exactly like this), and the report
    sums shard outputs per source.  n_docs/total_tokens/n_sequences/
    waste_tokens are all additive across shards; only fill_rate is
    recomputed from the sums."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_toks"),
        (F.pmod(F.col("doc_id"), F.lit(shards_per_source))).alias("_shard"),
    )
    per_shard = toks.groupBy("source", "_shard").applyInPandas(
        _pack_source, _pack_schema
    )
    return (
        per_shard.groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("total_tokens"),
            F.sum("n_sequences").alias("n_sequences"),
            F.sum("waste_tokens").alias("waste_tokens"),
        )
        .withColumn(
            "fill_rate",
            F.round(
                F.col("total_tokens")
                / (F.col("n_sequences") * F.lit(CTX)).cast("double"),
                4,
            ),
        )
        .orderBy("source")
    )
