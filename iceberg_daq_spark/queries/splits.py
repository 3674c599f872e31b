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
from pyspark.sql import DataFrame, SparkSession, Window
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

    100 TB shape: one shuffle on the stratum key + one window pass;
    strata are few and the hash order spreads any stratum skew across
    its partition's sort, not across executors.  Assignment is pure
    (doc_id, salt) - adding new docs never moves an old doc between
    splits except at the floor boundaries of its stratum (the
    documented re-split semantics; pin SPLIT_SALT per corpus release
    to freeze assignments entirely)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SPLIT_SALT}"))),
        "doc_id",
    )
    wn = Window.partitionBy("source")
    ranked = d.select(
        "source",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
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
    applyInPandas fold per source, exactly production packer-job
    sharding.  The driver never sees rows; per-shard output is one
    summary row.  The oracle walks the same fold as a per-source
    recursive CTE - feasible at oracle scale, and the engine path is
    the one that scales (shards process in parallel, each fold is one
    linear pass)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    )
    return (
        toks.groupBy("source")
        .applyInPandas(_pack_source, _pack_schema)
        .withColumn("fill_rate", F.round("fill_rate", 4))
        .orderBy("source")
    )
