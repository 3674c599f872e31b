"""Similarity search over embedding columns (array<float>).

Two paths per the north-star contract:

  brute-force   exact cosine top-k: fact x fact join with the dot
                product as a sequential left fold (bit-exact twin of
                the DuckDB oracle's list_reduce)
  lsh_ann       random-hyperplane LSH bucketing; cosine evaluated only
                within buckets - the 100 TB path (bucket join instead
                of cross join; recall measured against brute force in
                tests)

Hyperplanes are derived deterministically from xxhash64 so executors
need no shared random state and replays are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over array<double> columns.

    Deliberately NOT a tree reduction: fold order fixes float
    associativity so the DuckDB oracle (list_reduce over the same
    arrays) produces bit-identical doubles.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        "vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("norm")
    )


def cosine_topk_bruteforce(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for every vector.

    Pair generation is a cross join - correct baseline, quadratic.  At
    scale, replace with lsh_ann_topk (same output contract, bounded
    candidate sets).
    """
    n = with_norm(emb)
    a = n.select(F.col("vec_id").alias("qid"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = n.select(F.col("vec_id").alias("cid"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    pairs = a.join(b, F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid",
        "cid",
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "cid",
            F.col("rk").cast("long").alias("rk"),
            F.round("cos", 3).alias("cos_sim"),
        )
    )


N_TABLES = 8  # independent hash tables
BITS_PER_TABLE = 4  # sign bits per table


def _hyperplane_sign(dim_idx: Column, plane: int) -> Column:
    """Deterministic pseudo-random {-1,+1} component for plane x dim."""
    h = F.xxhash64(F.lit(plane), dim_idx)
    return F.when(F.pmod(h, F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _table_bucket(vec: Column, table: int) -> Column:
    """Bucket id in one hash table (BITS_PER_TABLE sign bits)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    def _mul_with_plane(plane: int):
        # closure factory: pyspark HOF lambdas must take exactly 2 args
        return lambda x, i: x * _hyperplane_sign(i, plane)

    bits = []
    for b in range(BITS_PER_TABLE):
        proj = F.aggregate(
            F.zip_with(vec, idx, _mul_with_plane(table * BITS_PER_TABLE + b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    return sum(bits[1:], start=bits[0])


def lsh_buckets(vec: Column) -> Column:
    """array of (table, bucket) structs - N_TABLES independent
    random-hyperplane hash tables.  Multiple short tables instead of
    one long code: collision probability for true neighbors compounds
    per-bit, so recall comes from table count, selectivity from bit
    count per table."""
    return F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), _table_bucket(vec, t).alias("bucket"))
            for t in range(N_TABLES)
        ]
    )


def lsh_ann_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: cosine evaluated only on candidates that
    collide in >=1 of the N_TABLES LSH tables.

    Plan: one projection computes all table buckets, explode to
    (table, bucket), equi-join on them (shuffle bounded by bucket
    occupancy), dedupe candidate pairs, score once.  No cross join
    anywhere.  Recall vs brute force asserted in tests.
    """
    n = with_norm(emb).withColumn("bb", F.explode(lsh_buckets(F.col("v")))).select(
        "vec_id", "v", "norm", F.col("bb.tbl").alias("tbl"), F.col("bb.bucket").alias("bucket")
    )
    a = n.select(F.col("vec_id").alias("qid"), "tbl", "bucket")
    b = n.select(F.col("vec_id").alias("cid"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    vecs = with_norm(emb)
    scored = (
        cand.join(
            vecs.select(F.col("vec_id").alias("qid"), F.col("v").alias("va"), F.col("norm").alias("na")),
            "qid",
        )
        .join(
            vecs.select(F.col("vec_id").alias("cid"), F.col("v").alias("vb"), F.col("norm").alias("nb")),
            "cid",
        )
        .select(
            "qid",
            "cid",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "cid",
            F.col("rk").cast("long").alias("rk"),
            F.round("cos", 3).alias("cos_sim"),
        )
    )
