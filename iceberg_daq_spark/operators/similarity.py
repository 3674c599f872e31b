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


N_HYPERPLANES = 8


def _hyperplane_sign(dim_idx: Column, plane: int) -> Column:
    """Deterministic pseudo-random {-1,+1} component for plane x dim."""
    h = F.xxhash64(F.lit(plane), dim_idx)
    return F.when(F.pmod(h, F.lit(2)) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column) -> Column:
    """Random-hyperplane LSH bucket id (N_HYPERPLANES sign bits)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = []
    for p in range(N_HYPERPLANES):
        proj = F.aggregate(
            F.zip_with(vec, idx, lambda x, i: x * _hyperplane_sign(i, p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
    return sum(bits[1:], start=bits[0])


def lsh_ann_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: cosine evaluated only within LSH buckets.

    One narrow projection to compute buckets, then an equi-join on the
    bucket id (shuffle bounded by bucket sizes) instead of a cross
    join.  Recall vs brute force asserted in tests/test_operators.py.
    """
    n = with_norm(emb).withColumn("bucket", lsh_bucket(F.col("v")))
    a = n.select(
        F.col("vec_id").alias("qid"), F.col("v").alias("va"), F.col("norm").alias("na"), "bucket"
    )
    b = n.select(
        F.col("vec_id").alias("cid"), F.col("v").alias("vb"), F.col("norm").alias("nb"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("qid") != F.col("cid"))
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
