"""Similarity search over embedding columns (array<float>).

Two paths per the north-star contract:

  brute-force   exact cosine top-k / near-dup: block-scored against a
                broadcast embedding matrix, numpy per Arrow batch
  lsh_ann       random-hyperplane LSH bucketing; cosine evaluated only
                on bucket-collision candidates - the 100 TB path
                (bucket join instead of cross join; recall measured
                against brute force in tests)

Float discipline: the DuckDB oracle computes dot products as a
sequential left fold (list_reduce).  numpy's dot/matmul uses pairwise
summation - different rounding.  All scoring here therefore uses
``(a*b).cumsum()[..., -1]``: cumulative sum is sequential by
definition, so every double is bit-identical to the oracle's fold and
ranks/thresholds can never diverge.

Scale shape: the embedding matrix is broadcast to executors (the
"small dim table" of similarity search - 64-dim f32 at 1e8 vectors is
~25 GB; beyond broadcast range, swap the broadcast for a block-
partitioned B-side join, same per-block numpy).  Scoring shuffles only
(qid, cid) id pairs, never vectors.

Hyperplanes are a seeded driver-side {-1,+1} matrix broadcast to the
executors, so there is no per-executor random state and replays are
exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over array<double> columns
    (Catalyst HOF form - used where the input is a Column expression;
    bit-identical to the numpy cumsum used in the batch paths)."""
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


def _seq_dot_block(M: np.ndarray, a: np.ndarray) -> np.ndarray:
    """fold-order dot of one query row against every matrix row:
    elementwise products then cumsum (sequential summation, matching
    the SQL fold bit-for-bit; np.dot's pairwise summation would not)."""
    return (M * a[None, :]).cumsum(axis=1)[:, -1]


def _broadcast_matrix(emb: DataFrame):
    """Collect (ids, matrix, norms) once and broadcast to executors.
    Norms use the same cumsum fold as the oracle's sqrt(list_reduce)."""
    rows = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    norms = np.sqrt((M * M).cumsum(axis=1)[:, -1])
    return emb.sparkSession.sparkContext.broadcast((ids, M, norms))


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the query side across the full core count.  The
    embeddings table is one small parquet file locally (1-2 scan
    partitions), which would serialize the per-partition numpy scoring;
    on a cluster the same call spreads a skewed scan."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("cid", T.LongType()),
        T.StructField("rk", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)


def cosine_topk_bruteforce(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for every vector.

    Plan: queries stay partitioned; each partition scores its rows
    against the broadcast matrix and emits ONLY its k winners - no
    quadratic pair materialization, no global window shuffle (the
    former cross-join + row_number plan was 20x slower at sf0.1).
    Ordering ties break by ascending cid, same as the oracle's
    row_number() OVER (ORDER BY cos DESC, cid).
    """
    bc = _broadcast_matrix(emb)

    def topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, M, norms = bc.value
        for pdf in batches:
            out_q, out_c, out_r, out_s = [], [], [], []
            for qid, v in zip(pdf["vec_id"].to_numpy(), pdf["v"]):
                a = np.asarray(v, dtype=np.float64)
                na = np.sqrt((a * a).cumsum()[-1])
                cos = _seq_dot_block(M, a) / (na * norms)
                mask = ids != qid
                cand_ids, cand_cos = ids[mask], cos[mask]
                if len(cand_cos) > k:
                    # full-sorting all candidates is the hot spot; select
                    # everything >= the kth score (ties included so the
                    # (cos DESC, cid ASC) boundary tie-break stays exact),
                    # then order only that small set
                    kth = np.partition(cand_cos, len(cand_cos) - k)[len(cand_cos) - k]
                    sel = cand_cos >= kth
                    cand_ids, cand_cos = cand_ids[sel], cand_cos[sel]
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                out_q.extend([qid] * len(order))
                out_c.extend(cand_ids[order])
                out_r.extend(range(1, len(order) + 1))
                out_s.extend(np.round(cand_cos[order], 3))
            if out_q:
                yield pd.DataFrame(
                    {"qid": out_q, "cid": out_c, "rk": out_r, "cos_sim": out_s}
                )

    q = _spread(emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
    return q.mapInPandas(topk, _TOPK_SCHEMA)


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("qid", T.LongType()),
        T.StructField("cid", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)


def cosine_near_dup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (qid < cid,
    cos >= threshold) - the dedup-by-embedding path of the north-star
    contract.  Same broadcast-block plan as top-k; each partition
    emits only its above-threshold pairs."""
    bc = _broadcast_matrix(emb)
    thr = float(threshold)

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, M, norms = bc.value
        for pdf in batches:
            out = []
            for qid, v in zip(pdf["vec_id"].to_numpy(), pdf["v"]):
                a = np.asarray(v, dtype=np.float64)
                na = np.sqrt((a * a).cumsum()[-1])
                cos = _seq_dot_block(M, a) / (na * norms)
                sel = (ids > qid) & (cos >= thr)
                if sel.any():
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": qid,
                                "cid": ids[sel],
                                "cos_sim": np.round(cos[sel], 3),
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    q = _spread(emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
    return q.mapInPandas(pairs, _PAIR_SCHEMA)


N_TABLES = 8  # independent hash tables
BITS_PER_TABLE = 6  # sign bits per table
_LSH_SEED = 42

_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("tbl", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ]
)


def _hyperplane_matrix(dim: int) -> np.ndarray:
    """Deterministic {-1,+1} hyperplane matrix, (dim, tables*bits).
    Seeded on the driver and broadcast - executors share one copy and
    replays are exact (no per-executor random state)."""
    rng = np.random.default_rng(_LSH_SEED)
    return rng.choice(np.array([-1.0, 1.0]), size=(dim, N_TABLES * BITS_PER_TABLE))


def _bucket_rows(emb: DataFrame) -> DataFrame:
    """(vec_id, tbl, bucket) - one row per hash table per vector.

    All N_TABLES * BITS_PER_TABLE projections are one numpy matmul per
    Arrow batch against a broadcast hyperplane matrix (the earlier
    Catalyst formulation - an aggregate/zip_with fold with an xxhash64
    per element per bit - was ~20x slower at sf0.1).  Multiple short
    tables instead of one long code: recall comes from table count,
    selectivity from bit count per table.
    """
    dim = len(emb.select("embedding").first()["embedding"])
    bc_h = emb.sparkSession.sparkContext.broadcast(_hyperplane_matrix(dim))

    def buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H = bc_h.value
        weights = 1 << np.arange(BITS_PER_TABLE, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            bits = (V @ H > 0).reshape(len(pdf), N_TABLES, BITS_PER_TABLE)
            codes = (bits * weights).sum(axis=2)  # (n, N_TABLES)
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, N_TABLES),
                    "tbl": np.tile(np.arange(N_TABLES, dtype=np.int32), len(pdf)),
                    "bucket": codes.reshape(-1),
                }
            )

    q = _spread(emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
    return q.mapInPandas(buckets, _BUCKET_SCHEMA)


def _candidate_pairs(emb: DataFrame, symmetric: bool) -> DataFrame:
    """(qid, cid) pairs colliding in >=1 LSH table.  symmetric=True
    keeps both (a,b) and (b,a) (top-k needs per-query candidates);
    False keeps qid < cid (near-dup pairs)."""
    n = _bucket_rows(emb)
    a = n.select(F.col("vec_id").alias("qid"), "tbl", "bucket")
    b = n.select(F.col("vec_id").alias("cid"), "tbl", "bucket")
    cond = F.col("qid") != F.col("cid") if symmetric else F.col("qid") < F.col("cid")
    return a.join(b, ["tbl", "bucket"]).filter(cond).select("qid", "cid").distinct()


def _score_pairs(pairs: DataFrame, bc) -> DataFrame:
    """Score (qid, cid) id pairs against the broadcast matrix - only
    ids ever shuffle; vectors ride the broadcast."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, M, norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qi = np.searchsorted(ids, pdf["qid"].to_numpy())
            ci = np.searchsorted(ids, pdf["cid"].to_numpy())
            prods = M[qi] * M[ci]
            dots = prods.cumsum(axis=1)[:, -1]
            cos = dots / (norms[qi] * norms[ci])
            yield pd.DataFrame(
                {"qid": pdf["qid"], "cid": pdf["cid"], "cos_sim": cos}
            )

    return pairs.mapInPandas(score, _PAIR_SCHEMA)


def lsh_ann_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Approximate top-k: cosine evaluated only on candidates that
    collide in >=1 of the N_TABLES LSH tables.

    Plan: one projection computes all table buckets, explode to
    (table, bucket), equi-join on them (shuffle bounded by bucket
    occupancy), dedupe candidate id pairs, score against the broadcast
    matrix, per-query top-k.  No cross join anywhere.  Recall vs brute
    force asserted in tests.
    """
    from pyspark.sql import Window

    bc = _broadcast_matrix(emb)
    scored = _score_pairs(_candidate_pairs(emb, symmetric=True), bc)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", F.col("rk").cast("long").alias("rk"), F.round("cos_sim", 3).alias("cos_sim"))
    )


N_CELLS = 16  # IVF coarse-quantizer cells
N_PROBE = 3  # cells probed per query
_IVF_ITERS = 10
_IVF_TRAIN_CAP = 100_000  # quantizer training sample bound


def _ivf_centroids(vecs: DataFrame) -> np.ndarray:
    """Spherical k-means coarse quantizer, (N_CELLS, dim), L2-normalized.

    Trained on a bounded deterministic sample collected to the driver
    (sorted by a hash of vec_id, capped at _IVF_TRAIN_CAP) with Lloyd's
    iterations in numpy - the standard IVF practice (e.g. faiss trains
    its coarse quantizer on a sample, typically 30-250x the cell
    count): quantizer quality needs a representative sample, not the
    corpus, so the fit never scales with table size.  Assignment of the
    full corpus stays distributed in ivf_ann_topk."""
    sample = (
        vecs.orderBy(F.xxhash64("vec_id"))
        .limit(_IVF_TRAIN_CAP)
        .collect()
    )
    V = np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    order = np.argsort([r["vec_id"] for r in sample])  # seed deterministically
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn[order[:N_CELLS]].copy()
    for _ in range(_IVF_ITERS):
        cells = (Vn @ C.T).argmax(axis=1)
        for c in range(N_CELLS):
            members = Vn[cells == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    return C


def ivf_ann_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """IVF approximate top-k: spherical-kmeans cells as the coarse
    quantizer; each vector posts to its nearest cell, each query probes
    its N_PROBE nearest cells, candidates come from a (cell) equi-join,
    then exact cosine + per-query top-k.

    The IVF counterpart of lsh_ann_topk: recall comes from nprobe
    rather than table count, and cell occupancy (~N/N_CELLS) bounds the
    join fanout.  At 100 TB the posting lists are the partition layout
    (write the table bucketed by cell) so probing is partition pruning,
    not a shuffle.  Recall vs brute force asserted in tests.
    """
    from pyspark.sql import Window

    # cached: scanned once, then reused by every Lloyd's iteration and
    # the final probe pass
    vecs = _spread(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).cache()
    C = _ivf_centroids(vecs)
    sc = emb.sparkSession.sparkContext
    bc_c = sc.broadcast(C)
    post_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("probe_rank", T.IntegerType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cb = bc_c.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = Vn @ Cb.T
            top = np.argsort(-sims, axis=1)[:, :N_PROBE].astype(np.int32)
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, N_PROBE),
                    "cell": top.reshape(-1),
                    "probe_rank": np.tile(np.arange(N_PROBE, dtype=np.int32), len(ids)),
                }
            )

    probes = vecs.mapInPandas(probe, post_schema)
    posts = probes.filter(F.col("probe_rank") == 0).select(
        F.col("vec_id").alias("cid"), "cell"
    )
    queries = probes.select(F.col("vec_id").alias("qid"), "cell")
    cand = (
        queries.join(posts, "cell")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )
    bc = _broadcast_matrix(emb)
    scored = _score_pairs(cand, bc)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", F.col("rk").cast("long").alias("rk"), F.round("cos_sim", 3).alias("cos_sim"))
    )


def lsh_near_dup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """LSH-pruned embedding near-dup: candidates from bucket collisions
    only, then exact-cosine verified (same cumsum fold), so precision
    is 1 by construction and recall is bounded by table collision
    probability (measured in tests).  At 100 TB this is the only
    viable shape: the shuffle is bounded by bucket occupancy, never
    |E|^2, and only id pairs shuffle."""
    bc = _broadcast_matrix(emb)
    scored = _score_pairs(_candidate_pairs(emb, symmetric=False), bc)
    return scored.filter(F.col("cos_sim") >= float(threshold)).select(
        "qid", "cid", F.round("cos_sim", 3).alias("cos_sim")
    )
