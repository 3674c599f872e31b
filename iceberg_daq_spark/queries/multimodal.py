"""Q50-Q53: multimodal-column pipeline (north-star extensions).

Image/audio/video as opaque binary + typed metadata over the documents
table (the WIB frame envelope generalized - SURVEY section 1.1.2).
Payloads are the deterministic fake codecs from operators/multimodal.py
(no media libraries in this container), so every structural quantity -
dims, frame counts, byte sizes, PCM stats - has a closed form the
DuckDB oracle reproduces with plain arithmetic.  Pixel-level stats that
need the decode itself (q51) are rows-only for the driver and verified
against the closed form in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.operators import multimodal as mm
from iceberg_daq_spark.registry import register
from iceberg_daq_spark.tables import load


@register(
    "q50_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'fimg' AS format,
           CAST(n_chars % 32 + 8 AS INT) AS width,
           CAST(doc_id % 16 + 8 AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
           CAST(10 + (n_chars % 32 + 8) * (doc_id % 16 + 8)
                   * (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END) AS BIGINT) AS n_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-envelope metadata plumbing: synthesize image blobs and
    project the typed meta struct (format/dims/size travel with the
    opaque payload, never requiring a decode to answer)."""
    d = load(spark, sf_dir, "documents")
    blobs = mm.synth_image_blobs(d)
    return blobs.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.n_bytes").alias("n_bytes"),
    ).orderBy("doc_id")


@register("q51_image_decode_stats", oracle=None)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction + resize chain: FIMG payloads
    decoded to pixel stats, then resized 4x4 and re-decoded (the
    feature-extract stage of an image training pipeline; all numpy over
    Arrow batches).  Rows-only for the driver; tests check the
    closed-form pixel values."""
    d = load(spark, sf_dir, "documents")
    # both consumers (full-res stats and the resize chain) read the
    # synthesized blob table - cache it so synthesis runs once, not once
    # per join side (the self-join-recompute trap)
    blobs = mm.synth_image_blobs(d).cache()
    full = mm.decode_image_stats(blobs).select(
        "doc_id", "width", "height", "channels",
        F.round("mean_px", 3).alias("mean_px"), "max_px", "min_px",
    )
    small = mm.decode_image_stats(mm.resize_images(blobs, 4, 4)).select(
        F.col("doc_id").alias("s_doc_id"),
        F.round("mean_px", 3).alias("resized_mean_px"),
    )
    return (
        full.join(small, full.doc_id == small.s_doc_id)
        .drop("s_doc_id")
        .orderBy("doc_id")
    )


@register(
    "q52_video_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(n_chars % 24 + 4 AS INT) AS n_frames,
           CAST((n_chars % 24 + 4 + 4) // 5 AS BIGINT) AS n_sampled,
           CAST(((n_chars % 24 + 4 + 4) // 5) * 64 AS BIGINT) AS sampled_bytes
    FROM documents
    ORDER BY doc_id
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every 5th frame of each FVID payload
    exploded to a row (map-side fan-out, no shuffle), then re-aggregated
    per document.  ceil(n_frames/5) keyframes, 8x8 u8 frames."""
    d = load(spark, sf_dir, "documents")
    frames = mm.sample_video_frames(mm.synth_video_blobs(d), every_k=5)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.first("n_frames").alias("n_frames"),
            F.count("*").alias("n_sampled"),
            F.sum(F.length("frame")).alias("sampled_bytes"),
        )
        .orderBy("doc_id")
    )


@register(
    "q53_audio_stats",
    oracle="""
    WITH pcm AS (
      SELECT doc_id,
             n_chars * 4 AS n,
             list_transform(generate_series(0, n_chars * 4 - 1),
                            i -> ((doc_id * 7 + i * 11) % 4001) - 2000) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_samples,
           -- n divisible by 4 => n/16000 has <= 5 exact decimal digits,
           -- so rounding at 6 can never hit a half-way tie (ties at 4
           -- decimals split HALF_UP vs HALF_EVEN across engines)
           round(n / 16000.0, 6) AS duration_s,
           round(sqrt(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    list_transform(s, x -> CAST(x * x AS BIGINT))),
                                  (a, x) -> a + x) * 1.0 / n), 3) AS rms,
           CAST(list_reduce(s, (a, x) -> greatest(abs(a), abs(x))) AS INT) AS peak
    FROM pcm
    ORDER BY doc_id
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + loudness features: s16 PCM payloads to
    (duration, RMS, peak).  RMS uses an exact int64 sum of squares so
    the value is identical regardless of summation order or engine."""
    d = load(spark, sf_dir, "documents")
    stats = mm.decode_audio_stats(mm.synth_audio_blobs(d))
    return stats.select(
        "doc_id",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 3).alias("rms"),
        "peak",
    ).orderBy("doc_id")


@register("q263_image_phash_neardup", oracle=None)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup image pairs: 64-bit pHash (grayscale ->
    8x8 DCT -> median-threshold bits) over the synthetic FIMG blobs,
    paired via 16-bit chunk banding with exact xor/popcount
    verification at Hamming radius 3 - exact dedup (q40) extended to
    the image column, where byte equality misses re-encoded copies.

    Rows-only by design (DCT + median thresholding is not
    SQL-expressible); exactness vs the brute-force all-pairs Hamming
    scan and the banding recall guarantee are asserted in
    tests/test_multimodal.py.  Scale shape: hash is map-only over
    payloads (one 64-bit row per image leaves the scan), the band
    join shuffles hash rows keyed (chunk, value), fanout is bucket
    occupancy - the simhash/q43 posture on the binary column."""
    d = load(spark, sf_dir, "documents")
    blobs = mm.synth_image_blobs(d)
    return mm.phash_neardup_pairs(blobs).orderBy("doc_a", "doc_b")
