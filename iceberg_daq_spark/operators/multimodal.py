"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's data plane already treats detector payloads as opaque
binary envelopes with typed metadata around them (WIB frame payloads,
SURVEY section 1.1.2; HDF5 blobs, section 1.1.4).  This module
generalizes that envelope to media blobs for LLM-pipeline workloads:

    (id, payload: binary, meta: struct<format,width,height,channels,...>)

All heavy work runs in Arrow-batched ``mapInPandas`` - numpy over whole
record batches, never per-row Python - so the same plumbing scales to a
real cluster: payloads stay in executor memory, nothing collects to the
driver, and partitioning by id carries through.

Container caveat: no image/audio codec libraries are installed, so the
*codec* is a deterministic fake format ("FIMG"/"FAUD": header + raw
array) generated from the documents table; ``decode_external`` is the
clearly-marked stub where PIL / soundfile / av would plug in.  The
Spark-side plumbing - schemas, batch iteration, UDF signatures,
partition behavior - is real and tested.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fake format magic tags (4 bytes) + little-endian u16 dims header
_IMG_MAGIC = b"FIMG"  # u16 width, u16 height, u16 channels, then u8 pixels
_AUD_MAGIC = b"FAUD"  # u32 n_samples, u16 rate_hz/100, then s16 PCM
_VID_MAGIC = b"FVID"  # u16 n_frames, u16 width, u16 height, then u8 frames

META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the (doc_id, n_chars) input across the full core
    count before blob synthesis: the local single-file parquet scan
    yields 1-2 partitions, which would serialize every numpy stage
    downstream (synth -> decode -> resize all inherit the partitioning
    through mapInPandas).  On a cluster the same call spreads a skewed
    scan; the shuffled rows are two scalars each, so the exchange is
    noise next to the per-blob work."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def _img_dims(doc_id: np.ndarray, n_chars: np.ndarray):
    """Deterministic image dims from document columns (oracle-reproducible):
    width 8..39, height 8..23, channels 1 or 3."""
    width = (n_chars % 32 + 8).astype(np.int64)
    height = (doc_id % 16 + 8).astype(np.int64)
    channels = np.where(doc_id % 2 == 0, 3, 1).astype(np.int64)
    return width, height, channels


def synth_image_blobs(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload, meta): deterministic fake images.

    Pixel (i) = (doc_id * 31 + i * 7) % 251 - pure arithmetic, so any
    downstream stat has a closed form the tests can verify without a
    codec library.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", META_SCHEMA),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_id = pdf["doc_id"].to_numpy()
            n_chars = pdf["n_chars"].to_numpy()
            w, h, c = _img_dims(doc_id, n_chars)
            payloads, metas = [], []
            for d, wi, hi, ci in zip(doc_id, w, h, c):
                n_px = int(wi * hi * ci)
                px = ((d * 31 + np.arange(n_px, dtype=np.int64) * 7) % 251).astype(np.uint8)
                blob = _IMG_MAGIC + _struct.pack("<HHH", int(wi), int(hi), int(ci)) + px.tobytes()
                payloads.append(blob)
                metas.append(
                    {
                        "format": "fimg",
                        "width": int(wi),
                        "height": int(hi),
                        "channels": int(ci),
                        "n_frames": 1,
                        "n_bytes": len(blob),
                    }
                )
            yield pd.DataFrame({"doc_id": doc_id, "payload": payloads, "meta": metas})

    return _spread(docs.select("doc_id", "n_chars")).mapInPandas(gen, out_schema)


_IMG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("max_px", T.IntegerType()),
        T.StructField("min_px", T.IntegerType()),
    ]
)


def decode_image_stats(blobs: DataFrame) -> DataFrame:
    """Parse the FIMG header + compute per-image pixel stats (numpy over
    the Arrow batch; the feature-extract step of an image pipeline)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, blob in zip(pdf["doc_id"].to_numpy(), pdf["payload"]):
                assert bytes(blob[:4]) == _IMG_MAGIC, "not a FIMG payload"
                w, h, c = _struct.unpack("<HHH", bytes(blob[4:10]))
                px = np.frombuffer(blob, dtype=np.uint8, offset=10)
                rows.append(
                    {
                        "doc_id": d,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "mean_px": float(px.mean()),
                        "max_px": int(px.max()),
                        "min_px": int(px.min()),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, _IMG_STATS_SCHEMA)


def resize_images(blobs: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h), emitting new FIMG
    payloads - the resize stage of an image pipeline, numpy indexing per
    Arrow batch (a codec library would swap in at the marked line)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", META_SCHEMA),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for d, blob in zip(pdf["doc_id"].to_numpy(), pdf["payload"]):
                w, h, c = _struct.unpack("<HHH", bytes(blob[4:10]))
                px = np.frombuffer(blob, dtype=np.uint8, offset=10).reshape(h, w, c)
                # nearest-neighbor index grid (PIL.Image.resize goes here)
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
                small = px[yi, xi, :]
                blob2 = _IMG_MAGIC + _struct.pack("<HHH", out_w, out_h, c) + small.tobytes()
                ids.append(d)
                payloads.append(blob2)
                metas.append(
                    {
                        "format": "fimg",
                        "width": out_w,
                        "height": out_h,
                        "channels": int(c),
                        "n_frames": 1,
                        "n_bytes": len(blob2),
                    }
                )
            if ids:
                yield pd.DataFrame({"doc_id": ids, "payload": payloads, "meta": metas})

    return blobs.mapInPandas(resize, out_schema)


def synth_video_blobs(docs: DataFrame, frame_w: int = 8, frame_h: int = 8) -> DataFrame:
    """documents -> fake FVID payloads: n_frames = n_chars % 24 + 4
    frames of frame_w x frame_h u8 pixels (frame f pixel i =
    (doc_id + f * 13 + i) % 251)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", META_SCHEMA),
        ]
    )
    fsz = frame_w * frame_h

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for d, nc in zip(pdf["doc_id"].to_numpy(), pdf["n_chars"].to_numpy()):
                nf = int(nc % 24 + 4)
                idx = np.arange(nf * fsz, dtype=np.int64)
                px = ((d + (idx // fsz) * 13 + (idx % fsz)) % 251).astype(np.uint8)
                blob = _VID_MAGIC + _struct.pack("<HHH", nf, frame_w, frame_h) + px.tobytes()
                ids.append(d)
                payloads.append(blob)
                metas.append(
                    {
                        "format": "fvid",
                        "width": frame_w,
                        "height": frame_h,
                        "channels": 1,
                        "n_frames": nf,
                        "n_bytes": len(blob),
                    }
                )
            if ids:
                yield pd.DataFrame({"doc_id": ids, "payload": payloads, "meta": metas})

    return _spread(docs.select("doc_id", "n_chars")).mapInPandas(gen, out_schema)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def sample_video_frames(blobs: DataFrame, every_k: int = 5) -> DataFrame:
    """Frame sampling: explode every k-th frame of each FVID payload to
    its own row (the clip/keyframe-extraction stage).  One input row
    fans out to ceil(n_frames / k) rows; partitioning by doc_id is
    preserved through mapInPandas (no shuffle)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, blob in zip(pdf["doc_id"].to_numpy(), pdf["payload"]):
                assert bytes(blob[:4]) == _VID_MAGIC, "not a FVID payload"
                nf, w, h = _struct.unpack("<HHH", bytes(blob[4:10]))
                fsz = w * h
                px = np.frombuffer(blob, dtype=np.uint8, offset=10)
                for f in range(0, nf, every_k):
                    frame = px[f * fsz : (f + 1) * fsz]
                    rows.append(
                        {
                            "doc_id": d,
                            "frame_no": f,
                            "n_frames": nf,
                            "frame": frame.tobytes(),
                            "mean_px": float(frame.mean()),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return blobs.mapInPandas(sample, _FRAME_SCHEMA)


def synth_audio_blobs(docs: DataFrame, rate_hz: int = 16000) -> DataFrame:
    """documents -> fake FAUD payloads: n_chars*4 samples of s16 PCM,
    sample i = ((doc_id * 7 + i * 11) % 4001) - 2000."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("rate_hz", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, counts = [], [], []
            for d, nc in zip(pdf["doc_id"].to_numpy(), pdf["n_chars"].to_numpy()):
                n = int(nc) * 4
                pcm = (((d * 7 + np.arange(n, dtype=np.int64) * 11) % 4001) - 2000).astype(np.int16)
                blob = _AUD_MAGIC + _struct.pack("<IH", n, rate_hz // 100) + pcm.tobytes()
                ids.append(d)
                payloads.append(blob)
                counts.append(n)
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "payload": payloads, "n_samples": counts, "rate_hz": rate_hz}
                )

    return _spread(docs.select("doc_id", "n_chars")).mapInPandas(gen, out_schema)


_AUD_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_stats(blobs: DataFrame) -> DataFrame:
    """PCM decode + loudness features (duration, RMS, peak) per blob."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, blob in zip(pdf["doc_id"].to_numpy(), pdf["payload"]):
                assert bytes(blob[:4]) == _AUD_MAGIC, "not a FAUD payload"
                n, rate100 = _struct.unpack("<IH", bytes(blob[4:10]))
                pcm = np.frombuffer(blob, dtype="<i2", offset=10).astype(np.int64)
                # integer sum of squares -> exact, summation-order-free;
                # the sqrt-of-ratio is then bit-stable across engines
                sumsq = int((pcm * pcm).sum())
                rows.append(
                    {
                        "doc_id": d,
                        "n_samples": n,
                        "duration_s": n / (rate100 * 100.0),
                        "rms": float(np.sqrt(sumsq / n)) if n else 0.0,
                        "peak": int(np.abs(pcm).max()) if n else 0,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, _AUD_STATS_SCHEMA)


def decode_external(blobs: DataFrame, fmt: str) -> DataFrame:
    """STUB: real-codec decode (JPEG/PNG via PIL, WAV/FLAC via
    soundfile, MP4 via av).  The batch plumbing above is identical for
    real formats - only the per-blob parse line changes.  Raises until
    a codec library is installed; gated on import so the module itself
    never requires one."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"no codec library available in this environment for format={fmt!r}; "
            "install pillow/soundfile/av and swap the parse line in "
            "decode_image_stats/decode_audio_stats"
        ) from exc
    raise NotImplementedError("real-codec path intentionally unimplemented in this container")
