#!/usr/bin/env python
"""Sustained streaming-sink soak (round-10 verdict #8).

The per-round streaming bench (bench.py measure_streaming) times the
data plane over a ~4 s window; the longest streaming *test* is
seconds-scale.  This harness runs the whole ingest shape a production
deployment would sit in for hours - emulated WIB frames replayed as a
file stream, decode + TPG + watermarked TA windows, micro-batch MERGE
into a MergeTable sink with periodic compaction - for a multi-minute,
>= 50M-frame window, and records what a soak is for:

  - per-micro-batch commit cadence (durations over the whole run:
    a leak shows up as monotonically growing batch times),
  - state-store row counts per batch (the watermark must evict closed
    windows: bounded, not growing with frames ingested),
  - sink table snapshot/file counts and the compaction loop's effect
    (read amplification must stay flat),
  - end-to-end sustained throughput vs the reference's 500k frames/s
    nominal source rate,
  - exactness: emitted windows MERGE-upserted into the table must
    match the batch twin of the same aggregation over the same frames
    (modulo the final unflushed watermark tail, which is counted and
    reported, not hidden).

Usage: python tools/soak_stream.py
Env:   SOAK_FRAMES (default 50_400_000 total), SOAK_CHUNKS (128),
       SOAK_FILES_PER_TRIGGER (4), SOAK_COMPACT_EVERY (8),
       SOAK_DIR (/tmp/soak_frames), SOAK_KEEP (unset -> cleanup).

Writes one JSON line to stdout (driver-bench shape) and a readable
summary to stderr; BASELINE.md cites the recorded numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from iceberg_daq_spark.session import get_spark  # noqa: E402
from iceberg_daq_spark.streaming import plan  # noqa: E402
from iceberg_daq_spark.streaming.emulator import (  # noqa: E402
    N_CHANNELS,
    write_frame_chunks,
)
from iceberg_daq_spark.streaming.pipeline import WATERMARK, ta_stream  # noqa: E402
from iceberg_daq_spark.tablestore import MergeTable, run_stream_to_table  # noqa: E402


def main() -> None:
    total_frames = int(os.environ.get("SOAK_FRAMES", str(50_400_000)))
    n_chunks = int(os.environ.get("SOAK_CHUNKS", "128"))
    files_per_trigger = int(os.environ.get("SOAK_FILES_PER_TRIGGER", "4"))
    compact_every = int(os.environ.get("SOAK_COMPACT_EVERY", "8"))
    frames_dir = os.environ.get("SOAK_DIR", "/tmp/soak_frames")
    src_ids = list(range(24))  # the reference's 24 UDP streams
    n_frames = total_frames // len(src_ids)  # per-stream seq count

    spark = get_spark(app_name="iceberg_daq_soak")

    # ---- generate the corpus (not part of the soak timing) ----------
    t0 = time.perf_counter()
    if not os.path.isdir(frames_dir) or os.environ.get("SOAK_REGEN"):
        write_frame_chunks(
            spark, frames_dir, n_frames=n_frames, src_ids=src_ids, n_chunks=n_chunks
        )
    gen_sec = round(time.perf_counter() - t0, 1)
    frames_batch = spark.read.parquet(frames_dir)
    actual_frames = frames_batch.count()
    print(
        f"# soak corpus: {actual_frames} frames x {N_CHANNELS} ch, "
        f"{n_chunks} chunks ({gen_sec}s gen)",
        file=sys.stderr,
    )

    # ---- the soak: stream -> TA windows -> MERGE sink ---------------
    table_dir = frames_dir.rstrip("/") + "_table"
    ckpt_dir = frames_dir.rstrip("/") + "_ckpt"
    for d in (table_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    table = MergeTable(table_dir, key_cols=("src_id", "window_start"))

    tas = ta_stream(spark, frames_dir, max_files_per_trigger=files_per_trigger)
    t0 = time.perf_counter()
    q = run_stream_to_table(
        tas, table, ckpt_dir, available_now=True, compact_every=compact_every
    )
    soak_sec = time.perf_counter() - t0

    # ---- metrics from the run's progress log -------------------------
    progress = [p for p in (q.recentProgress or []) if p]
    batch_ms = [p["batchDuration"] for p in progress if p.get("numInputRows", 0) > 0]
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    # where a micro-batch spends its time (mean ms per phase):
    # addBatch = the actual plan incl. the foreachBatch merge;
    # the rest is trigger bookkeeping (offset WAL, source listing)
    phases: dict[str, int] = {}
    for p in progress:
        for k, v in (p.get("durationMs") or {}).items():
            phases[k] = phases.get(k, 0) + v
    phase_mean = {k: int(v / max(len(batch_ms), 1)) for k, v in phases.items()}
    # leak check: compare mean batch time of the first and last thirds -
    # a state/file leak shows up as a drift upward over the run
    third = max(len(batch_ms) // 3, 1)
    drift = (sum(batch_ms[-third:]) / third) / max(sum(batch_ms[:third]) / third, 1e-9)

    snapshots = table.snapshots()
    ops = [s["operation"] for s in snapshots]
    files_now = table.files(spark).count()
    # snapshots() only lists RETAINED manifests (keep_versions prunes);
    # total commit cadence = the monotonic version counter
    versions_committed = table.current_version() or 0

    # ---- exactness vs the batch twin ---------------------------------
    batch_twin = plan.ta_windows(plan.decode_hits(frames_batch))
    twin_rows = batch_twin.count()
    sink_rows = table.read(spark).count()
    # the watermark tail: windows the stream could never flush (no
    # event beyond window_end + WATERMARK arrived before end-of-input)
    max_ts = frames_batch.agg(F.max("ts")).collect()[0][0]
    wm_ms = int(WATERMARK.split()[0])  # "50 milliseconds"
    tail_rows = batch_twin.filter(
        F.col("window_end") > F.expr(
            f"timestamp'{max_ts}' - interval {wm_ms} milliseconds"
        )
    ).count()
    flushed_twin = twin_rows - tail_rows
    exact = sink_rows == flushed_twin

    out = {
        "metric": "streaming_sink_soak",
        "value": round(soak_sec, 1),
        "unit": "sec",
        "frames": actual_frames,
        "frames_per_sec": int(actual_frames / soak_sec),
        "micro_batches": len(batch_ms),
        "batch_ms": {
            "mean": int(sum(batch_ms) / max(len(batch_ms), 1)),
            "max": max(batch_ms, default=0),
            "first_third_vs_last_third": round(drift, 2),
            "phase_mean": phase_mean,
        },
        "state_rows": {
            "max": max(state_rows, default=0),
            "final": state_rows[-1] if state_rows else 0,
        },
        "sink": {
            "rows": sink_rows,
            "versions_committed": versions_committed,
            "retained_snapshots": len(snapshots),
            "retained_ops": ops,
            "live_files": files_now,
            "compact_every": compact_every,
        },
        "exact_vs_batch_twin": exact,
        "twin_rows": twin_rows,
        "watermark_tail_rows": tail_rows,
    }
    print(f"# soak: {json.dumps(out, indent=2)}", file=sys.stderr)
    print(json.dumps(out))
    if not exact:
        print(
            f"# WARNING: sink rows {sink_rows} != flushed twin {flushed_twin}",
            file=sys.stderr,
        )
        sys.exit(1)
    if not os.environ.get("SOAK_KEEP"):
        shutil.rmtree(frames_dir, ignore_errors=True)
        shutil.rmtree(table_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
