"""Interval/range join operators.

The reference's readout-window collection (A19,
iceberg_daq_eth.json:252-258) joins every buffered frame whose
timestamp falls in [t_trigger - before, t_trigger + after] to the
trigger decision - with no equi key (a trigger collects frames from
ALL streams).

A naive theta join is a broadcast nested loop: O(frames x triggers)
comparisons.  The scale-correct plan is time bucketization:

  - frames get bucket = floor(ts / B)
  - each trigger explodes into ceil((before+after)/B)+1 candidate
    buckets covering its window
  - equi-join on bucket (hash join, shuffle bounded by bucket width),
    then the exact range predicate as a residual filter

With B >= before+after each trigger lands in <= 2 buckets, so the
duplication factor is tiny and Catalyst plans a plain shuffled hash /
sort-merge join that AQE can also skew-split - this survives 100x
scale-up where the nested loop does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    frames: DataFrame,
    triggers: DataFrame,
    frame_ts: str,
    trigger_ts: str,
    before_us: int,
    after_us: int,
    bucket_us: int | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Join frames to triggers on f.ts in [t.ts - before, t.ts + after].

    Timestamps are compared at microsecond precision (exact for the
    tick-derived data).  ``extra_keys`` adds equi-join keys (e.g. the
    stream id) on top of the bucket.
    """
    window_us = before_us + after_us
    bucket_us = bucket_us or max(window_us, 1)
    n_buckets = window_us // bucket_us + 2  # cover both window edges

    f_us = F.unix_micros(F.col(frame_ts))
    t_us = F.unix_micros(F.col(trigger_ts))

    f = frames.withColumn("_bucket", (f_us / bucket_us).cast("long"))
    t = triggers.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                ((t_us - before_us) / bucket_us).cast("long"),
                ((t_us - before_us) / bucket_us).cast("long") + n_buckets - 1,
            )
        ),
    ).filter(
        # drop candidate buckets past the window end
        F.col("_bucket") * bucket_us <= t_us + after_us
    )

    keys = ["_bucket"] + (extra_keys or [])
    joined = f.join(t, keys).filter(
        (F.unix_micros(F.col(frame_ts)) >= F.unix_micros(F.col(trigger_ts)) - before_us)
        & (F.unix_micros(F.col(frame_ts)) <= F.unix_micros(F.col(trigger_ts)) + after_us)
    )
    return joined.drop("_bucket")
