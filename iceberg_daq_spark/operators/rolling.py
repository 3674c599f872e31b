"""Bounded-memory rolling windows over few-giant-group data.

``avg(x) OVER (PARTITION BY g ORDER BY t ROWS n PRECEDING)`` puts each
GROUP in one task: for a metric stream with 5 event types and billions
of rows, that is 5 tasks however large the cluster (the caveat q103
documents).  The distributed layout implemented here:

  1. exact within-group ranks via the two-pass range layout
     (:func:`ranking.grouped_rank` - no single-task group anywhere),
  2. chunk each group by rank (``chunk = (rank-1) // chunk_size``),
  3. replicate each chunk's LAST ``window`` rows into the next chunk
     as context (rank-contiguous, so a chunk + its context hold every
     trailing-window predecessor of every own row),
  4. one Arrow-batched pass per (group, chunk) computes the trailing
     stats with numpy prefix sums and emits own rows only.

Parallelism = total rows / chunk_size, independent of group count;
per-task memory = chunk_size + window rows.  The context replication
costs ``window / chunk_size`` extra shuffle volume (2% at the
defaults).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_daq_spark.operators.ranking import grouped_rank

DEFAULT_CHUNK = 65536


def rolling_stats(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column | str],
    value_col: str,
    window: int,
    chunk_size: int = DEFAULT_CHUNK,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` plus ``mu`` / ``sd`` / ``n_prev`` over the TRAILING
    ``window`` rows per (part_cols) group under order_cols, current
    row excluded - the frame ``ROWS BETWEEN window PRECEDING AND 1
    PRECEDING``.  ``sd`` is the sample standard deviation (NULL when
    n_prev < 2, matching stddev_samp).  Exact equivalence to the
    single-task window formulation is test-asserted."""
    if chunk_size < window:
        raise ValueError(f"chunk_size {chunk_size} must be >= window {window}")
    # SQL NULL and a genuine NaN double both surface as NaN after the
    # Arrow transfer to pandas, but their window semantics differ
    # (NULL is SKIPPED by avg/stddev_samp; NaN is a VALUE that
    # propagates to NaN).  Flag NULLs Spark-side, where the two are
    # still distinguishable, so the pandas pass can honor both.
    df0 = df.withColumn("_rs_isnull", F.col(value_col).isNull())
    ranked = grouped_rank(df0, part_cols, order_cols, num_partitions)
    chunk = F.floor((F.col("_grank") - 1) / chunk_size).cast("bigint")
    own = ranked.withColumn("_chunk", chunk).withColumn("_own", F.lit(True))
    # context: a chunk's last `window` rows ride along into the next
    # chunk (only when a next chunk exists)
    pos_in_chunk = ((F.col("_grank") - 1) % chunk_size) + 1
    ctx = (
        ranked.filter(
            (pos_in_chunk > chunk_size - window)
            & (chunk + 1 <= F.floor((F.col("_gtotal") - 1) / chunk_size))
        )
        .withColumn("_chunk", chunk + 1)
        .withColumn("_own", F.lit(False))
    )
    both = own.unionByName(ctx)

    keep = [c for c in df.columns]
    # pandas->Arrow treats float NaN as SQL NULL on the way OUT of
    # applyInPandas, so genuine NaNs cannot be emitted directly: the
    # pandas stage returns NULL plus boolean nan flags, and the
    # wrapper restores the NaNs Spark-side (including the VALUE
    # column's own passthrough, using the _rs_isnull flag to tell an
    # input NaN from an input NULL).
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [
            "mu double", "sd double", "n_prev bigint",
            "_rs_isnull boolean", "_mu_nan boolean", "_sd_nan boolean",
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_grank")
        raw = pdf[value_col].to_numpy(dtype=np.float64)
        # NULL-skipping to match avg/stddev_samp window semantics:
        # sums run over zero-filled values, a separate prefix count of
        # VALID rows supplies the divisor, so a NULL neither poisons
        # the cumulative sums nor counts toward mu/sd - while n_prev
        # stays count(*) over the frame (rows, not valid values).
        # Genuine NaN DOUBLES are not NULLs: they count as valid
        # values and any frame containing one yields NaN (the
        # value-semantics avg/stddev_samp have), tracked by a third
        # prefix count so the poisoning stays frame-local instead of
        # leaking through the cumulative sums.
        isnull = pdf["_rs_isnull"].to_numpy(dtype=bool)
        valid = ~isnull
        nanv = valid & np.isnan(raw)
        v = np.where(valid & ~nanv, raw, 0.0)
        m = len(v)
        cs = np.concatenate(([0.0], np.cumsum(v)))
        cs2 = np.concatenate(([0.0], np.cumsum(v * v)))
        cn = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
        cnan = np.concatenate(([0], np.cumsum(nanv.astype(np.int64))))
        idx = np.arange(m)
        lo = np.maximum(idx - window, 0)
        n_prev = (idx - lo).astype(np.int64)
        nv = cn[idx] - cn[lo]  # valid (non-null) rows in the frame
        fnan = cnan[idx] - cnan[lo]  # genuine-NaN values in the frame
        s = cs[idx] - cs[lo]
        s2 = cs2[idx] - cs2[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = s / nv
            var = (s2 - s * s / nv) / (nv - 1)
            sd = np.sqrt(np.maximum(var, 0.0))
        ownmask = pdf["_own"].to_numpy()
        res = pdf.loc[ownmask, keep].copy()
        np_o, nv_o, mu_o, sd_o = n_prev[ownmask], nv[ownmask], mu[ownmask], sd[ownmask]
        fn_o = fnan[ownmask]
        # NULL (not NaN) below the frame minimums, matching avg /
        # stddev_samp window semantics (gated on VALID count: avg is
        # NULL when every frame row is NULL, stddev below 2 values).
        # Frames CONTAINING a NaN value flag it instead of emitting it
        # (Arrow would null it out) - restored by the wrapper below.
        res["mu"] = [
            float(x) if (c >= 1 and f == 0) else None
            for x, c, f in zip(mu_o, nv_o, fn_o)
        ]
        res["sd"] = [
            float(x) if (c >= 2 and f == 0) else None
            for x, c, f in zip(sd_o, nv_o, fn_o)
        ]
        res["n_prev"] = np_o
        res["_rs_isnull"] = isnull[ownmask]
        res["_mu_nan"] = (fn_o > 0) & (nv_o >= 1)
        res["_sd_nan"] = (fn_o > 0) & (nv_o >= 2)
        return res

    out = both.groupBy(*part_cols, "_chunk").applyInPandas(stats, out_schema)
    nan = F.lit(float("nan"))
    return (
        out.withColumn(
            value_col,
            F.when(
                F.col(value_col).isNull() & ~F.col("_rs_isnull"), nan
            ).otherwise(F.col(value_col)),
        )
        .withColumn("mu", F.when(F.col("_mu_nan"), nan).otherwise(F.col("mu")))
        .withColumn("sd", F.when(F.col("_sd_nan"), nan).otherwise(F.col("sd")))
        .drop("_rs_isnull", "_mu_nan", "_sd_nan")
    )
