"""Mergeable deterministic quantile sketch (MRL/KLL compaction).

The sketch family next to HLL (q104), count-min (q223), and Bloom
(q224): a FIXED-SIZE summary answering any rank/quantile query within
a known rank error, mergeable across partitions - the only way a
quantile survives 100 TB without a global sort (exact percentiles stay
available through operators.ranking's two-pass layout when the answer
must be exact; the sketch is the streaming/monitoring path).

Structure: levels of value buffers; level ``l`` items carry weight
``2^l``.  When a level exceeds ``2k`` items it compacts: sort, keep
every other item, promote the survivors one level up at doubled
weight.  The classic randomized KLL flips a coin for the offset; here
the offset ALTERNATES per level (a deterministic counter), the
Manku-Rajagopalan-Lindsay '98 deterministic discipline - same
O(log^2(n/k)/k) rank-error envelope, and byte-identical results on
re-runs, which the bench/driver rows-only checks rely on.  Merging
concatenates level-wise and re-compacts, so partition sketches combine
associatively (asserted in tests).

Spark integration (``sketch_quantiles``): per-partition sketches build
inside ``mapInPandas`` (one pass, no shuffle of raw values), then the
bounded per-partition summaries - a few KB each - merge in a single
final task and the requested quantiles explode back out as rows.  The
merge input is partition-count-sized, never data-sized: the same
"bounded rows to one task" shape as the BPE trainer's one-row rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K_DEFAULT = 256
"""Items per compaction buffer: rank error ~ log^2(n/k)/k; 256 holds
worst-case observed error well under 1% on 10^6-row inputs (asserted
in tests) at ~2 KB per level."""


class MRLSketch:
    """Deterministic mergeable rank sketch.  ``levels[l]`` is an
    UNSORTED numpy value buffer whose items weigh ``2**l``; ``alt[l]``
    is the per-level compaction counter driving the alternating
    offset."""

    def __init__(self, k: int = K_DEFAULT) -> None:
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0)]
        self.alt: list[int] = [0]

    # -- building ------------------------------------------------------
    def extend(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        # feed in <=2k chunks so level-0 never balloons past one
        # compaction's worth of work
        step = 2 * self.k
        for i in range(0, len(v), step):
            self.levels[0] = np.concatenate([self.levels[0], v[i : i + step]])
            self._compact()

    def merge(self, other: "MRLSketch") -> "MRLSketch":
        assert self.k == other.k, "sketches must share k to merge"
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
            self.alt.append(0)
        for l, buf in enumerate(other.levels):
            if len(buf):
                self.levels[l] = np.concatenate([self.levels[l], buf])
        self._compact()
        return self

    def _compact(self) -> None:
        l = 0
        while l < len(self.levels):
            if len(self.levels[l]) > 2 * self.k:
                arr = np.sort(self.levels[l], kind="stable")
                off = self.alt[l] & 1
                self.alt[l] += 1
                promoted = arr[off::2]
                self.levels[l] = np.empty(0)
                if l + 1 == len(self.levels):
                    self.levels.append(np.empty(0))
                    self.alt.append(0)
                self.levels[l + 1] = np.concatenate(
                    [self.levels[l + 1], promoted]
                )
            l += 1

    # -- querying ------------------------------------------------------
    @property
    def n(self) -> int:
        return int(sum(len(b) << l for l, b in enumerate(self.levels)))

    def quantile(self, q: float) -> float:
        vals = np.concatenate([b for b in self.levels if len(b)])
        wts = np.concatenate(
            [np.full(len(b), 1 << l) for l, b in enumerate(self.levels) if len(b)]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        target = q * cum[-1]
        return float(vals[int(np.searchsorted(cum, target, side="left"))])

    # -- (de)serialization for the Spark hop ----------------------------
    def to_row(self) -> dict:
        return {
            "k": self.k,
            "lens": [len(b) for b in self.levels],
            "vals": np.concatenate(
                [b for b in self.levels] or [np.empty(0)]
            ).tolist(),
        }

    @classmethod
    def from_row(cls, k: int, lens: list[int], vals: list[float]) -> "MRLSketch":
        s = cls(k)
        s.levels, s.alt, pos = [], [], 0
        flat = np.asarray(vals, dtype=np.float64)
        for ln in lens:
            s.levels.append(flat[pos : pos + ln].copy())
            s.alt.append(0)
            pos += ln
        if not s.levels:
            s.levels, s.alt = [np.empty(0)], [0]
        return s


_ROW_SCHEMA = "k int, lens array<int>, vals array<double>"


def sketch_quantiles(
    df: DataFrame,
    col: str | Column,
    quantiles: list[float],
    k: int = K_DEFAULT,
) -> DataFrame:
    """(quantile, estimate) for ``col`` via distributed MRL sketching:
    one map pass builds a sketch per partition, the bounded summaries
    merge in a single final task (input rows = partition count), and
    each requested quantile exits as a row.  No global sort, no raw
    value shuffle; error envelope asserted in tests."""
    vals = df.select(F.col(col).cast("double").alias("v") if isinstance(col, str) else col.cast("double").alias("v"))

    def build(batches):
        s = MRLSketch(k)
        for pdf in batches:
            s.extend(pdf["v"].to_numpy())
        if s.n:
            yield pd.DataFrame([s.to_row()])

    partials = vals.mapInPandas(build, _ROW_SCHEMA)

    qs = list(quantiles)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        # shuffle delivery order is not deterministic and compaction is
        # order-sensitive; a content sort pins the merge order so
        # repeated runs produce byte-identical estimates
        pdf = pdf.assign(_key=[tuple(v) for v in pdf["vals"]]).sort_values("_key")
        out = MRLSketch(k)
        for _, row in pdf.iterrows():
            out.merge(MRLSketch.from_row(int(row["k"]), list(row["lens"]), list(row["vals"])))
        if not out.n:
            return pd.DataFrame({"quantile": [], "estimate": []})
        return pd.DataFrame(
            {"quantile": qs, "estimate": [out.quantile(q) for q in qs]}
        )

    return (
        partials.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(final, "quantile double, estimate double")
    )
