"""Skew-mitigation helpers for hot-key joins.

The data plane's natural skew source: a handful of readout streams (or
a handful of hot shingles / LSH buckets) carrying most of the rows.
Spark's AQE rebalances skewed *shuffle* partitions of sort-merge joins
at runtime, but cannot split a hot key itself - every row of one key
still lands in one task.  Salting can: the fact side spreads each key
over SALT sub-keys, the dim side is replicated SALT times, and the join
key becomes (key, salt), so a hot key fans out over SALT tasks.

The result is row-identical to the plain join (verified by the DuckDB
oracle of q59, whose SQL is the *unsalted* join): every fact row still
meets every dim row of its key exactly once, because the dim side
carries all SALT salt values for each key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join `fact` (large, possibly hot-keyed) with `dim`
    (replicable: its key-multiplicity times `salt` must be shuffle-safe)
    on `on`, spreading each fact key across `salt` shuffle sub-keys.

    fact rows get a salt from a hash of the whole row (deterministic
    across retries, unlike rand()); dim rows are exploded once per salt
    value.  Supported joins: inner / left (the dim side is the
    replicated one, so right/full would multiply unmatched dim rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    fact_salt = F.pmod(F.xxhash64(*fact.columns), F.lit(salt)).cast("int")
    f = fact.withColumn("_salt", fact_salt)
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return f.join(d, on + ["_salt"], how).drop("_salt")
