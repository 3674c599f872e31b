"""Declarative data-quality constraints (the Deequ/expectations family).

A pipeline that feeds a training run needs the same gate a DAQ run
needs before data ships (reference analog: the config/metadata
validation the run scripts do before a run starts - A33/A40): declare
constraints, evaluate them ALL in as few passes as possible, emit one
violations row per constraint.

Evaluation strategy (the 100 TB shape):

- every row-level predicate check on a table folds into ONE
  conditional-aggregation pass over that table - ``sum(when(violation,
  1))`` columns are map-side combinable, so N checks cost one scan,
  not N;
- uniqueness rides the SAME pass as ``count(*) - count(distinct col)``
  (the one genuinely shuffling term - exact uniqueness is a shuffle by
  nature);
- referential checks are broadcast anti-joins counting orphans (the
  dimension side is the small one by construction);
- results union into a tiny (one row per check) report - nothing
  corpus-sized ever leaves the agg.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: exactly one of ``violation`` (a row predicate
    that flags BAD rows), ``unique_col`` (exact duplicate count), or
    ``fk`` = (dim_df, local_col, dim_col) (orphan count)."""

    table: str
    name: str
    violation: Column | None = None
    unique_col: str | None = None
    fk: tuple[DataFrame, str, str] | None = None


def run_checks(tables: dict[str, DataFrame], checks: list[Check]) -> DataFrame:
    """Evaluate all checks, one report row each:
    (table_name, check_name, n_violations, status)."""
    reports: list[DataFrame] = []
    for tname, df in tables.items():
        mine = [c for c in checks if c.table == tname]
        aggs = []
        names = []
        for c in mine:
            if c.violation is not None:
                aggs.append(
                    F.sum(F.when(c.violation, 1).otherwise(0))
                    .cast("long")
                    .alias(c.name)
                )
                names.append(c.name)
            elif c.unique_col is not None:
                aggs.append(
                    (F.count(c.unique_col) - F.countDistinct(c.unique_col))
                    .cast("long")
                    .alias(c.name)
                )
                names.append(c.name)
        if aggs:
            # ONE agg row per table, exploded into report rows - a
            # per-check select would plan the scan once per branch
            kv = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("check_name"),
                            F.col(n).alias("n_violations"),
                        )
                        for n in names
                    ]
                )
            ).alias("kv")
            reports.append(
                df.agg(*aggs)
                .select(kv)
                .select(
                    F.lit(tname).alias("table_name"),
                    F.col("kv.check_name").alias("check_name"),
                    F.col("kv.n_violations").alias("n_violations"),
                )
            )
        for c in mine:
            if c.fk is not None:
                dim, local, remote = c.fk
                orphans = df.join(
                    F.broadcast(dim.select(F.col(remote).alias(local)).distinct()),
                    local,
                    "left_anti",
                )
                reports.append(
                    orphans.agg(F.count("*").cast("long").alias("v")).select(
                        F.lit(tname).alias("table_name"),
                        F.lit(c.name).alias("check_name"),
                        F.col("v").alias("n_violations"),
                    )
                )
    if not reports:
        raise ValueError(
            "no checks matched the supplied tables: "
            f"tables={sorted(tables)} check tables="
            f"{sorted({c.table for c in checks})}"
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn(
        "status",
        F.when(F.col("n_violations") == 0, "pass").otherwise("fail"),
    )
