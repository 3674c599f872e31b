"""Differential oracle harness: run a registered query on Spark and its
SQL on DuckDB over the same parquet tables, compare canonicalized rows.

Mirrors the driver's CORRECTNESS check: sort columns by name, compare
row multisets order-insensitively, with doubles rounded before compare
(both sides already round in the query definitions; the harness adds a
1e-9 tolerance on top so a representation difference is distinguishable
from a semantic one).
"""

from __future__ import annotations

import datetime as dt
import math
import os
from collections import Counter

import duckdb

from iceberg_daq_spark.tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        only_s = list((cs - cd).items())[:3]
        only_d = list((cd - cs).items())[:3]
        return False, f"value mismatch; only-spark={only_s} only-duckdb={only_d}"
    return True, "ok"
