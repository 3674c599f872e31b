"""Query registry - the single source of truth for the driver contract.

Each query registers once with:
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
  - an optional DuckDB oracle SQL string (ANSI SQL over the same parquet
    tables, pre-registered as views by the driver)

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry.  Convention enforced across the codebase: every computed /
aggregate column is aliased identically in the Spark plan and the oracle
SQL (the driver sorts columns by name before value-hashing), and every
DOUBLE output is rounded to 2 decimals on both sides so float summation
order cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query implementation under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules for side-effect registration (lazy so that a
    # bare `import iceberg_daq_spark` stays cheap).
    from iceberg_daq_spark import queries  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
