"""Warehouse catalog: named MergeTables under one root.

The Iceberg catalog analog (HadoopCatalog flavor - the filesystem IS
the catalog, no external service): a namespace/table name maps to a
directory under the warehouse root, table properties (MERGE keys,
partition spec seed, sort order) persist in a small `_TABLE` descriptor
next to the data, and every MergeTable capability (time travel, tags,
branches, row-level deletes, compaction, metadata tables) is reached
through ``load_table``.  Reference analog: the dropbox root convention
(SURVEY 1.3) - one directory per dataset, discovered by listing.

Names are ``namespace.table`` (one namespace level, like Iceberg's
default); the namespace maps to a subdirectory.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from iceberg_daq_spark.tablestore import MergeTable, _atomic_write

_NAME_RE = re.compile(r"^[A-Za-z_]\w*$")
_DESCRIPTOR = "_TABLE"


def _split(name: str) -> tuple[str, str]:
    parts = name.split(".")
    if len(parts) == 1:
        parts = ["default", parts[0]]
    if len(parts) != 2 or not all(_NAME_RE.match(p) for p in parts):
        raise ValueError(f"bad table name {name!r} (want [namespace.]table)")
    return parts[0], parts[1]


class Catalog:
    """A warehouse of named :class:`MergeTable` s."""

    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        ns, tbl = _split(name)
        return os.path.join(self.warehouse, ns, tbl)

    def create_table(
        self,
        name: str,
        key_cols: tuple[str, ...] | list[str],
        partition_spec: tuple[str, ...] | list[str] = (),
        sort_order: tuple[str, ...] | list[str] = (),
        keep_versions: int = 2,
        exists_ok: bool = False,
    ) -> MergeTable:
        """Register a table: writes the descriptor (the catalog
        entry); data arrives with the first merge/append.  The
        descriptor persists the table PROPERTIES so later sessions
        load the same table without re-stating them."""
        d = self._table_dir(name)
        desc = os.path.join(d, _DESCRIPTOR)
        if os.path.exists(desc):
            if not exists_ok:
                raise ValueError(f"table {name!r} already exists")
            return self.load_table(name)
        os.makedirs(d, exist_ok=True)
        _atomic_write(
            desc,
            json.dumps(
                {
                    "key_cols": list(key_cols),
                    "partition_spec": list(partition_spec),
                    "sort_order": list(sort_order),
                    "keep_versions": keep_versions,
                }
            ),
        )
        return self.load_table(name)

    def load_table(self, name: str) -> MergeTable:
        """The named table, configured from its descriptor.  The
        manifest still wins for evolved properties (spec/sort/keys) -
        the descriptor is the creation-time seed, exactly like a
        constructor call."""
        d = self._table_dir(name)
        desc = os.path.join(d, _DESCRIPTOR)
        try:
            with open(desc, encoding="utf-8") as f:
                p = json.load(f)
        except FileNotFoundError:
            raise ValueError(f"no table {name!r} in {self.warehouse}") from None
        return MergeTable(
            d,
            key_cols=tuple(p["key_cols"]),
            partition_spec=tuple(p.get("partition_spec") or ()),
            sort_order=tuple(p.get("sort_order") or ()),
            keep_versions=int(p.get("keep_versions") or 2),
        )

    def table_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._table_dir(name), _DESCRIPTOR))

    def list_tables(self, namespace: str | None = None) -> list[str]:
        """Every registered table, as ``namespace.table``, sorted."""
        out = []
        spaces = (
            [namespace]
            if namespace
            else [
                e
                for e in sorted(os.listdir(self.warehouse))
                if os.path.isdir(os.path.join(self.warehouse, e))
            ]
        )
        for ns in spaces:
            nsd = os.path.join(self.warehouse, ns)
            if not os.path.isdir(nsd):
                continue
            for tbl in sorted(os.listdir(nsd)):
                if os.path.exists(os.path.join(nsd, tbl, _DESCRIPTOR)):
                    out.append(f"{ns}.{tbl}")
        return out

    def drop_table(self, name: str, purge: bool = True) -> None:
        """Unregister the table; ``purge`` also deletes its data (the
        Iceberg ``DROP TABLE ... PURGE`` distinction: purge=False
        leaves the directory for external readers, removing only the
        catalog entry)."""
        d = self._table_dir(name)
        desc = os.path.join(d, _DESCRIPTOR)
        if not os.path.exists(desc):
            raise ValueError(f"no table {name!r} in {self.warehouse}")
        if purge:
            shutil.rmtree(d, ignore_errors=True)
        else:
            os.unlink(desc)

    def register_views(self, spark: SparkSession, namespace: str | None = None):
        """Register every committed table as a temp view named
        ``namespace_table`` (Spark temp views cannot be dotted) - the
        spark.sql facade over the whole warehouse."""
        for name in self.list_tables(namespace):
            t = self.load_table(name)
            if t.current_version() is not None:
                t.create_view(spark, name.replace(".", "_"))

    def read(self, spark: SparkSession, name: str, **kw) -> DataFrame | None:
        """Sugar: ``catalog.read(spark, "ns.t", where=...)``."""
        return self.load_table(name).read(spark, **kw)
