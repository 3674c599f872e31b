"""Keyed MERGE-upsert tables over parquet with atomic commits.

The declared design (SURVEY section 7) is Iceberg tables with
``MERGE INTO`` idempotent upserts.  This container has no Iceberg
runtime jar, so this module implements the same *contract* on plain
parquet, and documents exactly where Iceberg would take over on a
cluster:

  Iceberg on a cluster              here
  -----------------------          ----
  MERGE INTO t USING u ON keys     :meth:`MergeTable.merge` -
    WHEN MATCHED UPDATE              updates-win anti-join union
    WHEN NOT MATCHED INSERT          (same row-level semantics)
  snapshot commit (atomic           versioned directories + an atomic
    metadata pointer swap)           ``_CURRENT`` pointer rename -
                                     the same protocol the reference
                                     uses per metadata file (write
                                     ``.tmp`` then ``mv``, A8,
                                     createMetadatafiles_iceberg_
                                     dropbox.sh:144,215)
  optimistic locking               an flock'd commit section (A46,
                                     the reference's cron lockfile,
                                     createMetadatafiles...sh:45-47)
  snapshot expiry                  prune to the last ``keep``
                                     versions on commit

Readers always see a complete snapshot: the pointer flips only after
the new version directory is fully written, and ``os.replace`` is
atomic on POSIX.  Re-merging identical rows is a no-op by construction
(same keys -> same contents), which is what makes every pipeline built
on this layer rerun-idempotent.
"""

from __future__ import annotations

import fcntl
import os
import shutil
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


@contextmanager
def _commit_lock(path: str):
    """A46: serialize commits the way the reference's cron lockfile
    serializes scan passes (flock, not a pid file - crash-safe)."""
    os.makedirs(path, exist_ok=True)
    fd = os.open(os.path.join(path, ".commit.lock"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


@dataclass
class MergeTable:
    """A keyed table with MERGE-upsert writes and atomic versioned
    commits.  ``key_cols`` is the MERGE ON clause."""

    path: str
    key_cols: tuple[str, ...]
    keep_versions: int = 2

    def _pointer(self) -> str:
        return os.path.join(self.path, _POINTER)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer(), encoding="ascii") as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:06d}")

    def exists(self) -> bool:
        return self.current_version() is not None

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """A snapshot: the current one, or - time travel - any retained
        prior ``version`` (the Iceberg ``VERSION AS OF`` analog; older
        than the retention window raises).  None before the first
        commit."""
        cur = self.current_version()
        if cur is None:
            return None
        v = cur if version is None else version
        if not os.path.isdir(self._version_dir(v)):
            raise ValueError(
                f"version {v} not retained (current {cur}, keep_versions "
                f"{self.keep_versions})"
            )
        return spark.read.parquet(self._version_dir(v))

    def _commit(self, df: DataFrame) -> int:
        """Write df as the next version and atomically flip the
        pointer (write-tmp-then-rename, the reference's A8 protocol)."""
        with _commit_lock(self.path):
            return self._commit_locked(df)

    def _commit_locked(self, df: DataFrame) -> int:
        v = (self.current_version() or 0) + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w", encoding="ascii") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer())  # atomic on POSIX
        # snapshot expiry: drop versions beyond the retention window
        for old in range(1, v - self.keep_versions + 1):
            shutil.rmtree(self._version_dir(old), ignore_errors=True)
        return v

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df)

    def merge(self, updates: DataFrame) -> int:
        """MERGE INTO this table USING updates ON key_cols:
        matched rows are replaced by their update, unmatched updates
        are inserted, unmatched existing rows are kept.  Updates must
        be key-unique (MERGE's own precondition).  Row-identical
        re-merges leave the table contents unchanged - the idempotency
        the reference gets from its sidecar-exists check (A13/A46).

        The flock spans the whole read-modify-write, not just the
        pointer flip: a commit-only lock would let two concurrent
        mergers both base on the same snapshot and the later one erase
        the earlier one's rows (the lost-update anomaly Iceberg's
        optimistic retry handles; a cron lockfile held for the full
        pass is the reference's answer, :45-47, and ours).
        """
        spark = updates.sparkSession
        with _commit_lock(self.path):
            current = self.read(spark)
            if current is None:
                merged = updates
            else:
                keys = list(self.key_cols)
                merged = updates.unionByName(
                    current.join(updates.select(*keys), keys, "left_anti")
                )
            return self._commit_locked(merged)

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Maintenance: rewrite the current snapshot into
        ``target_files`` files (Iceberg ``rewrite_data_files`` analog).
        Streaming MERGE sinks commit one small snapshot per micro-batch;
        periodic compaction keeps read amplification flat.  Contents are
        unchanged - only the file layout."""
        with _commit_lock(self.path):
            df = self.read(spark)
            if df is None:
                raise ValueError(f"compact() on uncommitted table {self.path}")
            return self._commit_locked(df.coalesce(target_files))

    def delete(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


def run_stream_to_table(
    stream_df: DataFrame,
    table: MergeTable,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Structured Streaming sink with MERGE semantics: every micro-batch
    upserts into the table keyed by ``table.key_cols``.

    Exactly-once table contents without Iceberg: if a batch replays
    after a crash (checkpoint offset committed, sink action lost), the
    replayed merge upserts the same keys and the snapshot is unchanged.
    On a cluster this function body becomes a single
    ``MERGE INTO sink USING batch`` per micro-batch."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # dropDuplicates on the key inside the batch: MERGE requires a
        # key-unique source
        table.merge(batch_df.dropDuplicates(list(table.key_cols)))

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
    )
    q = writer.trigger(availableNow=True).start() if available_now else writer.start()
    q.awaitTermination()
    return q
