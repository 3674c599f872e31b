"""Executable check-rotation invariants (round-11 verdict #7).

The driver hash-checks only the first 50 entries of
``__spark_entry__.queries()``; these tests make the prioritization
rule unbreakable:

  - the generated ``_LAST_DRIVER_ROUND`` map must match the repo's
    CORRECTNESS_r*.json artifacts exactly (``gen_check_order --check``),
  - every registered query that lacks a driver CORRECTNESS row must sit
    at the HEAD of the ordering (before anything already checked),
  - within the already-checked tail, oracle-backed queries must be
    ordered stalest-first and rows-only queries must come last,
  - EXCEPT the git-derived ``_ROWSONLY_REFRESH`` quota (<=5 rows-only
    queries whose source changed since their last driver row), which
    jumps the tail and must land inside the 50-slot window.

No Spark session required - pure registry/artifact logic.
"""

from __future__ import annotations

import os
import subprocess
import sys

from iceberg_daq_spark.registry import (
    _LAST_DRIVER_ROUND,
    _RECHECK,
    _ROWSONLY_REFRESH,
    all_queries,
    driver_ordered,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def test_generated_map_matches_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_check_order.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_never_checked_queries_head_the_window():
    ordered = list(driver_ordered())
    unchecked = {n for n in all_queries() if n not in _LAST_DRIVER_ROUND}
    head = ordered[: len(unchecked)]
    assert set(head) == unchecked, (
        f"never-driver-checked queries must lead the ordering; head={head}, "
        f"unchecked={sorted(unchecked)}"
    )
    # ... and they must all FIT in the driver's 50-entry window, else a
    # registration burst this large needs explicit triage, not silence
    assert len(unchecked) <= WINDOW


def test_checked_tail_is_stalest_first_rows_only_last():
    specs = all_queries()
    ordered = list(driver_ordered())
    checked = [
        n
        for n in ordered
        if n in _LAST_DRIVER_ROUND and n not in _RECHECK and n not in _ROWSONLY_REFRESH
    ]
    oracle = [n for n in checked if specs[n].oracle is not None]
    rows_only = [n for n in checked if specs[n].oracle is None]
    # rows-only strictly after every oracle-backed checked query
    last_oracle = max(ordered.index(n) for n in oracle)
    first_rows_only = min(ordered.index(n) for n in rows_only)
    assert last_oracle < first_rows_only
    # stalest-first within each class
    for group in (oracle, rows_only):
        rounds = [_LAST_DRIVER_ROUND[n] for n in group]
        assert rounds == sorted(rounds), "checked queries must be stalest-first"


def test_map_covers_only_registered_queries():
    registered = set(all_queries())
    stray = set(_LAST_DRIVER_ROUND) - registered
    assert not stray, f"_LAST_DRIVER_ROUND names unregistered queries: {stray}"


def test_rowsonly_refresh_quota():
    """_ROWSONLY_REFRESH: <=5 rows-only entries, all inside the window."""
    specs = all_queries()
    assert len(_ROWSONLY_REFRESH) <= 5
    ordered = list(driver_ordered())
    unchecked = {n for n in specs if n not in _LAST_DRIVER_ROUND}
    for n in _ROWSONLY_REFRESH:
        assert specs[n].oracle is None, f"{n} is oracle-backed; belongs in _RECHECK"
        assert n in _LAST_DRIVER_ROUND, f"{n} never checked; tier 0 already covers it"
        assert ordered.index(n) < WINDOW, f"{n} fell outside the 50-slot window"
    # quota entries sit directly after never-checked + _RECHECK
    base = len(unchecked) + len(_RECHECK)
    idxs = sorted(ordered.index(n) for n in _ROWSONLY_REFRESH)
    assert idxs == list(range(base, base + len(_ROWSONLY_REFRESH)))
