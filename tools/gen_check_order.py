#!/usr/bin/env python
"""Regenerate registry._LAST_DRIVER_ROUND from CORRECTNESS_r*.json.

The driver hash-checks only the FIRST 50 entries of
``__spark_entry__.queries()``; the registry orders queries by how much
a driver row is worth this round (never-checked first, then stalest).
That ordering is derived from a static ``_LAST_DRIVER_ROUND`` map in
registry.py - static so the package never has to locate artifact files
at runtime - and THIS tool is the single way the map is refreshed:

    python tools/gen_check_order.py        # rewrite the block in place
    python tools/gen_check_order.py --check  # exit 1 if stale (CI/test)

Run it once per round after the driver drops a new CORRECTNESS file.
tests/test_registry_rotation.py runs --check so a stale map fails the
suite instead of silently mis-prioritizing the window.

It also regenerates ``_ROWSONLY_REFRESH`` (round-12 verdict #3): up to
``ROWSONLY_QUOTA`` rows-only queries whose defining source file was
modified in git AFTER the driver commit of the round that produced
their last driver row.  Rows-only entries sort last in the rotation,
so without this quota a rewritten rows-only query (q42 was rewritten
in r11; its last driver row was r1) never re-enters the 50-slot window
and the driver never observes that the new code still runs.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "# --- BEGIN GENERATED (tools/gen_check_order.py) ---"
END = "# --- END GENERATED ---"
RO_BEGIN = "# --- BEGIN GENERATED ROWSONLY (tools/gen_check_order.py) ---"
RO_END = "# --- END GENERATED ROWSONLY ---"
ROWSONLY_QUOTA = 5


def latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for q in json.load(open(f)):
            latest[q] = max(latest.get(q, 0), rnd)
    return latest


def render(latest: dict[str, int]) -> str:
    lines = [BEGIN, "_LAST_DRIVER_ROUND: dict[str, int] = {"]
    for name in sorted(latest):
        lines.append(f'    "{name}": {latest[name]},')
    lines.append("}")
    lines.append(END)
    return "\n".join(lines)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=False
    ).stdout.strip()


def _round_commits() -> dict[int, str]:
    """Map round N -> sha of the driver's `round N: ...` commit."""
    out: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+):", line)
        if m:
            out.setdefault(int(m.group(2)), m.group(1))
    return out


def rowsonly_refresh(latest: dict[str, int]) -> list[str]:
    """Rows-only queries whose source file changed after their last
    driver row, stalest-row-first, capped at ROWSONLY_QUOTA.

    "Changed after" = the file's last-modifying commit is NOT an
    ancestor of the `round R:` driver commit (the driver ran round R's
    code immediately before that commit).  File granularity is coarse
    (one edit to a big module flags its whole rows-only family) but
    the quota bounds the cost and staleness ordering self-heals as
    fresh rows land.
    """
    rounds = _round_commits()
    if not rounds:
        return []
    sys.path.insert(0, REPO)
    from iceberg_daq_spark import registry  # noqa: PLC0415

    specs = registry.all_queries()
    cand: list[tuple[int, str]] = []
    file_last: dict[str, str] = {}
    for name, spec in specs.items():
        if spec.oracle is not None or name not in latest:
            continue  # oracle-backed rows rotate normally; never-checked are tier 0
        rnd = latest[name]
        if rnd not in rounds:
            continue
        try:
            src = inspect.getsourcefile(inspect.unwrap(spec.fn))
        except (TypeError, OSError):
            continue
        rel = os.path.relpath(src, REPO)
        if rel not in file_last:
            file_last[rel] = _git("log", "-1", "--format=%H", "--", rel)
        last_mod = file_last[rel]
        if not last_mod:
            continue
        anc = subprocess.run(
            ["git", "merge-base", "--is-ancestor", last_mod, rounds[rnd]],
            cwd=REPO,
            capture_output=True,
        ).returncode
        if anc != 0:  # modified after the round-R driver commit
            cand.append((rnd, name))
    cand.sort()
    return [n for _, n in cand[:ROWSONLY_QUOTA]]


def render_rowsonly(names: list[str]) -> str:
    if not names:
        return "\n".join([RO_BEGIN, "_ROWSONLY_REFRESH: list[str] = []", RO_END])
    lines = [RO_BEGIN, "_ROWSONLY_REFRESH: list[str] = ["]
    for n in names:
        lines.append(f'    "{n}",')
    lines.append("]")
    lines.append(RO_END)
    return "\n".join(lines)


def main() -> None:
    check = "--check" in sys.argv
    path = os.path.join(REPO, "iceberg_daq_spark", "registry.py")
    src = open(path).read()
    latest = latest_rounds()
    block = render(latest)
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(src):
        sys.exit(f"generated block markers not found in {path}")
    new = pat.sub(block, src)
    ro_pat = re.compile(re.escape(RO_BEGIN) + r".*?" + re.escape(RO_END), re.S)
    if ro_pat.search(new):
        ro_block = render_rowsonly(rowsonly_refresh(latest))
        new = ro_pat.sub(ro_block, new)
    if check:
        if new != src:
            sys.exit(
                "registry._LAST_DRIVER_ROUND / _ROWSONLY_REFRESH is stale - "
                "run `python tools/gen_check_order.py`"
            )
        print("check ordering up to date")
        return
    if new != src:
        open(path, "w").write(new)
        print("registry generated blocks refreshed")
    else:
        print("already up to date")


if __name__ == "__main__":
    main()
