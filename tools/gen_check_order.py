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
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "# --- BEGIN GENERATED (tools/gen_check_order.py) ---"
END = "# --- END GENERATED ---"


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


def main() -> None:
    check = "--check" in sys.argv
    path = os.path.join(REPO, "iceberg_daq_spark", "registry.py")
    src = open(path).read()
    block = render(latest_rounds())
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(src):
        sys.exit(f"generated block markers not found in {path}")
    new = pat.sub(block, src)
    if check:
        if new != src:
            sys.exit(
                "registry._LAST_DRIVER_ROUND is stale - run "
                "`python tools/gen_check_order.py`"
            )
        print("check ordering up to date")
        return
    if new != src:
        open(path, "w").write(new)
        print("registry._LAST_DRIVER_ROUND regenerated")
    else:
        print("already up to date")


if __name__ == "__main__":
    main()
