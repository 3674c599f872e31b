#!/usr/bin/env python
"""Benchmark harness: run the query inventory at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the noop sink (full plan
runs, nothing collected to the driver).  Use BENCH_QUERIES=q01,q12 to
restrict; BENCH_REPEAT=n for best-of-n (default 1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from iceberg_daq_spark.registry import all_queries
from iceberg_daq_spark.session import get_spark


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "1"))
    only = os.environ.get("BENCH_QUERIES")
    specs = all_queries()
    names = sorted(specs)
    if only:
        wanted = {w.strip() for w in only.split(",")}
        names = [n for n in names if any(n.startswith(w) for w in wanted)]

    spark = get_spark(app_name="iceberg_daq_bench")
    # warm the JVM + parquet footers once, outside timing
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = specs[name].fn
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        # queries cache intermediates (shingle tables etc.); drop them so
        # one query's working set can't bleed GC pressure into the next
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_from_dir(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
