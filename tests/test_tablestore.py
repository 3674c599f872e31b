"""MergeTable under concurrent writers (A46; SURVEY 5.2 item 4's
ACID clause).

Two OS processes - each with its own SparkSession, i.e. two
independent "cron" writers like the reference's per-host metadata
dumpers (createMetadatafiles_iceberg_dropbox.sh:45-47) - merge
disjoint key ranges into the same MergeTable concurrently.  The flock
around the whole read-modify-write must serialize them so that BOTH
writers' rows survive and versions advance monotonically; a
commit-only lock would exhibit the lost-update anomaly (both base on
v0, the later commit erases the earlier one's rows).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
from iceberg_daq_spark.session import get_spark
from iceberg_daq_spark.tablestore import MergeTable

table_path, writer, n_merges, barrier_dir = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
)
spark = get_spark(
    app_name=f"mergetable_writer_{{writer}}",
    master="local[2]",
    shuffle_partitions=2,
)
table = MergeTable(table_path, key_cols=("k",))

# barrier: both sessions fully up before the first merge, so the
# merge loops genuinely overlap
open(os.path.join(barrier_dir, f"ready_{{writer}}"), "w").close()
deadline = time.time() + 120
while len([f for f in os.listdir(barrier_dir) if f.startswith("ready_")]) < 2:
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.05)

for i in range(n_merges):
    df = spark.createDataFrame(
        [(f"{{writer}}-{{i}}", writer, i)], "k string, writer string, seq int"
    )
    table.merge(df)
print("DONE", writer, table.current_version())
"""


def test_concurrent_disjoint_writers(spark, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    table_path = str(tmp_path / "table")
    barrier = str(tmp_path / "barrier")
    os.makedirs(barrier)
    script = _CHILD.format(repo=repo)
    n_merges = 4

    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="2g")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, table_path, w, str(n_merges), barrier],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=repo,
        )
        for w in ("a", "b")
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    from iceberg_daq_spark.tablestore import MergeTable

    table = MergeTable(table_path, key_cols=("k",))
    rows = {r["k"]: r["writer"] for r in table.read(spark).collect()}
    # every merge from BOTH writers survived: no lost updates
    expect = {f"{w}-{i}": w for w in ("a", "b") for i in range(n_merges)}
    assert rows == expect
    # one version per committed merge, monotonic from 1
    assert table.current_version() == 2 * n_merges
