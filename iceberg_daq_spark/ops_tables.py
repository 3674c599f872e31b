"""Operational tables A48-A50: the control-plane audit and hardware
configuration dimensions the reference keeps in shell scripts / JSON.

The reference's operations side carries three artifacts the analytics
plane should be able to JOIN against:

  - A48 - hardware sequencing (reference tlu/t-c-p-iceberg.sh:30-96):
    an ordered transcript of timing-system commands (``dtsbutler
    <subsystem> <device> <command> [args...]`` with fixed settle
    delays).  Here: an APPEND-ONLY ``control_actions`` audit table -
    every executed action is one immutable row, replays append a new
    run_id rather than rewriting history (the posture an audit log
    needs; MergeTable.append never touches prior files).
  - A49 - thread -> core pinning (reference
    cpupin_files/cpupin-all.json:2-25): the nested
    {application: {instance: {"threads": {thread: cpus}}}} map.
    Here: a ``cpu_pinning`` config table in long form, one row per
    (application, instance, thread), the cpu list exploded into a
    typed array so "which threads share a core" is one
    explode+groupBy away.
  - A50 - WIB inventory + per-FEMB power matrix (reference
    wibs/power_fembs.sh:46-58): the WIBS array of
    "id ip femb0 femb1 femb2 femb3" power targets.  Here: a
    ``wib_inventory`` dimension in long form, one row per
    (wib_id, femb_idx), broadcast-join-sized forever (a detector has
    O(100) WIBs - this table never shuffles a fact side).

All three are tiny dimension/audit tables: at 100 TB they ride every
join as broadcasts; the append-only audit grows O(actions), not
O(data).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_daq_spark.tablestore import MergeTable

# ---------------------------------------------------------------------------
# A48: control_actions append-only audit
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ControlAction:
    """One hardware-sequencing step: ``tool subsystem device
    pre_args... command args...``, followed by ``settle_s`` seconds of
    settle time before the next step (the reference's ``sleep 2``
    cadence).  ``pre_args`` holds positional tokens that appear
    BETWEEN the device and the command on the reference command line
    (e.g. the endpoint index in ``dtsbutler ept BOREAS_TLU_ICEBERG 0
    enable -a 2``) so a replay reconstructed from the audit row emits
    tokens in the reference's exact order - see :func:`replay_tokens`."""

    tool: str
    subsystem: str
    device: str
    command: str
    args: tuple[str, ...] = ()
    settle_s: int = 2
    pre_args: tuple[str, ...] = ()


def replay_tokens(a: ControlAction) -> list[str]:
    """The exact command-line tokens this action replays as - the
    audit table's contract is that this reconstruction is
    token-for-token identical to the reference script line."""
    return [a.tool, a.subsystem, a.device, *a.pre_args, a.command, *a.args]


# The reference TLU bring-up sequence, transcribed action-for-action
# from tlu/t-c-p-iceberg.sh:30-96 (dtsbutler lines in script order;
# every step is followed by `sleep 2`).
TLU_BRINGUP_SEQUENCE: tuple[ControlAction, ...] = (
    ControlAction("dtsbutler", "io", "BOREAS_TLU_ICEBERG", "reset"),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "synctime"),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "faketrig-clear", ("0",)),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "faketrig-conf", ("0", "2", "2")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "faketrig-conf", ("2", "2", "2")),
    # t-c-p-iceberg.sh:60 `dtsbutler ept BOREAS_TLU_ICEBERG 0 enable -a 2`:
    # the 0 is the endpoint index, a positional BEFORE the command
    ControlAction("dtsbutler", "ept", "BOREAS_TLU_ICEBERG", "enable", ("-a", "2"), pre_args=("0",)),
    # hsi_re_mask 16777248 = 2**24 + 2**5: channels 5 and 24, 0-indexed
    # (t-c-p-iceberg.sh:64-68)
    ControlAction("dtsbutler", "hsi", "BOREAS_TLU_ICEBERG", "configure", ("-r", "16777248", "-s", "0")),
    ControlAction("dtsbutler", "hsi", "BOREAS_TLU_ICEBERG", "start"),
    ControlAction("dtsbutler", "hsi", "BOREAS_TLU_ICEBERG", "readback"),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "align", ("toggle-tx", "2", "--on")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "write-ept-reg", ("2", "96", "2", "1")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "align", ("toggle-tx", "2", "--off")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "align", ("apply-delay", "0x0020", "0", "0", "--force")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "align", ("toggle-tx", "0x0020", "--on")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "align", ("toggle-tx", "0x0020", "--off")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "align", ("toggle-tx", "0x0FFF")),
    ControlAction("dtsbutler", "mst", "BOREAS_TLU_ICEBERG", "status"),
    ControlAction("dtsbutler", "hsi", "BOREAS_TLU_ICEBERG", "readback"),
)

_CONTROL_SCHEMA = (
    "run_id bigint, seq int, issued_at timestamp, tool string, "
    "subsystem string, device string, pre_args array<string>, "
    "command string, args array<string>, settle_s int"
)


def control_actions_table(path: str) -> MergeTable:
    """The append-only audit table.  Keyed (run_id, seq) so reads can
    MERGE-dedupe a re-recorded run, but the recording path only ever
    APPENDS - prior rows are immutable."""
    return MergeTable(path, key_cols=("run_id", "seq"))


def record_control_run(
    spark: SparkSession,
    table: MergeTable,
    actions: tuple[ControlAction, ...],
    run_id: int,
    started_at: str,
) -> int:
    """Append one executed sequence as ``len(actions)`` audit rows.
    ``issued_at`` is reconstructed deterministically from the start
    time plus the cumulative settle delays (the reference's fixed
    sleep cadence), so a recorded run is reproducible row-for-row."""
    rows = []
    offset = 0
    for i, a in enumerate(actions):
        rows.append((run_id, i, offset, a.tool, a.subsystem, a.device, list(a.pre_args), a.command, list(a.args), a.settle_s))
        offset += a.settle_s
    df = (
        spark.createDataFrame(
            rows,
            "run_id bigint, seq int, _off bigint, tool string, subsystem string, "
            "device string, pre_args array<string>, command string, "
            "args array<string>, settle_s int",
        )
        .withColumn(
            "issued_at",
            F.to_timestamp(F.lit(started_at)) + F.make_dt_interval(secs=F.col("_off")),
        )
        .drop("_off")
        .select(*[c.split(" ")[0] for c in _CONTROL_SCHEMA.split(", ")])
    )
    return table.append(df)


# ---------------------------------------------------------------------------
# A49: cpu_pinning config table
# ---------------------------------------------------------------------------

# Golden pinning map transcribed from cpupin_files/cpupin-all.json:2-25
# (application -> instance flags -> thread name -> core list).
CPUPIN_ALL: dict[str, dict[str, dict[str, str]]] = {
    "daq_application": {
        "--name ruiceberg03eth0": {
            "rte-worker-2": "2",
            "rte-worker-4": "4",
            "tpset-0": "6",
            "tpset-1": "8",
            "tpset-2": "10",
            "postproc-0-0": "12",
            "postproc-0-1": "14",
            "postproc-0-2": "16",
            "postproc-0-3": "18",
            "postproc-0-4": "20",
            "postproc-0-5": "22",
            "postproc-0-6": "24",
            "postproc-0-7": "26",
            "consumer-..": "28,3,5,7,9,11,13,15",
            "cleanup-0": "30",
        }
    }
}


def compile_cpu_pinning(
    spark: SparkSession, mapping: dict[str, dict[str, dict[str, str]]]
) -> DataFrame:
    """Flatten the nested pinning JSON into the long-form config
    table: (application, instance, thread, cpus array<int>).  Thread
    names may be regex-ish patterns (``consumer-..``) exactly as in
    the reference file - matching against live thread names is the
    consumer's join, this table just types the map."""
    rows = [
        (app, inst, thread, [int(c) for c in cpus.split(",")])
        for app, insts in mapping.items()
        for inst, threads in insts.items()
        for thread, cpus in threads.items()
    ]
    return spark.createDataFrame(
        rows, "application string, instance string, thread string, cpus array<int>"
    )


def cpu_pinning_table(path: str) -> MergeTable:
    return MergeTable(path, key_cols=("application", "instance", "thread"))


def pinning_conflicts(pinning: DataFrame) -> DataFrame:
    """Cores claimed by more than one thread of the same instance -
    the misconfiguration this table exists to catch.  One explode +
    one partial-agg groupBy; output (application, instance, cpu,
    n_threads, threads sorted)."""
    return (
        pinning.select(
            "application", "instance", "thread", F.explode("cpus").alias("cpu")
        )
        .groupBy("application", "instance", "cpu")
        .agg(
            F.count("*").alias("n_threads"),
            F.sort_array(F.collect_list("thread")).alias("threads"),
        )
        .filter(F.col("n_threads") > 1)
    )


# ---------------------------------------------------------------------------
# A50: wib_inventory dimension + per-FEMB power matrix
# ---------------------------------------------------------------------------

# The power-on target matrix from wibs/power_fembs.sh:46-58: each entry
# is "wib_id ip femb0 femb1 femb2 femb3" (WIB 106 runs with FEMBs 0/1
# dark - a real partially-instrumented crate, kept verbatim).
WIB_POWER_ON_MATRIX: tuple[tuple[int, str, tuple[bool, bool, bool, bool]], ...] = (
    (102, "192.168.121.21", (True, True, True, True)),
    (105, "192.168.121.24", (True, True, True, True)),
    (106, "192.168.121.25", (False, False, True, True)),
)


def wib_inventory_df(spark: SparkSession) -> DataFrame:
    """The WIB/FEMB dimension in long form: one row per (wib_id,
    femb_idx) with the IP and the power-on target.  O(WIBs x 4) rows -
    broadcast-sized at any detector scale."""
    rows = [
        (wib_id, ip, idx, powered)
        for wib_id, ip, fembs in WIB_POWER_ON_MATRIX
        for idx, powered in enumerate(fembs)
    ]
    return spark.createDataFrame(
        rows, "wib_id int, ip string, femb_idx int, power_on boolean"
    )


def wib_inventory_table(path: str) -> MergeTable:
    return MergeTable(path, key_cols=("wib_id", "femb_idx"))
