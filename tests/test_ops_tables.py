"""A48-A50 operational tables: golden rows transcribed from the
reference's shell/JSON artifacts, and the append-only audit posture."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_daq_spark.ops_tables import (
    CPUPIN_ALL,
    TLU_BRINGUP_SEQUENCE,
    replay_tokens,
    WIB_POWER_ON_MATRIX,
    compile_cpu_pinning,
    control_actions_table,
    cpu_pinning_table,
    pinning_conflicts,
    record_control_run,
    wib_inventory_df,
    wib_inventory_table,
)


def test_control_actions_append_only_audit(spark, tmp_path):
    """Two recorded runs of the TLU bring-up sequence: 18 immutable
    rows each, reconstructed issued_at on the 2s settle cadence, and
    golden rows matching tlu/t-c-p-iceberg.sh:30-96."""
    t = control_actions_table(str(tmp_path / "control_actions"))
    v1 = record_control_run(
        spark, t, TLU_BRINGUP_SEQUENCE, run_id=1, started_at="2024-06-21 09:00:00"
    )
    v2 = record_control_run(
        spark, t, TLU_BRINGUP_SEQUENCE, run_id=2, started_at="2024-06-21 10:00:00"
    )
    assert v2 > v1  # each run is its own append commit
    df = t.read(spark)
    assert df.count() == 2 * len(TLU_BRINGUP_SEQUENCE) == 36

    run1 = df.filter(F.col("run_id") == 1).orderBy("seq").collect()
    # golden: first action is the io reset, sixth is the ept enable,
    # seventh the HSI configure with the 16777248 rising-edge mask
    assert (run1[0].subsystem, run1[0].command) == ("io", "reset")
    # sh:60 `dtsbutler ept BOREAS_TLU_ICEBERG 0 enable -a 2` - the
    # endpoint index 0 sits BETWEEN device and command (pre_args), so
    # the replay reconstruction is token-for-token the script line
    assert (
        run1[5].subsystem,
        run1[5].pre_args,
        run1[5].command,
        run1[5].args,
    ) == ("ept", ["0"], "enable", ["-a", "2"])
    assert replay_tokens(TLU_BRINGUP_SEQUENCE[5]) == [
        "dtsbutler", "ept", "BOREAS_TLU_ICEBERG", "0", "enable", "-a", "2",
    ]
    assert run1[6].command == "configure"
    assert run1[6].args == ["-r", "16777248", "-s", "0"]
    # deterministic cadence: every action 2s after the previous
    deltas = {
        (b.issued_at - a.issued_at).total_seconds()
        for a, b in zip(run1, run1[1:])
    }
    assert deltas == {2.0}
    # the audit is append-only: run 1's rows are byte-identical in
    # the pre-run-2 snapshot and the current one
    def frozen(rows):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in rows
        }

    before = frozen(t.read(spark, v1).collect())
    now1 = frozen(df.filter(F.col("run_id") == 1).collect())
    assert before == now1


def test_cpu_pinning_golden_and_conflicts(spark, tmp_path):
    """The flattened cpupin-all.json map: 15 threads of the
    ruiceberg03eth0 instance, the consumer share-list typed as an int
    array, and the conflict probe finding exactly an injected
    double-pin."""
    pin = compile_cpu_pinning(spark, CPUPIN_ALL)
    assert pin.count() == 15
    rows = {r.thread: r for r in pin.collect()}
    assert rows["rte-worker-2"].cpus == [2]
    assert rows["consumer-.."].cpus == [28, 3, 5, 7, 9, 11, 13, 15]
    assert rows["cleanup-0"].cpus == [30]
    assert {r.instance for r in rows.values()} == {"--name ruiceberg03eth0"}

    assert pinning_conflicts(pin).count() == 0  # reference map is clean

    t = cpu_pinning_table(str(tmp_path / "cpu_pinning"))
    t.merge(pin)
    assert t.read(spark).count() == 15

    bad = pin.unionByName(
        spark.createDataFrame(
            [("daq_application", "--name ruiceberg03eth0", "rogue", [2, 99])],
            "application string, instance string, thread string, cpus array<int>",
        )
    )
    conf = pinning_conflicts(bad).collect()
    assert len(conf) == 1
    assert conf[0].cpu == 2 and conf[0].threads == ["rogue", "rte-worker-2"]


def test_wib_inventory_power_matrix(spark, tmp_path):
    """The long-form WIB/FEMB dimension matches power_fembs.sh:46-58:
    3 WIBs x 4 FEMBs, WIB 106 with FEMBs 0/1 dark."""
    inv = wib_inventory_df(spark)
    assert inv.count() == 12
    dark = {
        (r.wib_id, r.femb_idx) for r in inv.filter(~F.col("power_on")).collect()
    }
    assert dark == {(106, 0), (106, 1)}
    by_wib = {
        r.wib_id: r.ip for r in inv.select("wib_id", "ip").distinct().collect()
    }
    assert by_wib == {w: ip for w, ip, _ in WIB_POWER_ON_MATRIX}

    t = wib_inventory_table(str(tmp_path / "wib_inventory"))
    t.merge(inv)
    got = t.read(spark)
    assert got.count() == 12
    # dimension update: powering FEMB 0 of WIB 106 is a keyed merge
    t.merge(
        spark.createDataFrame(
            [(106, "192.168.121.25", 0, True)],
            "wib_id int, ip string, femb_idx int, power_on boolean",
        )
    )
    assert t.read(spark).filter(~F.col("power_on")).count() == 1
