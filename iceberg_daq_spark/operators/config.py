"""Config compiler: the reference's sed/jq surgery as typed transforms.

The reference generates run configs by regex-rewriting serialized JSON
(A40, config/create_daq_config.sh:205-211,268-277 and the mode diffs
baked into config/base/iceberg_daq_cosmic.json).  Here a config is a
DataFrame of (section, key, value) rows and every rewrite rule is a
`when(...)` update - no string surgery, every rule inspectable, and the
whole pipeline is the same MERGE-shaped plan that would maintain a
config catalog table at scale.

Base values and the cosmic diff are the reference's, key for key
(diff of iceberg_daq_eth.json vs iceberg_daq_cosmic.json - exactly 8
keys differ; verified 2026-08): offline_data_stream, control_hsi_hw,
fake_hsi_to_ctb, hsi_device_name, hsi_re_mask, use_fake_hsi,
use_timing_hsi, and the ttcm_input_map signal/tc_type_name pair
(iceberg_daq_eth.json:86,91,95,99,105,111-112,316-317).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("section", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)

# (section, key, value) - the eth/pulser base (iceberg_daq_pulser.json is
# byte-identical to the eth base; SURVEY section 0).  Values are strings;
# type discipline lives in the consuming job-spec, as in the reference
# where the *_gen tools validate on consumption (SURVEY section 1.3).
BASE_CONFIG: list[tuple[str, str, str]] = [
    # dataflow sink block (iceberg_daq_eth.json:62-82)
    ("dataflow", "data_store_mode", "all-per-file"),
    ("dataflow", "max_file_size", "4294967296"),
    ("dataflow", "output_paths", "/nvme/dunecet/dropbox"),
    ("dataflow", "token_count", "10"),
    ("dataflow", "tp_accumulation_interval_ticks", "62500000"),
    ("dataflow", "file_prefix", "swtest"),  # patched to iceberghd (create_daq_config.sh:270-273)
    ("dataflow", "file_index_digits", "4"),
    ("dataflow", "offline_data_stream", "calibration"),  # :86
    # hsi block (iceberg_daq_eth.json:91-112)
    ("hsi", "control_hsi_hw", "false"),
    ("hsi", "fake_hsi_to_ctb", "true"),
    ("hsi", "hsi_device_name", ""),
    ("hsi", "hsi_re_mask", "16777216"),
    ("hsi", "random_trigger_rate_hz", "1.0"),
    ("hsi", "use_fake_hsi", "true"),
    ("hsi", "use_timing_hsi", "false"),
    # trigger signal map (iceberg_daq_eth.json:314-321)
    ("trigger", "ttcm_input_map.signal", "16777216"),
    ("trigger", "ttcm_input_map.tc_type_name", "kDTSPulser"),
    ("trigger", "ttcm_prescale", "1"),
    # monitoring (iceberg_daq_eth.json:14-16; remap create_daq_config.sh:268-269)
    ("boot", "opmon_kafka_address", "monkafka.cern.ch:30092"),
    ("boot", "ers_kafka_address", "monkafka.cern.ch:30092"),
    # channel map (iceberg_daq_eth.json:88; swap create_daq_config.sh:274-277)
    ("readout", "tpc_channel_map", "PD2HDChannelMap"),
    ("readout", "latency_buffer_size", "499712"),
    ("readout", "enable_raw_recording", "false"),
]

# The cosmic-mode rewrite rules (the 8-key diff + TLU doc
# tlu/t-c-p-iceberg.sh:63-67: mask 32 selects HSI channel 5).
COSMIC_RULES: dict[tuple[str, str], str] = {
    ("dataflow", "offline_data_stream"): "cosmics",
    ("hsi", "control_hsi_hw"): "true",
    ("hsi", "fake_hsi_to_ctb"): "false",
    ("hsi", "hsi_device_name"): "BOREAS_TLU_ICEBERG",
    ("hsi", "hsi_re_mask"): "32",
    ("hsi", "use_fake_hsi"): "false",
    ("hsi", "use_timing_hsi"): "true",
    ("trigger", "ttcm_input_map.signal"): "32",
    ("trigger", "ttcm_input_map.tc_type_name"): "kDTSCosmic",
}

# Post-codegen patches applied to EVERY generated config
# (create_daq_config.sh:266-277).
PATCH_RULES: dict[tuple[str, str], str] = {
    ("boot", "opmon_kafka_address"): "iceberg01.fnal.gov:30092",
    ("boot", "ers_kafka_address"): "iceberg01.fnal.gov:30092",
    ("readout", "tpc_channel_map"): "ICEBERGChannelMap",
    ("dataflow", "file_prefix"): "iceberghd",
    ("dataflow", "file_index_digits"): "6",
}


def base_config_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(BASE_CONFIG, CONFIG_SCHEMA)


def apply_rules(config: DataFrame, rules: dict[tuple[str, str], str]) -> DataFrame:
    """Apply key-targeted updates as one chained CASE expression - the
    typed replacement for the reference's per-rule `sed -i` passes.
    One projection, no shuffle, order-independent (each rule targets a
    distinct (section, key))."""
    expr = F.col("value")
    for (section, key), new_value in rules.items():
        expr = F.when(
            (F.col("section") == section) & (F.col("key") == key), F.lit(new_value)
        ).otherwise(expr)
    return config.withColumn("value", expr)


def compile_config(spark: SparkSession, mode: str = "eth") -> DataFrame:
    """Full config compile for a mode: base -> mode rules -> patches,
    with provenance columns (changed-from) for auditability - the
    catalog-table analog of the reference's generated config dirs
    (create_daq_config.sh:163-175)."""
    if mode not in ("eth", "pulser", "cosmic"):
        raise ValueError(f"unknown mode {mode!r}")
    base = base_config_df(spark)
    rules = dict(PATCH_RULES)
    if mode == "cosmic":
        rules.update(COSMIC_RULES)
    compiled = apply_rules(base, rules)
    orig = base.select("section", "key", F.col("value").alias("base_value"))
    return (
        compiled.join(orig, ["section", "key"])
        .withColumn("changed", F.col("value") != F.col("base_value"))
        .select("section", "key", "value", "base_value", "changed")
    )


def config_values_sql() -> str:
    """The base config as a DuckDB VALUES clause (oracle side)."""
    rows = ",\n      ".join(
        "('{}', '{}', '{}')".format(s, k, v) for s, k, v in BASE_CONFIG
    )
    return (
        "SELECT * FROM (VALUES\n      " + rows + ") AS t(section, key, value)"
    )


def rules_case_sql(rules: dict[tuple[str, str], str]) -> str:
    """The same rules as a SQL CASE expression (oracle side)."""
    whens = "\n        ".join(
        f"WHEN section = '{s}' AND key = '{k}' THEN '{v}'"
        for (s, k), v in rules.items()
    )
    return f"CASE\n        {whens}\n        ELSE value END"
