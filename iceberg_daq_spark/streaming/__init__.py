"""Structured-streaming data plane.

Re-expresses the reference's dataflow (SURVEY section 3.2 step 5):

  WIB frame stream (emulated) -> decode -> TPG hit finding ->
  windowed trigger activity/candidate formation -> trigger-decision
  interval merge -> readout-window collection -> raw/trigprim sinks

Design rule: every transform is a pure DataFrame -> DataFrame function
(plan.py), applied identically to a batch DataFrame (deterministic
golden tests, DuckDB-checkable) and a readStream DataFrame (the
production path).  Spark plans them the same way; only sources/sinks
and watermarks differ (pipeline.py).
"""
