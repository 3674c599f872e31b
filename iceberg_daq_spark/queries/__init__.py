"""Declared query inventory (SURVEY.md section 2B).

Importing this package registers every query into
``iceberg_daq_spark.registry``.
"""

from iceberg_daq_spark.queries import (  # noqa: F401
    aggregates,
    daq,
    joins,
    llm,
    multimodal,
    scalar,
    scans,
    sort_setops,
    window_funcs,
    windows,
)
