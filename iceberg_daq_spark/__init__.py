"""PySpark-native analytics engine with the query and data-processing
capabilities of the DUNE/iceberg-daq reference system.

The reference (/root/reference) is a DAQ operations layer: streaming
detector readout -> windowed triggering -> file sinks -> catalog metadata
ETL, plus declarative config compilation.  This package re-expresses every
data operation it performs (SURVEY.md section 2) as idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for the
data plane, pandas UDFs only at genuine binary-decode edges.

Layout:
    session.py    - tuned SparkSession builder
    tables.py     - test-table loader / temp-view registration
    registry.py   - query registry (name -> spark fn + duckdb oracle SQL)
    queries/      - the declared query inventory (SURVEY section 2B)
    operators/    - reusable operator implementations (intervals, dedup,
                    similarity, checksums, text analysis, asof joins)
    streaming/    - structured-streaming data plane (frame emulator, TPG,
                    windowed triggering, trigger-record assembly)
"""

__version__ = "0.1.0"
