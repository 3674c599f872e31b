"""Declared query inventory (SURVEY.md section 2B).

Importing this package registers every query into
``iceberg_daq_spark.registry``.

Import order is registration order, and the verify driver checks the
first 50 registered queries: the section-2B CORE contract modules must
register before the llm/multimodal extension modules so every core
query lands inside the driver's checked window.
"""

from iceberg_daq_spark.queries import (  # noqa: F401
    scans,
    joins,
    aggregates,
    window_funcs,
    sort_setops,
    scalar,
    windows,
    daq,
)
from iceberg_daq_spark.queries import (  # noqa: F401
    llm,
    multimodal,
    curation,
    matching,
    behavior,
    timeseries,
    spatial,
    allocation,
    stats,
    commerce,
    market,
    tpch_ext,
    quant,
    sequence,
    economics,
    mining,
    embedding_eval,
    attribution,
    reporting,
    sre,
    scorecard,
    retail,
    robust,
    forecast,
    sketches,
    ml,
    linkpred,
    evals,
    markov,
    modeleval,
    motifs,
    attribution_markov,
    boosting,
    shapley,
    survivorship,
    density,
    anomaly_forest,
    substring,
    splits,
    datamix,
    corpus_tuning,
)
