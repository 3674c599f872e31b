"""Query registry - the single source of truth for the driver contract.

Each query registers once with:
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
  - an optional DuckDB oracle SQL string (ANSI SQL over the same parquet
    tables, pre-registered as views by the driver)

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry.  Convention enforced across the codebase: every computed /
aggregate column is aliased identically in the Spark plan and the oracle
SQL (the driver sorts columns by name before value-hashing), and every
DOUBLE output is rounded to 2 decimals on both sides so float summation
order cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query implementation under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import query modules for side-effect registration (lazy so that a
    # bare `import iceberg_daq_spark` stays cheap).
    from iceberg_daq_spark import queries  # noqa: F401

    return dict(_REGISTRY)


# The verify driver hash-checks only the FIRST 50 entries of
# ``__spark_entry__.queries()``.  With 239 registered queries (223
# oracle-backed, 16 rows-only by design) the window cannot cover
# everything, so the projection below orders queries by how much a
# driver row is worth this round:
#   1. oracle-backed queries with no driver CORRECTNESS row yet,
#   2. oracle-backed queries confirmed in only one prior round,
#   3. queries whose implementation changed this round (re-confirm),
#   4. everything else oracle-backed, in registration order,
#   5. double-confirmed trivial queries (scans/basic joins) - spill
#      past the window before anything less-confirmed does,
#   6. rows-only queries (the driver can never hash-verify these; local
#      tests assert their semantics) - always last.
_CHECK_FIRST = [
    # -- round-11 window ------------------------------------------------
    # Head of window: the 25 round-10 registrations that have NEVER had
    # a driver CORRECTNESS row (q217-q241; round-10 VERDICT #2).  All
    # pass the local DuckDB oracle at sf0.001 + a perturbed copy.
    "q217_weighted_discount_percentiles",
    "q218_theil_inequality",
    "q219_robust_spread",
    "q220_holt_forecast",
    "q221_acf_ljung_box",
    "q222_seasonal_decomposition",
    "q223_countmin_heavy_hitters",
    "q224_bloom_membership",
    "q225_logreg_train",
    "q226_kmeans_lloyd",
    "q227_adamic_adar",
    "q228_naive_bayes_langid",
    "q229_poisson_bootstrap_ci",
    "q230_recsys_backtest",
    "q231_absorbing_markov",
    "q232_holt_winters",
    "q233_model_eval",
    "q234_decision_stump",
    "q235_sax_motifs",
    "q236_markov_attribution",
    "q237_adaboost_stumps",
    "q238_shapley_attribution",
    "q239_survivorship",
    "q240_dbscan",
    "q241_grid_outliers",
    # Then the six round-10 hash-fails whose oracles leaked DuckDB
    # HUGEINT/DECIMAL through windowed sums / max()-over-sum (VERDICT
    # #1): oracles now CAST(... AS BIGINT) on every integer output,
    # re-verify this round.  The local harness gained a DESCRIBE-based
    # type guard (tests/oracle_harness.py) so this class can't recur.
    "q137_largest_remainder_prorate",
    "q142_kaplan_meier_churn",
    "q143_gini_concentration",
    "q155_cohort_ltv",
    "q156_mix_shift_bridge",
    "q161_ks_two_sample",
    # Then the stalest contract rows (last driver-green r6; VERDICT #6,
    # <=4-round staleness policy).
    "q03_inner_join_agg",
    "q04_broadcast_join",
    "q05_multiway_join",
    "q06_left_outer_join",
    "q07_left_semi_join",
    "q11_cross_join",
    "q13_distinct_agg",
    "q21_sort_limit_topk",
    # Remaining slots: queries owed re-confirmation (implementation
    # changed r10 with oracles unchanged: q111/q206 localCheckpoint
    # pinning), then the r7-stale backlog heads.
    "q111_event_funnel",
    "q206_referential_integrity",
    "q36_config_rewrite",
    "q66_vocab_topk",
    "q08_left_anti_join",
    "q09_range_join",
    "q10_asof_join",
    "q14_rollup_grouping",
    "q15_minmax_firstlast",
    "q17_collect_sorted_list",
    "q18_ranking_topk",
    # ---- 50-entry window boundary (q18 is slot 50; ordering beyond
    # here is the round-12 rotation backlog: the round-11
    # registrations first (never driver-checked - they take the head
    # of the r12 window), then the remaining r7-stale core, then the
    # freshly-green r10 window spills naturally) -----------------------
    "q242_duplicated_spans",
    "q243_top_copied_passages",
    "q244_stratified_split",
    "q245_sequence_packing",
    "q246_containment_pairs",
    "q19_analytic_lag_lead",
    "q20_gaps_and_islands",
    "q22_set_operations",
    "q23_scalar_battery",
    "q24_array_battery",
    "q25_tumbling_window",
    "q26_sliding_window",
    "q27_session_window",
    "q28_prescale",
    "q30_interval_join_readout",
    "q31_metadata_docs",
    "q33_tp_ta_reduction",
    "q34_dromap_compile",
    "q35_run_allocator",
    "q37_metadata_etl_e2e",
    "q40_dedup_exact",
    "q41_dedup_ngram_jaccard",
    "q44_sim_topk_cosine",
]
_CHECK_LAST = [
    # all 50 queries driver-confirmed green in round 8 - the freshest
    # rows in the registry, safest to spill past the window this round
    "q109_pagerank",
    "q110_cohort_retention",
    "q111_event_funnel",
    "q112_peak_concurrency",
    "q113_event_transitions",
    "q114_top_journeys",
    "q115_metric_correlation",
    "q116_gapfill_resample",
    "q118_trend_slope",
    "q119_full_outer_reconcile",
    "q120_source_vocab_overlap",
    "q121_funnel_timing",
    "q122_ab_welch",
    "q123_spatial_radius_join",
    "q124_top_supplier_view",
    "q125_association_rules",
    "q126_last_touch_attribution",
    "q127_column_profile",
    "q107_pareto_frontier",
    "q108_hybrid_rrf",
    "q95_readability",
    "q96_curriculum_bins",
    "q98_int8_quantization",
    "q99_weighted_sample",
    "q100_heavy_hitters",
    "q101_contrastive_pairs",
    "q102_data_quality_checks",
    "q105_quality_percentile_rank",
    "q93_zipf_slope",
    "q94_source_dup_rates",
    "q91_pmi_collocations",
    "q92_dup_cluster_sizes",
    "q84_bm25_search",
    "q85_shard_assignment",
    "q87_quality_classifier",
    "q88_ngram_novelty",
    "q78_doc_chunking",
    "q75_boilerplate_shingles",
    "q76_quality_funnel",
    "q77_label_centroids",
    "q79_pii_redaction",
    "q80_url_domains",
    "q81_unigram_surprisal",
    "q82_keyword_extract",
    "q83_source_drift",
    "q57_dedup_components",
    "q73_cluster_retention",
    "q72_source_cap",
    "q74_exact_percentiles",
]


def driver_ordered() -> dict[str, QuerySpec]:
    """Registry in driver-check-priority order (see comment above)."""
    specs = all_queries()
    names = list(specs)

    def key(n: str):
        if n in _CHECK_FIRST:
            return (0, _CHECK_FIRST.index(n))
        if specs[n].oracle is None:
            return (3, names.index(n))
        if n in _CHECK_LAST:
            return (2, _CHECK_LAST.index(n))
        return (1, names.index(n))

    return {n: specs[n] for n in sorted(names, key=key)}


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in driver_ordered().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in driver_ordered().items() if spec.oracle is not None
    }
