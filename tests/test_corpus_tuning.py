"""Semantic invariants for the q259-q262 corpus-tuning battery
(cross-engine value parity is covered by tests/test_oracle.py; these
pin the properties parity alone can't state)."""

from __future__ import annotations

import math

from iceberg_daq_spark.queries import corpus_tuning
from iceberg_daq_spark.registry import all_queries


def test_q259_curve_accounting(spark, sf_dir):
    """Pair accounting closes: the decile counts sum to m*(m-1)/2 over
    sampled docs-with-shingles, collisions never exceed pairs, and the
    theoretical S-curve is strictly increasing in the decile."""
    rows = (
        all_queries()["q259_lsh_band_calibration"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows, "calibration produced no deciles"
    from iceberg_daq_spark.operators import dedup
    from iceberg_daq_spark.tables import load
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    n_docs = d.count()
    md = max(1, n_docs // corpus_tuning._SAMPLE_TARGET)
    samp = d.filter(F.pmod("doc_id", F.lit(md)) == 0).select("doc_id", "text")
    m = (
        dedup.shingles(samp, "text", k=3)
        .select("doc_id")
        .distinct()
        .count()
    )
    assert sum(r.n_pairs for r in rows) == m * (m - 1) // 2
    for r in rows:
        assert 0 <= r.n_collide <= r.n_pairs
        expect = round(
            1
            - (1 - (r.jbin / 10.0 + 0.05) ** corpus_tuning._ROWS)
            ** corpus_tuning._BANDS,
            4,
        )
        assert math.isclose(r.theory_p, expect, abs_tol=1e-9)
    theory = [r.theory_p for r in sorted(rows, key=lambda r: r.jbin)]
    assert theory == sorted(theory)


def test_q261_waterfill_feasible_and_exact(spark, sf_dir):
    """The allocation is feasible (alloc <= cap everywhere), spends
    the whole budget up to per-source floor() slack, and caps exactly
    the sources the breakpoint scan said it would."""
    rows = all_queries()["q261_token_waterfill"].fn(spark, sf_dir).collect()
    total = sum(r.n_tokens for r in rows)
    budget = corpus_tuning._BUDGET_X * total
    spent = sum(r.alloc_tokens for r in rows)
    for r in rows:
        assert r.alloc_tokens <= r.cap_tokens
        if r.capped:
            # a capped source takes its whole cap (floor slack <= 1)
            assert r.cap_tokens - r.alloc_tokens <= 1
    assert budget - len(rows) <= spent <= budget


def test_q262_sweep_monotone(spark, sf_dir):
    """Tightening the threshold can only drop FEWER docs/tokens, and
    the loosest cell agrees with the q41 pair table's doc_b count."""
    rows = sorted(
        all_queries()["q262_dedup_threshold_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    drops = [r.n_dropped_docs for r in rows]
    toks = [r.dropped_tokens for r in rows]
    assert drops == sorted(drops, reverse=True)
    assert toks == sorted(toks, reverse=True)
    from iceberg_daq_spark.operators import dedup
    from iceberg_daq_spark.tables import load

    d = load(spark, sf_dir, "documents")
    expect = (
        dedup.ngram_jaccard_prefix_pairs(
            d.select("doc_id", "text"), threshold=min(corpus_tuning._SWEEP)
        )
        .select("doc_b")
        .distinct()
        .count()
    )
    assert rows[0].n_dropped_docs == expect


def test_q259_zero_decile_survives_without_sharing_pairs(spark, tmp_path):
    """Adversarial corpus for the decile-0 reconstruction: every
    shingle-sharing pair is identical (Jaccard 1.0), every other pair
    shares nothing - decile 0 must still carry the full arithmetic
    remainder with zero collisions (the unioned zero_rest row), and
    decile 9 must show the identical pair colliding."""
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (4, "one two three four five six"),
        (6, "red green blue cyan magenta yellow"),
        (8, "cat dog bird fish mouse horse"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.jbin: r
        for r in all_queries()["q259_lsh_band_calibration"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    m = len(docs)
    assert set(rows) == {0, 9}
    assert rows[9].n_pairs == 1 and rows[9].n_collide == 1
    assert rows[0].n_pairs == m * (m - 1) // 2 - 1
    assert rows[0].n_collide == 0


def test_q264_identical_docs_hamming_zero(spark, tmp_path):
    """Engineered corpus: an identical doc pair must land in the top
    Jaccard decile with Hamming distance exactly 0, and every decile's
    mean/min/max must be consistent (0 <= min <= mean/100 <= max <= 64)."""
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (4, "one two three four five six seven"),
        (6, "red green blue cyan magenta yellow"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.jbin: r
        for r in all_queries()["q264_simhash_hamming_calibration"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert 9 in rows
    assert rows[9].n_pairs == 1
    assert rows[9].min_hamming == 0 and rows[9].max_hamming == 0
    assert rows[9].mean_hamming_x100 == 0
    for r in rows.values():
        assert 0 <= r.min_hamming <= r.max_hamming <= 64
        assert r.min_hamming * 100 <= r.mean_hamming_x100 <= r.max_hamming * 100


def test_q265_scorer_locked_to_q84():
    """q265's eval must measure the ranker q84 actually runs: the
    shared BM25 constants interpolate into q265's oracle, and q84's
    (static) oracle hard-codes the same values - changing one without
    the other breaks this tripwire."""
    from iceberg_daq_spark.queries import corpus_tuning as ct
    from iceberg_daq_spark.queries.llm import BM25_B, BM25_K1

    k1p1, k1, omb, b = (
        f"{BM25_K1 + 1}",
        f"{BM25_K1}",
        f"{round(1 - BM25_B, 10)}",
        f"{BM25_B}",
    )
    q84_oracle = all_queries()["q84_bm25_search"].oracle
    for frag in (f"* {k1p1}", f"{k1} * ({omb} + {b} *"):
        assert frag in q84_oracle, frag
        assert frag in ct._Q265_ORACLE, frag
