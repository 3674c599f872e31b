"""Structural axioms for the model-based batteries (q236-q239).

The oracle suite proves Spark == DuckDB; these assert the THEORY -
properties the algorithms must satisfy regardless of data - so a
shared implementation error that preserves cross-engine agreement
still gets caught.
"""

from __future__ import annotations

import duckdb

from iceberg_daq_spark.registry import all_queries


def test_q238_shapley_efficiency_axiom(spark, sf_dir):
    """Sum of Shapley values == v(grand coalition) - v(empty set):
    the efficiency axiom, with v the micro-unit per-mask conversion
    rate the query builds (unobserved masks = 0)."""
    rows = all_queries()["q238_shapley_attribution"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    total_phi = sum(r["shapley_value"] for r in rows)

    con = duckdb.connect()
    v = dict(
        con.execute(
            f"""
            WITH ord AS (
              SELECT user_id, event_type,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM '{sf_dir}/events.parquet'
            ), prn AS (
              SELECT user_id, min(rn) AS prn FROM ord
              WHERE event_type = 'purchase' GROUP BY user_id
            ), kept AS (
              SELECT o.user_id, o.event_type, p.prn IS NOT NULL AS conv
              FROM ord o LEFT JOIN prn p ON p.user_id = o.user_id
              WHERE p.prn IS NULL OR o.rn < p.prn
            ), chan(name, idx) AS (
              VALUES ('click', 0), ('error', 1), ('signup', 2), ('view', 3)
            ), umask AS (
              SELECT k.user_id, any_value(k.conv) AS conv,
                     CAST(sum(DISTINCT (1 << c.idx)) AS BIGINT) AS mask
              FROM kept k JOIN chan c ON c.name = k.event_type
              GROUP BY k.user_id
            )
            SELECT mask,
                   round(1000000 * sum(CASE WHEN conv THEN 1 ELSE 0 END)
                         * 1.0 / count(*)) / 1000000.0
            FROM umask GROUP BY mask
            """
        ).fetchall()
    )
    con.close()
    expected = v.get(15, 0.0) - v.get(0, 0.0)
    # phi values are rounded to 6 decimals; 4 of them sum
    assert abs(total_phi - expected) <= 4e-6


def test_q237_adaboost_error_bounds(spark, sf_dir):
    row = all_queries()["q237_adaboost_stumps"].fn(spark, sf_dir).collect()[0]
    # majority-side stumps can never exceed error 1/2, and a split
    # with positive information gain on an impure parent does better
    assert 0.0 < row["err1"] < 0.5
    assert row["alpha1"] > 0
    # stump 2 minimizes WEIGHTED error: at worst it matches 1/2
    assert 0.0 < row["err2"] <= 0.5
    assert row["alpha2"] >= 0
    assert 0.5 <= row["train_acc"] <= 1.0


def test_q236_markov_scenarios_are_consistent(spark, sf_dir):
    rows = all_queries()["q236_markov_attribution"].fn(spark, sf_dir).collect()
    assert {r["channel"] for r in rows} == {"click", "error", "signup", "view"}
    for r in rows:
        # removing a channel can only break conversion paths (up to
        # the micro-unit quantization of the iteration)
        assert r["removal_effect"] >= -1e-4
        assert 0.0 <= r["p_conv_without"] <= 1.0
    shares = sum(r["attribution_share"] for r in rows)
    assert abs(shares - 1.0) <= 5e-4


def test_q239_survivorship_fields_come_from_members(spark, sf_dir):
    rows = all_queries()["q239_survivorship"].fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    parts = {
        k: (n, p)
        for k, n, p in con.execute(
            f"SELECT p_partkey, p_name, p_retailprice FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    }
    con.close()
    for r in rows:
        assert r["n_members"] >= 2  # only real merge clusters surface
        # the golden id is a real record and donates its name
        assert r["golden_id"] in parts
        assert parts[r["golden_id"]][0] == r["golden_name"]
