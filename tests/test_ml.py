"""Engine-independent reference checks for the training/forecast/
sketch batteries (q220-q228).

The oracle suite already proves Spark == DuckDB; these tests prove
both equal a THIRD, plain-Python/numpy implementation of the declared
algorithm - so a shared misreading of the recurrence/model can't hide
behind a matching hash.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from iceberg_daq_spark.registry import all_queries


def _fdiv(a: int, d: int) -> int:
    return a // d  # Python // floors, matching the engines' pmod form


def _monthly_cents(sf_dir: str) -> list[int]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT date_trunc('month', o_orderdate) AS mon,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' GROUP BY mon ORDER BY mon
        """
    ).fetchall()
    con.close()
    return [int(c) for _, c in rows]


def test_q220_matches_python_holt(spark, sf_dir):
    xs = _monthly_cents(sf_dir)
    assert len(xs) >= 3
    l, b, e = xs[1], xs[1] - xs[0], 0
    for x in xs[2:]:
        e += abs(x - (l + b))
        l_new = _fdiv(3 * x + 7 * (l + b), 10)
        b = _fdiv(2 * (l_new - l) + 8 * b, 10)
        l = l_new
    expect = {
        h: round((l + h * b) / 100.0, 2) for h in (1, 2, 3)
    }
    df = all_queries()["q220_holt_forecast"].fn(spark, sf_dir)
    got = {r["horizon"]: r["forecast"] for r in df.collect()}
    assert got == expect
    row = df.collect()[0]
    assert row["fit_mae"] == round(e / (len(xs) - 2) / 100.0, 2)


def test_q225_matches_numpy_irls(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(round(l_discount * 100) AS BIGINT),
               CAST(round(l_quantity) AS BIGINT),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()
    con.close()
    x1 = np.array([r[0] for r in rows], dtype=np.int64)
    x2 = np.array([r[1] for r in rows], dtype=np.int64)
    y = np.array([r[2] for r in rows], dtype=np.int64)
    X = np.stack([np.ones_like(x1), x1, x2], axis=1).astype(np.float64)
    # step 1 closed form: beta1 = 2 * G^{-1} t, exact integer sums
    G = X.T @ X
    t = X.T @ (2 * y - 1)
    beta1 = 2.0 * np.linalg.solve(G, t.astype(np.float64))
    # step 2: quantized IRLS update
    p = 1.0 / (1.0 + np.exp(-(X @ beta1)))
    wq = np.round(p * (1 - p) * 1_000_000).astype(np.int64)
    rq = np.round((y - p) * 1_000_000).astype(np.int64)
    A = (X * wq[:, None]).T @ X
    bvec = X.T @ rq.astype(np.float64)
    beta2 = beta1 + np.linalg.solve(A, bvec)
    acc = float(np.mean((X @ beta2 > 0).astype(int) == y))

    row = all_queries()["q225_logreg_train"].fn(spark, sf_dir).collect()[0]
    got = np.array([row["beta0"], row["beta1"], row["beta2"]])
    # the query reports 4-decimal-rounded betas; numpy solves by LU,
    # the engines by Cramer - agreement within one rounding bin
    assert np.allclose(got, beta2, rtol=0, atol=5.1e-5)
    assert abs(row["train_acc"] - round(acc, 4)) <= 1e-9
    assert 0.5 <= row["train_acc"] <= 1.0


def test_q226_matches_numpy_lloyd(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [r[0] for r in rows]
    xq = np.array(
        [[int(round(float(v) * 1_000_000)) for v in r[1]] for r in rows],
        dtype=np.int64,
    )
    cents = xq[:8].copy()
    for _ in range(2):
        # distances are exact integers; ties to the lowest cid
        d2 = ((xq[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes the first (lowest cid)
        dist = d2[np.arange(len(xq)), assign]
        new = []
        for cid in sorted(set(assign.tolist())):
            m = xq[assign == cid]
            new.append(np.round(m.sum(axis=0) / len(m)).astype(np.int64))
        cents = np.stack(new)
    sizes = {int(c): int((assign == c).sum()) for c in set(assign.tolist())}
    inertia = {
        int(c): round(float(dist[assign == c].sum()) / 1e12, 4)
        for c in set(assign.tolist())
    }
    rows = all_queries()["q226_kmeans_lloyd"].fn(spark, sf_dir).collect()
    assert {r["cluster_id"]: r["n_vecs"] for r in rows} == sizes
    assert {r["cluster_id"]: r["inertia"] for r in rows} == pytest.approx(
        inertia
    )


def test_q223_cms_never_undercounts(spark, sf_dir):
    rows = all_queries()["q223_countmin_heavy_hitters"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20  # capped at 20; fewer if fewer users
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_n"] >= r["exact_n"] for r in rows)


def test_q224_bloom_no_false_negatives(spark, sf_dir):
    row = all_queries()["q224_bloom_membership"].fn(spark, sf_dir).collect()[0]
    assert row["false_negatives"] == 0
    assert row["n_maybe"] >= row["n_members"]
    # 16 Kbit / 3 hashes over ~hundreds of members: fp rate must be
    # small but nonzero-able; just bound it sanely
    assert row["false_positives"] <= row["n_probed"] * 0.2


def test_q227_popularity_valve_is_principled(spark, sf_dir):
    """Every reported pair's per-part contribution is <= 1/ln(2): the
    valve floor (np >= 2) guarantees no divide-by-ln(1), and the max
    single-part contribution bounds the score by shared_parts."""
    rows = all_queries()["q227_adamic_adar"].fn(spark, sf_dir).collect()
    assert rows
    wmax = 1.0 / math.log(2.0)
    for r in rows:
        assert r["adamic_adar"] <= r["shared_parts"] * wmax + 1e-6
        assert r["adamic_adar"] > 0


def test_q228_confusion_matrix_accounts_all_holdout(spark, sf_dir):
    con = duckdb.connect()
    (n_test,) = con.execute(
        f"""
        SELECT count(*) FROM '{sf_dir}/documents.parquet'
        WHERE doc_id % 5 = 0
          AND length(trim(text)) > 0
        """
    ).fetchone()
    con.close()
    rows = all_queries()["q228_naive_bayes_langid"].fn(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == n_test
    # the synthetic corpus draws text and lang INDEPENDENTLY, so a
    # correct NB can only learn the prior: accuracy must land near the
    # majority-class rate, and every prediction must be a trained lang
    con = duckdb.connect()
    (maj,) = con.execute(
        f"""
        SELECT max(c) FROM (
          SELECT count(*) AS c FROM '{sf_dir}/documents.parquet'
          WHERE doc_id % 5 <> 0 GROUP BY lang)
        """
    ).fetchone()
    (n_train,) = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
        " WHERE doc_id % 5 <> 0"
    ).fetchone()
    con.close()
    correct = sum(r["n_docs"] for r in rows if r["actual"] == r["predicted"])
    prior = maj / n_train
    assert 0.05 <= correct / n_test <= prior + 0.3
    langs = {r["actual"] for r in rows}
    assert {r["predicted"] for r in rows} <= langs


def test_q232_matches_python_holt_winters(spark, sf_dir):
    xs = _monthly_cents(sf_dir)
    assert len(xs) >= 24
    l = sum(xs[:12]) // 12
    b = (sum(xs[12:24]) - sum(xs[:12])) // 144
    s = [x - l for x in xs[:12]]
    e = 0
    for x in xs[12:]:
        e += abs(x - (l + b + s[0]))
        l_new = _fdiv(3 * (x - s[0]) + 7 * (l + b), 10)
        b = _fdiv(2 * (l_new - l) + 8 * b, 10)
        s = s[1:] + [_fdiv((x - l_new) + 9 * s[0], 10)]
        l = l_new
    rows = all_queries()["q232_holt_winters"].fn(spark, sf_dir).collect()
    assert [r["horizon"] for r in rows] == [1, 2, 3, 4, 5, 6]
    for r in rows:
        h = r["horizon"]
        assert r["forecast"] == round((l + h * b + s[h - 1]) / 100.0, 2)
        assert r["seasonal"] == round(s[h - 1] / 100.0, 2)
    assert rows[0]["fit_mae"] == round(e / (len(xs) - 12) / 100.0, 2)


def test_q229_weights_are_poisson_like(spark, sf_dir):
    """The hash-drawn weights must distribute ~Poisson(1): mean ~1,
    and the resample means must bracket the point mean."""
    row = all_queries()["q229_poisson_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert row["n_resamples"] == 32
    assert row["ci_lo"] <= row["point_mean"] <= row["ci_hi"]
    assert row["boot_se"] > 0
    # SE of a mean over n orders with sd ~ point_mean-ish magnitude:
    # must shrink with n (loose magnitude check, not a tight bound)
    assert row["boot_se"] < row["point_mean"]
