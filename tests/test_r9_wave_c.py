"""Independent-recomputation properties for the round-9 wave-C keys
(survival C-index, Tweedie deviance, top-k accuracy, closed-form
ridge)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_survival_cindex_matches_bruteforce(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT user_id, min(CAST(ts AS DATE)),
               min(CASE WHEN event_type = 'purchase'
                   THEN CAST(ts AS DATE) END),
               max(CAST(ts AS DATE)),
               count_if(event_type = 'click')
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
    """).fetchall()
    subjects = []
    for _, entry, p_day, last, s in rows:
        if p_day is not None:
            subjects.append(((p_day - entry).days, 1, s))
        else:
            subjects.append(((last - entry).days, 0, s))
    num = den = 0.0
    comparable = 0
    for ti, ei, si in subjects:
        if not ei:
            continue
        for tj, _, sj in subjects:
            if ti < tj:
                comparable += 1
                den += 1
                if si > sj:
                    num += 1
                elif si == sj:
                    num += 0.5
    row = REGISTRY["ml_survival_cindex"].build(spark, sf_dir).collect()[0]
    assert row["n_subjects"] == len(subjects)
    assert row["n_events"] == sum(e for _, e, _ in subjects)
    assert row["comparable_pairs"] == comparable
    assert abs(row["c_index"] - num / den) < 1e-4
    assert 0.0 <= row["c_index"] <= 1.0


def test_tweedie_deviance_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(ts AS DATE), CAST(floor(value*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase' AND value > 0
    """).fetchall()
    by_day = defaultdict(list)
    for d, yc in rows:
        by_day[d].append(yc / 100.0)
    ys = np.array([y for d, yc in rows for y in [yc / 100.0]])
    mu_g = ys.mean()

    def dev(y, mu):
        return -8 * math.sqrt(y) + 4 * y / math.sqrt(mu) + 4 * math.sqrt(mu)

    d_null = sum(dev(y, mu_g) for y in ys)
    d_day = 0.0
    for d, yy in by_day.items():
        mu_d = sum(yy) / len(yy)
        d_day += sum(dev(y, mu_d) for y in yy)
    row = REGISTRY["ml_tweedie_deviance"].build(spark, sf_dir).collect()[0]
    assert row["n"] == len(ys)
    assert abs(row["mean_dev_null"] - d_null / len(ys)) < 1e-3
    assert abs(row["mean_dev_day"] - d_day / len(ys)) < 1e-3
    # the day-mean model can only improve in-sample deviance
    assert row["mean_dev_day"] <= row["mean_dev_null"] + 1e-9
    assert row["mean_dev_null"] >= 0 and row["mean_dev_day"] >= 0
    assert abs(row["deviance_r2"] - (1 - d_day / d_null)) < 1e-3


def test_topk_accuracy_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT label,
               list_aggregate([CAST(embedding[i] AS DOUBLE)
                   * (CAST(i * 37 % 19 - 9 AS DOUBLE) / 10.0)
                   for i in range(1, 65)], 'sum') + 0.5
        FROM '{sf_dir}/embeddings.parquet'
    """).fetchall()
    hits = {k: 0 for k in (1, 2, 3, 5)}
    for y, score in rows:
        p = (score + 3.0) / 0.6
        d_true = abs(p - (y + 0.5))
        n_better = sum(
            1
            for c in range(10)
            if abs(p - (c + 0.5)) < d_true
            or (abs(p - (c + 0.5)) == d_true and c < y)
        )
        for k in hits:
            if n_better < k:
                hits[k] += 1
    got = {
        r["k"]: r
        for r in REGISTRY["ml_topk_accuracy"].build(spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    prev = -1.0
    for k in (1, 2, 3, 5):
        assert got[k]["n"] == len(rows)
        assert got[k]["hits"] == hits[k], (k, got[k]["hits"], hits[k])
        # top-k accuracy is monotone non-decreasing in k
        assert got[k]["topk_accuracy"] >= prev
        prev = got[k]["topk_accuracy"]


def test_ridge_closed_form_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(floor(l_discount*100 + 0.5) AS BIGINT),
               CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
    """).fetchall()
    X = np.array([[q, d] for q, d, _ in rows], dtype=float)
    y = np.array([p for *_, p in rows], dtype=float)
    Xs = (X - X.mean(0)) / X.std(0)
    ys = (y - y.mean()) / y.std()
    n = len(y)
    R = (Xs.T @ Xs) / n
    ry = (Xs.T @ ys) / n
    ols = np.linalg.solve(R, ry)
    ridge = np.linalg.solve(R + 0.1 * np.eye(2), ry)
    row = REGISTRY["ml_ridge_closed_form"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["r12"] - R[0, 1]) < 1e-4
    assert abs(row["beta_qty_ols"] - ols[0]) < 1e-3
    assert abs(row["beta_disc_ols"] - ols[1]) < 1e-3
    assert abs(row["beta_qty_ridge"] - ridge[0]) < 1e-3
    assert abs(row["beta_disc_ridge"] - ridge[1]) < 1e-3
    # ridge shrinks the coefficient NORM relative to OLS
    norm_ols = row["beta_qty_ols"] ** 2 + row["beta_disc_ols"] ** 2
    norm_ridge = row["beta_qty_ridge"] ** 2 + row["beta_disc_ridge"] ** 2
    assert norm_ridge <= norm_ols + 1e-9
