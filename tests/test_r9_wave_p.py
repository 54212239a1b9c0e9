"""Independent-recomputation properties for the round-9 wave-P keys
(Duane reliability growth, empirical-Bayes rate shrinkage)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_reliability_growth_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day, count(*)
        FROM '{sf_dir}/events.parquet' WHERE event_type = 'error'
        GROUP BY 1 ORDER BY 1
    """).fetchall()
    cum = np.cumsum([r[1] for r in rows])
    t = np.arange(1, len(cum) + 1)
    x = np.floor(np.log(t) * 1e9 + 0.5)
    y = np.floor(np.log(cum) * 1e9 + 0.5)
    n = len(x)
    beta = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    row = REGISTRY["events_reliability_growth"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert abs(row["duane_beta"] - beta) < 1e-3
    assert abs(row["growth_rate"] - (1 - beta)) < 1e-3
    assert row["reliability_improving"] == (beta < 1.0)
    # a cumulative count is nondecreasing, so beta > 0 always
    assert row["duane_beta"] > 0


def test_empirical_bayes_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT count(*), count_if(event_type = 'purchase')
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
    """).fetchall()
    pq = [math.floor(k / n * 1e9 + 0.5) for n, k in rows]
    m = len(pq)
    mu = sum(pq) / 1e9 / m
    v = (sum(p * p for p in pq) / 1e18 - sum(pq) ** 2 / 1e18 / m) / m
    alpha = mu * (mu * (1 - mu) / v - 1)
    beta = (1 - mu) * (mu * (1 - mu) / v - 1)
    ssq = svq = 0
    for n, k in rows:
        s = (k + alpha) / (n + alpha + beta)
        ssq += math.floor(s * 1e9 + 0.5)
        svq += math.floor((s - mu) ** 2 * 1e9 + 0.5)
    row = REGISTRY["stat_empirical_bayes_rates"].build(spark, sf_dir).collect()[0]
    assert row["n_users"] == m
    assert abs(row["mean_rate"] - mu) < 1e-4
    assert abs(row["alpha"] - alpha) < max(1e-3, alpha * 1e-3)
    assert abs(row["beta"] - beta) < max(1e-3, beta * 1e-3)
    assert abs(row["mean_shrunk_rate"] - ssq / 1e9 / m) < 1e-4
    assert abs(row["variance_ratio"] - (svq / 1e9 / m) / v) < 5e-3
    # shrinkage contracts the rate distribution: variance ratio < 1,
    # and the shrunken mean stays near the prior mean
    assert 0 < row["variance_ratio"] < 1
    assert abs(row["mean_shrunk_rate"] - mu) < 0.05
