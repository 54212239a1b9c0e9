"""Independent-recomputation properties for the round-8 wave-AB keys
(circular statistics, Bass diffusion fit, newsvendor quantity)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_circular_stats_match_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT hour(ts) * 3600 + minute(ts) * 60"
        " + CAST(floor(second(ts)) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    th = np.array([r[0] for r in rows], dtype=np.float64) * 2 * math.pi / 86400
    cq = np.floor(np.cos(th) * 1e9 + 0.5).sum() / 1e9
    sq = np.floor(np.sin(th) * 1e9 + 0.5).sum() / 1e9
    n = len(th)
    r_bar = math.hypot(cq, sq) / n
    mean_hour = (math.atan2(sq, cq) % (2 * math.pi)) * 24 / (2 * math.pi)
    z = n * r_bar**2
    row = REGISTRY["stat_circular_stats"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["r_bar"] - r_bar) < 2e-4
    assert abs(row["mean_hour"] - mean_hour) < 2e-3
    assert abs(row["rayleigh_z"] - z) < 2e-3
    assert abs(row["p_approx"] - math.exp(-z)) < 2e-4
    assert 0.0 <= row["r_bar"] <= 1.0
    assert 0.0 <= row["mean_hour"] < 24.0


def test_bass_diffusion_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT user_id, min(CAST(ts AS DATE))"
        f" FROM '{sf_dir}/events.parquet'"
        " WHERE event_type = 'purchase' GROUP BY user_id"
    ).fetchall()
    d0 = min(r[1] for r in rows)
    counts = Counter((r[1] - d0).days for r in rows)
    ts = sorted(counts)
    n_t = np.array([counts[t] for t in ts], dtype=np.float64)
    c = np.concatenate([[0], np.cumsum(n_t)[:-1]])
    X = np.column_stack([np.ones_like(c), c, c * c])
    coef, *_ = np.linalg.lstsq(X, n_t, rcond=None)
    av, bv, cv = coef
    row = REGISTRY["events_bass_diffusion"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(ts)
    assert row["n_adopters"] == int(n_t.sum())
    assert abs(row["a"] - av) < max(2e-3, 1e-3 * abs(av))
    assert abs(row["b"] - bv) < max(2e-3, 1e-3 * abs(bv))
    assert abs(row["c"] - cv) < max(2e-3, 1e-3 * abs(cv))
    disc = bv * bv - 4 * av * cv
    if cv < 0 and disc >= 0:
        m = (-bv - math.sqrt(disc)) / (2 * cv)
        assert abs(row["m_hat"] - m) < max(1e-2, 1e-3 * abs(m))
        assert abs(row["p_hat"] - av / m) < 2e-3
        assert abs(row["q_hat"] - (av / m + bv)) < 2e-3
    else:
        assert row["m_hat"] == 0.0


def test_newsvendor_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(l_shipdate AS DATE), sum(CAST(l_quantity AS BIGINT))"
        f" FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    demands = sorted(int(r[1]) for r in rows)
    t = len(demands)
    # smallest q with 100*F(q) >= 80: index ceil(0.8*T) in 1-based terms
    idx = next(i for i in range(1, t + 1) if 100 * i >= 80 * t)
    q_star = demands[idx - 1]
    # demands may tie: q_star is the smallest distinct value whose
    # cumulative count crosses the threshold — recompute on the grid
    grid = Counter(demands)
    cum = 0
    for d in sorted(grid):
        cum += grid[d]
        if 100 * cum >= 80 * t:
            q_star = d
            break
    row = REGISTRY["orders_newsvendor"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == t
    assert row["critical_ratio_pct"] == 80
    assert row["q_star"] == q_star
    mean_d = sum(demands) / t
    assert abs(row["mean_demand"] - mean_d) < 2e-3
    assert abs(row["q_over_mean"] - q_star / mean_d) < 2e-4
    # the 80th-percentile stock never sits below the median demand
    assert row["q_star"] >= demands[t // 2 - 1]
