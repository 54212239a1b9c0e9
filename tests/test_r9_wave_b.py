"""Independent-recomputation properties for the round-9 wave-B keys
(cross-correlation, Lin's CCC, Newey-West HAC, White's LM test,
Engle-Granger cointegration)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _daily_counts(sf_dir):
    return duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day,
               count_if(event_type = 'click'),
               count_if(event_type = 'purchase')
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()


def _daily_cents(sf_dir):
    return duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day,
               sum(CASE WHEN event_type = 'click'
                   THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END),
               sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()


def test_ccf_matches_numpy(spark, sf_dir):
    rows = _daily_counts(sf_dir)
    x = np.array([r[1] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    n = len(x)
    sx = math.sqrt(((x - x.mean()) ** 2).mean())
    sy = math.sqrt(((y - y.mean()) ** 2).mean())
    got = {
        r["lag"]: r for r in REGISTRY["stat_ccf"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(range(-7, 8))
    for k in range(-7, 8):
        if k >= 0:
            num = ((x[: n - k] - x.mean()) * (y[k:] - y.mean())).sum() / n
        else:
            num = ((x[-k:] - x.mean()) * (y[: n + k] - y.mean())).sum() / n
        r = num / (sx * sy)
        assert abs(got[k]["ccf"] - r) < 2e-4, (k, got[k]["ccf"], r)
        assert got[k]["n_ov"] == n - abs(k)
    # CCF at lag 0 equals the Pearson correlation of the two series
    r0 = float(np.corrcoef(x, y)[0, 1])
    assert abs(got[0]["ccf"] - r0) < 2e-4


def test_lin_ccc_matches_numpy(spark, sf_dir):
    rows = _daily_cents(sf_dir)
    x = np.array([r[1] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    cxx = ((x - x.mean()) ** 2).mean()
    cyy = ((y - y.mean()) ** 2).mean()
    ccc = 2 * cxy / (cxx + cyy + (x.mean() - y.mean()) ** 2)
    r = cxy / math.sqrt(cxx * cyy)
    row = REGISTRY["stat_lin_ccc"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(x)
    assert abs(row["pearson_r"] - r) < 1e-4
    assert abs(row["lin_ccc"] - ccc) < 1e-4
    # |CCC| <= |r| (Lin 1989), so C_b = CCC/r in (0, 1]
    assert 0 < row["accuracy_cb"] <= 1.0 + 1e-9


def _ols(t, y):
    n = len(t)
    b = (n * (t * y).sum() - t.sum() * y.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (y.sum() - b * t.sum()) / n
    return a, b


def test_newey_west_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    y = np.array([r[1] for r in rows], dtype=float)
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    a, b = _ols(t, y)
    e = np.floor(y - a - b * t + 0.5)  # the operator's exact-cents residual
    lw = int(4 * (n / 100) ** (2.0 / 9.0))
    xc = t - t.mean()
    u = xc * e
    s = (u * u).sum()
    for lag in range(1, lw + 1):
        w = 1 - lag / (lw + 1)
        s += 2 * w * (u[lag:] * u[:-lag]).sum()
    sxx = (xc * xc).sum()
    se_hac = math.sqrt(s / sxx**2)
    se_ols = math.sqrt((e * e).sum() / (n - 2) / sxx)
    row = REGISTRY["stat_newey_west"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == n and row["nw_lag"] == lw
    assert abs(row["slope_dollars"] - b / 100) < max(2e-4, abs(b) * 1e-5)
    assert abs(row["se_ols"] - se_ols / 100) < max(2e-4, se_ols * 1e-4)
    assert abs(row["se_hac"] - se_hac / 100) < max(2e-4, se_hac * 1e-4)
    assert abs(row["t_hac"] - b / se_hac) < 5e-3


def test_white_test_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(o_orderdate AS DATE) AS day, count(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    y = np.array([r[1] for r in rows], dtype=float)
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    a, b = _ols(t, y)
    eq = np.floor((y - a - b * t) * 10000 + 0.5)  # DW_Q grid
    e2 = eq * eq
    X = np.column_stack([np.ones(n), t, t * t])
    coef, *_ = np.linalg.lstsq(X, e2, rcond=None)
    ss_reg = coef @ (X.T @ e2) - n * e2.mean() ** 2
    ss_tot = (e2 * e2).sum() - n * e2.mean() ** 2
    r2 = ss_reg / ss_tot
    row = REGISTRY["stat_white_test"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert abs(row["aux_r2"] - r2) < 2e-3
    assert abs(row["white_lm"] - n * r2) < max(0.05, n * r2 * 5e-3)
    assert 0 <= row["aux_r2"] <= 1


def test_cointegration_eg_matches_numpy(spark, sf_dir):
    rows = _daily_cents(sf_dir)
    x = np.array([r[1] for r in rows], dtype=float)
    y = np.array([r[2] for r in rows], dtype=float)
    n = len(x)
    b = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    a = (y.sum() - b * x.sum()) / n
    u = np.floor(y - a - b * x + 0.5)
    du = u[1:] - u[:-1]
    ul = u[:-1]
    gamma = (ul * du).sum() / (ul * ul).sum()
    ssr = (du * du).sum() - gamma * (ul * du).sum()
    tau = gamma / math.sqrt(ssr / (len(du) - 1) / (ul * ul).sum())
    row = REGISTRY["stat_cointegration_eg"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert abs(row["beta"] - b) < max(1e-4, abs(b) * 1e-4)
    assert abs(row["gamma"] - gamma) < 1e-3
    assert abs(row["tau"] - tau) < 5e-3
    # gamma in (-2, 0] for a stationary-or-unit-root residual process
    assert -2.0 < gamma <= 1e-9
    assert row["cointegrated"] == (tau < -3.37)
