"""Independent-recomputation properties for the round-8 wave-X keys
(chi2 feature selection, KS model separation, Brunner-Munzel)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_W = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])


def _embeddings(sf_dir):
    rows = duckdb.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    labels = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    return labels % 2, emb


def test_chi2_select_matches_numpy(spark, sf_dir):
    y, emb = _embeddings(sf_dir)
    got = {
        r["feature_idx"]: r
        for r in REGISTRY["ml_chi2_select"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 9))
    for i in range(1, 9):
        f = (emb[:, i - 1] > 0).astype(int)
        a = int(((f == 1) & (y == 1)).sum())
        b = int(((f == 1) & (y == 0)).sum())
        c = int(((f == 0) & (y == 1)).sum())
        d = int(((f == 0) & (y == 0)).sum())
        n = a + b + c + d
        chi2 = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
        row = got[i]
        assert row["n"] == n
        assert abs(row["chi2"] - chi2) < 2e-3
        assert row["selected"] == (
            math.floor(chi2 * 10000 + 0.5) / 10000.0 > 3.8415
        )


def test_ks_separation_matches_numpy(spark, sf_dir):
    y, emb = _embeddings(sf_dir)
    sq = np.floor((emb @ _W + 0.5) * 1e6 + 0.5).astype(np.int64)
    n1, n0 = int(y.sum()), int((1 - y).sum())
    vals = np.unique(sq)
    cpos = np.array([(sq[y == 1] <= v).sum() for v in vals], dtype=np.int64)
    cneg = np.array([(sq[y == 0] <= v).sum() for v in vals], dtype=np.int64)
    gap = np.abs(cneg * n1 - cpos * n0)
    mg = gap.max()
    thr = vals[gap == mg].max()
    row = REGISTRY["ml_ks_separation"].build(spark, sf_dir).collect()[0]
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    assert abs(row["ks_stat"] - mg / n0 / n1) < 2e-4
    assert row["ks_threshold_q"] == thr
    # KS of any scorer lies in [0, 1]
    assert 0.0 <= row["ks_stat"] <= 1.0


def test_brunner_munzel_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
        " WHERE l_returnflag IN ('A', 'R')"
    ).fetchall()
    xa = np.array([v for g, v in rows if g == "A"], dtype=np.float64)
    xr = np.array([v for g, v in rows if g == "R"], dtype=np.float64)
    na, nr = len(xa), len(xr)
    comb = np.concatenate([xa, xr])
    order = np.argsort(comb, kind="stable")
    # midranks via value counts (exact, ties averaged)
    def midranks(sample, pool):
        pool_sorted = np.sort(pool)
        lo = np.searchsorted(pool_sorted, sample, side="left")
        hi = np.searchsorted(pool_sorted, sample, side="right")
        return (lo + hi + 1) / 2.0

    rc_a = midranks(xa, comb)
    rc_r = midranks(xr, comb)
    ri_a = midranks(xa, xa)
    ri_r = midranks(xr, xr)
    rbar_a, rbar_r = rc_a.mean(), rc_r.mean()
    s_a = ((rc_a - ri_a - rbar_a + (na + 1) / 2.0) ** 2).sum() / (na - 1)
    s_r = ((rc_r - ri_r - rbar_r + (nr + 1) / 2.0) ** 2).sum() / (nr - 1)
    w = (
        na * nr * (rbar_r - rbar_a)
        / (na + nr)
        / math.sqrt(na * s_a + nr * s_r)
    )
    p_hat = (rbar_r - (nr + 1) / 2.0) / na
    row = REGISTRY["stat_brunner_munzel"].build(spark, sf_dir).collect()[0]
    assert row["na"] == na and row["nr"] == nr
    assert abs(row["p_hat"] - p_hat) < 2e-4
    assert abs(row["w_stat"] - w) < 2e-3
    # stochastic superiority is a probability
    assert 0.0 <= row["p_hat"] <= 1.0
    assert order is not None
