"""Round-14 wave A: from-scratch Python recomputation tests.

Each key is re-derived with numpy/duckdb from the raw parquet —
independent of the Spark build AND the DuckDB oracle SQL (the
third-engine discipline), at BOTH fixture SFs via the conftest
``sf_dir`` fixture + the explicit sf0.01 override in CI-grade runs.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _scores(sf_dir: str) -> np.ndarray:
    """The shared deterministic embedding scorer (same formula as
    ml_fleiss_kappa's raters), quantized to 1e-6."""
    rows = duckdb.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    w = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])
    emb = np.array([r[0] for r in rows], dtype=np.float64)
    return np.floor((emb @ w + 0.5) * 1e6 + 0.5).astype(np.int64)


def test_krippendorff_alpha_matches_numpy(spark, sf_dir):
    sq = _scores(sf_dir)
    m = 3
    n_pos = sum((sq > t).astype(int) for t in (-500_000, 0, 500_000))
    n_units = len(sq)
    n = n_units * m
    # observed disagreement from per-unit coincidences, expected from
    # the pooled value distribution with the finite-sample n-1
    d_obs = float((2 * n_pos * (m - n_pos)).sum()) / (n_units * m * (m - 1))
    p_tot = int(n_pos.sum())
    d_exp = 2.0 * p_tot * (n - p_tot) / (n * (n - 1))
    alpha = 1.0 - d_obs / d_exp
    row = REGISTRY["ml_krippendorff_alpha"].build(spark, sf_dir).collect()[0]
    assert row["n_units"] == n_units and row["n_values"] == n
    assert abs(row["d_obs"] - d_obs) < 2e-4
    assert abs(row["d_exp"] - d_exp) < 2e-4
    assert abs(row["alpha"] - alpha) < 2e-3
    # same raters as Fleiss: agreement above chance, alpha in (0, 1]
    assert 0 < row["alpha"] <= 1


def test_krippendorff_close_to_fleiss_on_large_n(spark, sf_dir):
    """alpha and Fleiss' kappa share the observed-agreement numerator
    and differ only by the n/(n-1) chance correction — on hundreds of
    units they must land within a small gap."""
    a = REGISTRY["ml_krippendorff_alpha"].build(spark, sf_dir).collect()[0]
    k = REGISTRY["ml_fleiss_kappa"].build(spark, sf_dir).collect()[0]
    assert abs(a["alpha"] - k["kappa"]) < 0.05


def test_mmd_linear_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT label, vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " WHERE label IN (0, 1) ORDER BY vec_id"
    ).fetchall()
    pairs: dict[int, dict[int, list[np.ndarray]]] = {0: {}, 1: {}}
    for label, vec_id, emb in rows:
        pairs[label].setdefault(vec_id % 16, []).append(
            np.array(emb, dtype=np.float64)
        )

    def k(u, v):
        d = u - v
        return math.exp(-float(d @ d) / 128.0)

    h_sum_nano = 0
    n_pairs = 0
    for bkt in range(16):
        xs = pairs[0].get(bkt, [])
        ys = pairs[1].get(bkt, [])
        for p in range(min(len(xs) // 2, len(ys) // 2)):
            xa, xb = xs[2 * p], xs[2 * p + 1]
            ya, yb = ys[2 * p], ys[2 * p + 1]
            h = k(xa, xb) + k(ya, yb) - k(xa, yb) - k(xb, ya)
            h_sum_nano += math.floor(h * 1e9 + 0.5)
            n_pairs += 1
    row = REGISTRY["embed_mmd_linear"].build(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n_pairs
    # exact integer statistic: the fold must match to the unit
    # (numpy's dot may differ from the sequential fold in the last
    # ulp, which can move a floor boundary by 1 on rare quadruples)
    assert abs(row["h_sum_nano"] - h_sum_nano) <= n_pairs
    assert abs(row["mmd2_micro"] - h_sum_nano / 1e9 / n_pairs * 1e6) < 2.0
    # same synthetic generator for both labels: MMD^2 must be tiny
    # compared to the kernel scale (1.0)
    assert abs(row["mmd2_micro"]) < 1e5  # mmd^2 < 0.1 in micro-units


def test_taylor_law_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT l_partkey, CAST(floor(l_quantity*100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    per: dict[int, list[int]] = {}
    for pk, qc in rows:
        per.setdefault(pk, []).append(qc)
    lx, ly = [], []
    for qs in per.values():
        if len(qs) < 2:
            continue
        a = np.array(qs, dtype=np.float64)
        mean = a.sum() / len(a) / 100.0
        var = (
            ((a * a).sum() - a.sum() * a.sum() / len(a))
            / (len(a) - 1)
            / 10000.0
        )
        if mean > 0 and var > 0:
            lx.append(math.log(mean))
            ly.append(math.log(var))
    x, y = np.array(lx), np.array(ly)
    kk = len(x)
    den = kk * (x * x).sum() - x.sum() ** 2
    slope = (kk * (x * y).sum() - x.sum() * y.sum()) / den
    intercept = (y.sum() - slope * x.sum()) / kk
    row = REGISTRY["stat_taylor_law"].build(spark, sf_dir).collect()[0]
    assert row["n_groups"] == kk
    assert abs(row["slope_b"] - slope) < 2e-3
    assert abs(row["intercept_ln_a"] - intercept) < 5e-3
    # quantities are bounded uniforms per part: means cluster, so the
    # fit exists; slope must be finite and the law's exponent should
    # land in the documented 0..2 band for non-pathological demand
    assert -1.0 < row["slope_b"] < 3.0
