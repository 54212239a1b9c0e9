"""Independent-recomputation properties for the round-8 wave-AG keys
(linear CKA between embedding halves, sign test, Wilson CI)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_cka_halves_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    eq = np.floor(
        np.array([r[0] for r in rows], dtype=np.float64) * 1e6 + 0.5
    )
    n = len(eq)
    x, y = eq[:, :32], eq[:, 32:]
    # replicate the operator exactly: raw second moments, analytic
    # centering, real-unit covariances, 1e-12 quantized Frobenius folds
    cxy = (x.T @ y - np.outer(x.sum(0), y.sum(0)) / n) / n / 1e12
    cxx = (x.T @ x - np.outer(x.sum(0), x.sum(0)) / n) / n / 1e12
    cyy = (y.T @ y - np.outer(y.sum(0), y.sum(0)) / n) / n / 1e12
    hxy = np.floor(cxy * cxy * 1e12 + 0.5).sum()
    hxx = np.floor(cxx * cxx * 1e12 + 0.5).sum()
    hyy = np.floor(cyy * cyy * 1e12 + 0.5).sum()
    cka = hxy / math.sqrt(hxx * hyy)
    row = REGISTRY["embed_cka_halves"].build(spark, sf_dir).collect()[0]
    assert row["dims_per_half"] == 32
    assert abs(row["cka_linear"] - cka) < 2e-4
    # CKA is a normalized alignment: in [0, 1]
    assert 0.0 <= row["cka_linear"] <= 1.0
    # sanity: full-precision numpy CKA agrees to ~1e-3
    e = np.array([r[0] for r in rows], dtype=np.float64)
    xc = e[:, :32] - e[:, :32].mean(0)
    yc = e[:, 32:] - e[:, 32:].mean(0)
    full = np.linalg.norm(xc.T @ yc / n, "fro") ** 2 / (
        np.linalg.norm(xc.T @ xc / n, "fro")
        * np.linalg.norm(yc.T @ yc / n, "fro")
    )
    assert abs(row["cka_linear"] - full) < 5e-3


def test_sign_test_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(ts AS DATE), count_if(event_type = 'click'),"
        f" count_if(event_type = 'view') FROM '{sf_dir}/events.parquet'"
        " GROUP BY 1"
    ).fetchall()
    n_pos = sum(1 for _, x, y in rows if x > y)
    n_neg = sum(1 for _, x, y in rows if x < y)
    n_tie = sum(1 for _, x, y in rows if x == y)
    m = n_pos + n_neg
    z = (n_pos - 0.5 * m) / math.sqrt(0.25 * m)
    row = REGISTRY["stat_sign_test"].build(spark, sf_dir).collect()[0]
    assert row["n_pos"] == n_pos and row["n_neg"] == n_neg
    assert row["n_tie"] == n_tie
    assert abs(row["z"] - z) < 2e-3
    assert row["significant"] == (
        abs(math.floor(z * 10000 + 0.5) / 10000.0) > 1.96
    )


def test_wilson_ci_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT event_type, count(*), count_if(hour(ts) >= 18)"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1"
    ).fetchall()
    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_wilson_ci"].build(spark, sf_dir).collect()
    }
    assert set(got) == {r[0] for r in rows}
    z = 1.96
    for et, n, k in rows:
        p = k / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        row = got[et]
        assert row["n"] == n and row["k"] == k
        assert abs(row["p_hat"] - p) < 2e-4
        assert abs(row["ci_lo"] - (center - half) / denom) < 2e-3
        assert abs(row["ci_hi"] - (center + half) / denom) < 2e-3
        # Wilson interval is a proper subset of [0, 1] containing p
        assert 0.0 <= row["ci_lo"] <= row["p_hat"] <= row["ci_hi"] <= 1.0
