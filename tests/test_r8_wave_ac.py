"""Independent-recomputation properties for the round-8 wave-AC keys
(quadratic-weighted kappa, Cochran-Armitage trend test)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_W = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])


def test_weighted_kappa_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    r1 = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    score = emb @ _W + 0.5
    r2 = np.minimum(9, np.maximum(0, np.floor((score + 3.0) / 0.6))).astype(
        np.int64
    )
    n = len(r1)
    wo = int(((r1 - r2) ** 2).sum())
    n1 = np.bincount(r1, minlength=10)
    n2 = np.bincount(r2, minlength=10)
    we = sum(
        (i - j) ** 2 * int(n1[i]) * int(n2[j])
        for i in range(10)
        for j in range(10)
    )
    kappa = 1 - wo * n / we
    row = REGISTRY["ml_weighted_kappa"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["kappa_quadratic"] - kappa) < 2e-4
    assert abs(row["mean_sq_disagreement"] - wo / n) < 2e-3
    # kappa_w <= 1 always; equality only for perfect agreement
    assert row["kappa_quadratic"] <= 1.0


def test_cochran_armitage_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT),"
        " count(*), count_if(o_orderstatus = 'F')"
        f" FROM '{sf_dir}/orders.parquet' GROUP BY 1"
    ).fetchall()
    nt = sum(r[1] for r in rows)
    at = sum(r[2] for r in rows)
    sn = sum(r[0] * r[1] for r in rows)
    s2n = sum(r[0] ** 2 * r[1] for r in rows)
    sa = sum(r[0] * r[2] for r in rows)
    p = at / nt
    z = (sa - at * sn / nt) / math.sqrt(p * (1 - p) * (s2n - sn * sn / nt))
    row = REGISTRY["stat_cochran_armitage"].build(spark, sf_dir).collect()[0]
    assert row["k"] == len(rows)
    assert row["nt"] == nt and row["at"] == at
    assert abs(row["z_trend"] - z) < 2e-3
    assert abs(row["pooled_rate"] - p) < 2e-4
