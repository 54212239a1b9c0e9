"""Independent-recomputation properties for the round-9 wave-I keys
(Yule-Walker AR(2), Cox-Stuart, Page's L, 2-D Procrustes)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_yule_walker_ar2_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT date_trunc('hour', ts) AS h, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    y = np.array([r[1] for r in rows], dtype=float)
    n = len(y)
    z = y - y.mean()
    c0 = (z * z).sum() / n  # matches the operator's /n convention

    def r(k):
        return (z[k:] * z[:-k]).sum() / (z * z).sum()

    r1, r2 = r(1), r(2)
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    row = REGISTRY["stat_yule_walker_ar2"].build(spark, sf_dir).collect()[0]
    assert row["n_hours"] == n
    assert abs(row["r1"] - r1) < 1e-4
    assert abs(row["r2"] - r2) < 1e-4
    assert abs(row["phi1"] - phi1) < 1e-3
    assert abs(row["phi2"] - phi2) < 1e-3
    assert abs(row["noise_var"] - c0 * (1 - phi1 * r1 - phi2 * r2)) < max(
        1e-2, c0 * 1e-3
    )
    # innovation variance cannot exceed the series variance
    assert 0 < row["noise_var"] <= c0 + 1e-9


def test_cox_stuart_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    y = [r[1] for r in rows]
    n = len(y)
    half = n // 2
    n_up = n_dn = 0
    for i in range(n // 2):
        a, b = y[i], y[i + half]
        if b > a:
            n_up += 1
        elif b < a:
            n_dn += 1
    m = n_up + n_dn
    tail_from = max(n_up, n_dn)
    tail = sum(
        math.comb(m, k) for k in range(tail_from, m + 1)
    ) / 2**m
    p = min(1.0, 2 * tail)
    row = REGISTRY["stat_cox_stuart"].build(spark, sf_dir).collect()[0]
    assert (row["n_up"], row["n_dn"], row["m"]) == (n_up, n_dn, m)
    assert abs(row["p_two_sided"] - p) < 1e-3
    assert row["trend_detected"] == (row["p_two_sided"] < 0.05)
    assert row["increasing"] == (n_up > n_dn)


def test_page_trend_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT date_trunc('week', CAST(ts AS DATE)), hour(ts) // 6, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
    """).fetchall()
    wks = sorted({r[0] for r in rows})
    y = {(w, p): 0 for w in wks for p in range(4)}
    for w, p, c in rows:
        y[(w, p)] = c
    k, b = 4, len(wks)
    L = 0.0
    for w in wks:
        vals = [y[(w, p)] for p in range(4)]
        for p in range(4):
            less = sum(1 for v in vals if v < vals[p])
            eq = sum(1 for v in vals if v == vals[p])
            L += (p + 1) * (less + (eq + 1) / 2)
    e_l = b * k * (k + 1) ** 2 / 4
    sd = math.sqrt(b * k * k * (k + 1) * (k * k - 1) / 144)
    z = (L - e_l) / sd
    row = REGISTRY["stat_page_trend"].build(spark, sf_dir).collect()[0]
    assert row["n_blocks"] == b and row["k"] == k
    assert abs(row["page_l"] - L) < 1e-6
    assert abs(row["z"] - z) < 5e-3
    assert row["increasing_through_day"] == (z > 1.6449)


def test_procrustes_2d_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    E = np.array([r[0] for r in rows], dtype=np.float64)

    def sign(i, j):
        return 1.0 if (i * 31 + j * 17) % 2 == 0 else -1.0

    def proj(lo, axis):
        w = np.array([sign(lo + i, axis) for i in range(32)])
        return np.floor(E[:, lo - 1 : lo + 31] @ w / math.sqrt(32) * 1e6 + 0.5)

    A = np.column_stack([proj(1, 1), proj(1, 2)])
    B = np.column_stack([proj(33, 1), proj(33, 2)])
    A = A - A.mean(0)
    B = B - B.mean(0)
    M = A.T @ B
    theta = math.atan2(M[0, 1] - M[1, 0], M[0, 0] + M[1, 1])
    tr = math.sqrt((M[0, 0] + M[1, 1]) ** 2 + (M[0, 1] - M[1, 0]) ** 2)
    ssa = (A * A).sum()
    ssb = (B * B).sum()
    row = REGISTRY["embed_procrustes_2d"].build(spark, sf_dir).collect()[0]
    assert row["n"] == len(E)
    assert abs(row["rotation_rad"] - theta) < 1e-3
    assert abs(row["congruence"] - tr / math.sqrt(ssa * ssb)) < 1e-3
    assert abs(row["procrustes_d2"] - (ssa + ssb - 2 * tr) / 1e12) < max(
        1e-2, (ssa + ssb) / 1e12 * 1e-3
    )
    # congruence is a normalized trace: in [0, 1]
    assert 0 <= row["congruence"] <= 1 + 1e-9
    # verify against the brute-force optimal rotation
    c, s = math.cos(theta), math.sin(theta)
    R = np.array([[c, -s], [s, c]])
    d2_direct = ((A - B @ R.T) ** 2).sum() / 1e12
    assert abs(row["procrustes_d2"] - d2_direct) < max(1e-2, d2_direct * 1e-2)
