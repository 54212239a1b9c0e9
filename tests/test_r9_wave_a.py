"""Independent-recomputation properties for the round-9 wave-A keys
(Kuiper, Cucconi, D'Agostino K², Geary's C, Getis-Ord G).

Each test recomputes the statistic from the raw parquet with plain
Python/numpy (a third engine besides Spark and the DuckDB oracle) and
checks the registered operator against it.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _two_groups(sf_dir):
    rows = duckdb.execute(f"""
        SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
        WHERE event_type IN ('click', 'purchase')
    """).fetchall()
    g1 = sorted(v for t, v in rows if t == "click")
    g2 = sorted(v for t, v in rows if t == "purchase")
    return g1, g2


def test_kuiper_matches_python(spark, sf_dir):
    g1, g2 = _two_groups(sf_dir)
    n1, n2 = len(g1), len(g2)
    grid = sorted(set(g1) | set(g2))
    c1 = Counter(g1)
    c2 = Counter(g2)
    dplus = dminus = 0.0
    cum1 = cum2 = 0
    for v in grid:
        cum1 += c1[v]
        cum2 += c2[v]
        f1, f2 = cum1 / n1, cum2 / n2
        dplus = max(dplus, f1 - f2)
        dminus = max(dminus, f2 - f1)
    row = REGISTRY["stat_kuiper_test"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["d_plus"] - dplus) < 2e-4
    assert abs(row["d_minus"] - dminus) < 2e-4
    assert abs(row["kuiper_v"] - (dplus + dminus)) < 3e-4
    sqrt_ne = math.sqrt(n1 * n2 / (n1 + n2))
    vstat = (dplus + dminus) * (sqrt_ne + 0.155 + 0.24 / sqrt_ne)
    assert abs(row["v_stat"] - vstat) < 2e-3
    # V >= D (KS) always, and V <= 2 by construction
    assert row["kuiper_v"] >= max(dplus, dminus) - 1e-9
    assert row["kuiper_v"] <= 2.0


def test_cucconi_matches_python(spark, sf_dir):
    g1, g2 = _two_groups(sf_dir)
    n1, n2, nn = len(g1), len(g2), len(g1) + len(g2)
    # mid-ranks over the pooled sample
    pooled = sorted(g1 + g2)
    first = {}
    for i, v in enumerate(pooled, 1):
        first.setdefault(v, i)
    cnt = Counter(pooled)
    mid = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
    s1 = sum(mid[v] ** 2 for v in g2)
    s2 = sum((nn + 1 - mid[v]) ** 2 for v in g2)
    den = math.sqrt(n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0)
    u = (6 * s1 - n2 * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * s2 - n2 * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8.0 * nn + 11)) - 1.0
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    row = REGISTRY["stat_cucconi"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u"] - u) < 2e-3
    assert abs(row["v"] - v) < 2e-3
    assert abs(row["rho"] - rho) < 1e-4
    assert abs(row["c_stat"] - c) < 5e-3
    assert row["c_stat"] >= 0  # positive-definite quadratic form


def test_dagostino_k2_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT l_returnflag, CAST(l_quantity AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
    """).fetchall()
    by_flag = defaultdict(list)
    for fl, q in rows:
        by_flag[fl].append(q)
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_dagostino_k2"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(by_flag)
    for fl, xs in by_flag.items():
        a = np.array(xs, dtype=float)
        n = len(a)
        m2 = ((a - a.mean()) ** 2).mean()
        m3 = ((a - a.mean()) ** 3).mean()
        m4 = ((a - a.mean()) ** 4).mean()
        # skewness z (D'Agostino)
        y = (m3 / m2**1.5) * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
        b2 = (
            3.0
            * (n * n + 27 * n - 70)
            * (n + 1)
            * (n + 3)
            / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
        )
        w2 = -1 + math.sqrt(2 * (b2 - 1))
        ya = y / math.sqrt(2.0 / (w2 - 1))
        z_s = (1.0 / math.sqrt(math.log(math.sqrt(w2)))) * math.log(
            ya + math.sqrt(ya * ya + 1)
        )
        # kurtosis z (Anscombe-Glynn)
        x = (m4 / (m2 * m2) - 3.0 * (n - 1) / (n + 1)) / math.sqrt(
            24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
        )
        sb1 = (
            6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        ) * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
        aa = 6.0 + 8.0 / sb1 * (
            2.0 / sb1 + math.sqrt(1.0 + 4.0 / sb1**2)
        )
        inner = (1.0 - 2.0 / aa) / (1.0 + x * math.sqrt(2.0 / (aa - 4)))
        z_k = (
            (1.0 - 2.0 / (9.0 * aa)) - math.copysign(abs(inner) ** (1 / 3), inner)
        ) / math.sqrt(2.0 / (9.0 * aa))
        row = got[fl]
        assert row["n"] == n
        assert abs(row["z_skew"] - z_s) < 5e-3
        assert abs(row["z_kurt"] - z_k) < 5e-3
        assert abs(row["k2_stat"] - (z_s**2 + z_k**2)) < 2e-2


def _cells(sf_dir):
    # replicate joins.GRID_CELL machinery via the operator's own oracle SQL
    from etl_cnc_spark.operators.joins import GRID_CELL, _sql_coord

    return duckdb.execute(f"""
        SELECT CAST(floor({_sql_coord("cx", "c_custkey")} / {GRID_CELL})
                    AS BIGINT) AS cx,
               CAST(floor({_sql_coord("cy", "c_custkey")} / {GRID_CELL})
                    AS BIGINT) AS cy,
               CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS cnt
        FROM '{sf_dir}/customer.parquet' GROUP BY cx, cy
    """).fetchall()


def test_geary_c_matches_python(spark, sf_dir):
    cells = _cells(sf_dir)
    vmap = {(cx, cy): v for cx, cy, v, _ in cells}
    mean_v = sum(vmap.values()) / len(vmap)
    zq = {k: math.floor((v - mean_v) / 100.0 + 0.5) for k, v in vmap.items()}
    num = w = 0
    for (cx, cy), za in zq.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                zb = zq.get((cx + dx, cy + dy))
                if zb is not None:
                    num += (za - zb) ** 2
                    w += 1
    den = sum(z * z for z in zq.values())
    c = (len(zq) - 1) * num / (2.0 * w * den)
    row = REGISTRY["stat_geary_c"].build(spark, sf_dir).collect()[0]
    assert row["n_cells"] == len(zq) and row["w_pairs"] == w
    assert abs(row["geary_c"] - c) < 2e-4
    assert row["positive_autocorr"] == (c < 1.0)


def test_getis_ord_g_matches_python(spark, sf_dir):
    cells = _cells(sf_dir)
    cmap = {(cx, cy): cnt for cx, cy, _, cnt in cells}
    num = w = 0
    for (cx, cy), ca in cmap.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                cb = cmap.get((cx + dx, cy + dy))
                if cb is not None:
                    num += ca * cb
                    w += 1
    s1 = sum(cmap.values())
    s2 = sum(c * c for c in cmap.values())
    g = num / (s1 * s1 - s2)
    g_exp = w / (len(cmap) * (len(cmap) - 1))
    row = REGISTRY["stat_getis_ord_g"].build(spark, sf_dir).collect()[0]
    assert row["n_cells"] == len(cmap) and row["w_pairs"] == w
    assert abs(row["g_stat"] - g) < 1e-4
    assert abs(row["g_expected"] - g_exp) < 1e-4
    assert row["hot_clustering"] == (g > g_exp)
