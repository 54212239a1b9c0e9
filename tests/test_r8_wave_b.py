"""Independent-recomputation properties for the round-8 wave-B
two-sample / econometric / spatial statistics (energy distance,
Cliff's delta, Ansari-Bradley, Breusch-Pagan, Chow, Moran's I): each
statistic is re-derived with plain Python/numpy from the raw parquet —
a third engine besides Spark and DuckDB."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _two_groups(sf_dir):
    rows = duckdb.execute(
        "SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
        " WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    g1 = np.array([v for t, v in rows if t == "click"], dtype=np.int64)
    g2 = np.array([v for t, v in rows if t == "purchase"], dtype=np.int64)
    return g1, g2


def _ecdf_on_grid(g1, g2):
    grid = np.unique(np.concatenate([g1, g2]))
    f1 = np.searchsorted(np.sort(g1), grid, side="right") / len(g1)
    f2 = np.searchsorted(np.sort(g2), grid, side="right") / len(g2)
    return grid, f1, f2


def test_energy_distance_matches_numpy(spark, sf_dir):
    g1, g2 = _two_groups(sf_dir)
    grid, f1, f2 = _ecdf_on_grid(g1, g2)
    gaps = np.diff(grid)
    e = 2.0 * float(np.sum((f1[:-1] - f2[:-1]) ** 2 * gaps)) / 100.0
    row = REGISTRY["stat_energy_distance"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == len(g1) and row["n2"] == len(g2)
    assert abs(row["energy_dist"] - e) < 1e-3
    # energy distance is a metric: strictly positive for distinct samples
    assert row["energy_dist"] > 0


def test_cliffs_delta_matches_bruteforce(spark, sf_dir):
    g1, g2 = _two_groups(sf_dir)
    gt = sum(int((y < x).sum()) for x, y in ((g1[:, None], g2),))
    lt = sum(int((y > x).sum()) for x, y in ((g1[:, None], g2),))
    delta = (gt - lt) / (len(g1) * len(g2))
    row = REGISTRY["stat_cliffs_delta"].build(spark, sf_dir).collect()[0]
    assert abs(row["delta"] - delta) < 1e-3
    exp_mag = (
        "negligible"
        if abs(delta) < 0.147
        else "small"
        if abs(delta) < 0.33
        else "medium"
        if abs(delta) < 0.474
        else "large"
    )
    assert row["magnitude"] == exp_mag


def test_ansari_bradley_matches_midrank(spark, sf_dir):
    g1, g2 = _two_groups(sf_dir)
    pooled = np.sort(np.concatenate([g1, g2]))
    n = len(pooled)
    ranks = np.arange(1, n + 1)
    scores = np.minimum(ranks, n + 1 - ranks).astype(np.float64)
    # midrank-average scores over tie blocks
    avg = defaultdict(float)
    cnt = defaultdict(int)
    for v, s in zip(pooled, scores):
        avg[v] += s
        cnt[v] += 1
    ab = float(sum(avg[v] / cnt[v] for v in g1))
    row = REGISTRY["stat_ansari_bradley"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == len(g1) and row["n2"] == len(g2)
    assert abs(row["ab_stat"] - ab) < max(1e-2, 1e-6 * ab)
    assert abs(row["ab_mean"] - ab / len(g1)) < 1e-3


def _events_xy(sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(hour(ts) AS BIGINT),"
        " CAST(floor(value*100 + 0.5) AS BIGINT),"
        " ts"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.int64)
    y = np.array([r[1] for r in rows], dtype=np.int64)
    ts = np.array([np.datetime64(r[2]) for r in rows])
    return x, y, ts


def _ols(x, y):
    n = len(x)
    sx, sy = x.sum(), y.sum()
    sxx, sxy = (x * x).sum(), (x * y).sum()
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    return a, b


def test_breusch_pagan_matches_numpy(spark, sf_dir):
    x, y, _ = _events_xy(sf_dir)
    a, b = _ols(x.astype(np.float64), y.astype(np.float64))
    e = y - a - b * x
    u = np.floor(e**2 / 10000.0 + 0.5)
    n = len(x)
    r2_num = (n * (x * u).sum() - x.sum() * u.sum()) ** 2
    r2_den = (n * (x * x).sum() - x.sum() ** 2) * (n * (u * u).sum() - u.sum() ** 2)
    lm = n * r2_num / r2_den
    row = REGISTRY["stat_breusch_pagan"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["lm_stat"] - lm) < max(1e-3, 1e-5 * lm)
    assert row["het_significant"] == (lm > 3.8415)


def test_chow_matches_numpy(spark, sf_dir):
    x, y, ts = _events_xy(sf_dir)
    split = np.datetime64("2024-01-15")
    xf, yf = x.astype(np.float64), y.astype(np.float64)

    def ssr(mask):
        xs, ys = xf[mask], yf[mask]
        n = mask.sum()
        syy_c = (ys * ys).sum() - ys.sum() ** 2 / n
        sxy_c = (xs * ys).sum() - xs.sum() * ys.sum() / n
        sxx_c = (xs * xs).sum() - xs.sum() ** 2 / n
        return syy_c - sxy_c**2 / sxx_c

    m1 = ts < split
    s1, s2, sp = ssr(m1), ssr(~m1), ssr(np.ones_like(m1, dtype=bool))
    n = len(x)
    f = ((sp - s1 - s2) / 2.0) / ((s1 + s2) / (n - 4))
    row = REGISTRY["stat_chow_test"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == int(m1.sum()) and row["n2"] == int((~m1).sum())
    assert abs(row["f_stat"] - f) < max(1e-3, 1e-4 * abs(f))
    assert row["break_significant"] == (f > 2.9957)


def _md5_coord(salt, key):
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:6]
    return int(h, 16) / 16777216.0


def test_moran_i_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT c_custkey, CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    cells = defaultdict(int)
    for k, bal in rows:
        cx = int(np.floor(_md5_coord("cx", k) / 0.05))
        cy = int(np.floor(_md5_coord("cy", k) / 0.05))
        cells[(cx, cy)] += bal
    vals = np.array(list(cells.values()), dtype=np.float64)
    mean = vals.sum() / len(vals)
    zq = {c: np.floor((v - mean) / 100.0 + 0.5) for c, v in cells.items()}
    num = 0.0
    w = 0
    for (cx, cy), za in zq.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nb = (cx + dx, cy + dy)
                if nb in zq:
                    num += za * zq[nb]
                    w += 1
    den = sum(v * v for v in zq.values())
    moran = len(zq) / w * num / den
    row = REGISTRY["stat_moran_i"].build(spark, sf_dir).collect()[0]
    assert row["n_cells"] == len(zq)
    assert row["w_pairs"] == w
    assert abs(row["moran_i"] - moran) < 1e-3
