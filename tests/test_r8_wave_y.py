"""Independent-recomputation properties for the round-8 wave-Y keys
(DeLong AUC CI, Gini-impurity stump split, EXISTS SQL surface,
Poisson rate ratio)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_W = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])


def _scored(sf_dir):
    rows = duckdb.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    y = np.array([r[0] for r in rows], dtype=np.int64) % 2
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    sq = np.floor((emb @ _W + 0.5) * 1e6 + 0.5).astype(np.int64)
    return y, sq


def test_delong_ci_matches_numpy(spark, sf_dir):
    y, sq = _scored(sf_dir)
    pos, neg = sq[y == 1], sq[y == 0]
    n1, n0 = len(pos), len(neg)
    # placement values via the midrank identity
    v10 = np.array(
        [((neg < x).sum() + 0.5 * (neg == x).sum()) / n0 for x in pos]
    )
    v01 = np.array(
        [((pos > x).sum() + 0.5 * (pos == x).sum()) / n1 for x in neg]
    )
    auc = v10.mean()
    assert abs(v01.mean() - auc) < 1e-12  # DeLong identity
    s10 = v10.var(ddof=1)
    s01 = v01.var(ddof=1)
    se = math.sqrt(s10 / n1 + s01 / n0)
    row = REGISTRY["ml_auc_delong_ci"].build(spark, sf_dir).collect()[0]
    assert row["n_pos"] == n1 and row["n_neg"] == n0
    assert abs(row["auc"] - auc) < 2e-4
    assert abs(row["se"] - se) < 2e-4
    assert abs(row["ci_lo"] - (auc - 1.96 * se)) < 4e-4
    assert abs(row["ci_hi"] - (auc + 1.96 * se)) < 4e-4
    assert row["ci_lo"] < row["auc"] < row["ci_hi"]


def test_gini_split_matches_numpy(spark, sf_dir):
    y, sq = _scored(sf_dir)
    n1, n0 = int(y.sum()), int((1 - y).sum())
    n = n1 + n0
    g_par = 1 - (n1 / n) ** 2 - (n0 / n) ** 2
    vals = np.unique(sq)
    best_gq, best_t, best_nl = -1, None, None
    for t in vals:
        m = sq <= t
        nl = int(m.sum())
        if nl == n:
            continue
        cpos = int(y[m].sum())
        cneg = nl - cpos
        rpos, rneg = n1 - cpos, n0 - cneg
        nr = n - nl
        g_l = 1 - (cpos / nl) ** 2 - (cneg / nl) ** 2
        g_r = 1 - (rpos / nr) ** 2 - (rneg / nr) ** 2
        gain = g_par - nl / n * g_l - nr / n * g_r
        gq = math.floor(gain * 1e12 + 0.5)
        if gq > best_gq or (gq == best_gq and t > best_t):
            best_gq, best_t, best_nl = gq, int(t), nl
    row = REGISTRY["ml_gini_impurity_split"].build(spark, sf_dir).collect()[0]
    assert row["threshold_q"] == best_t
    assert abs(row["gini_gain"] - best_gq / 1e12) < 2e-4
    assert abs(row["gini_parent"] - g_par) < 2e-4
    assert row["n_left"] == best_nl
    # any real split on a predictive score strictly reduces impurity
    assert row["gini_gain"] > 0


def test_sql_exists_matches_duckdb(spark, sf_dir):
    exp = {
        r[0]: r
        for r in duckdb.execute(f"""
            SELECT s.s_nationkey, count(*),
                   count(*) FILTER (WHERE EXISTS (
                       SELECT 1 FROM '{sf_dir}/lineitem.parquet' l
                       WHERE l.l_suppkey = s.s_suppkey
                         AND l.l_quantity >= 49)),
                   count(*) FILTER (WHERE NOT EXISTS (
                       SELECT 1 FROM '{sf_dir}/lineitem.parquet' l
                       WHERE l.l_suppkey = s.s_suppkey
                         AND l.l_returnflag = 'R'))
            FROM '{sf_dir}/supplier.parquet' s GROUP BY 1
        """).fetchall()
    }
    got = {
        r["nationkey"]: r
        for r in REGISTRY["sql_entry_exists"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    for k, (_, n, bulk, never) in exp.items():
        assert got[k]["n_suppliers"] == n
        assert got[k]["n_with_bulk_line"] == bulk
        assert got[k]["n_never_returned"] == never


def test_rate_ratio_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT CAST(ts AS DATE), event_type FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    days = [r[0] for r in rows]
    d0, d1 = min(days), max(days)
    half_len = (d1 - d0).days // 2
    k = [0, 0]
    n = [0, 0]
    tdays = [set(), set()]
    for d, et in rows:
        h = 0 if (d - d0).days <= half_len else 1
        n[h] += 1
        tdays[h].add(d)
        if et == "purchase":
            k[h] += 1
    t1, t2 = len(tdays[0]), len(tdays[1])
    rr = (k[0] / t1) / (k[1] / t2)
    z = math.log(rr) / math.sqrt(1 / k[0] + 1 / k[1])
    h_eff = 2 * math.asin(math.sqrt(k[0] / n[0])) - 2 * math.asin(
        math.sqrt(k[1] / n[1])
    )
    row = REGISTRY["stat_rate_ratio"].build(spark, sf_dir).collect()[0]
    assert row["k1"] == k[0] and row["k2"] == k[1]
    assert row["t1"] == t1 and row["t2"] == t2
    assert abs(row["rate_ratio"] - rr) < 2e-4
    assert abs(row["z"] - z) < 2e-3
    assert abs(row["cohens_h"] - h_eff) < 2e-4
