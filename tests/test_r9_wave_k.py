"""Independent-recomputation properties for the round-9 wave-K keys
(VIF, ridit analysis, G-test)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_vif_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(floor(l_discount*100 + 0.5) AS BIGINT),
               CAST(floor(l_tax*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
    """).fetchall()
    X = np.array(rows, dtype=float)
    R = np.corrcoef(X.T)
    vifs = np.diag(np.linalg.inv(R))
    row = REGISTRY["stat_vif"].build(spark, sf_dir).collect()[0]
    assert row["n"] == len(X)
    assert abs(row["r_qty_disc"] - R[0, 1]) < 1e-4
    assert abs(row["r_qty_tax"] - R[0, 2]) < 1e-4
    assert abs(row["r_disc_tax"] - R[1, 2]) < 1e-4
    assert abs(row["vif_qty"] - vifs[0]) < 1e-3
    assert abs(row["vif_disc"] - vifs[1]) < 1e-3
    assert abs(row["vif_tax"] - vifs[2]) < 1e-3
    # VIF >= 1 always
    assert min(row["vif_qty"], row["vif_disc"], row["vif_tax"]) >= 1 - 1e-9


def test_ridit_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
    """).fetchall()
    ref = Counter(v for _, v in rows)
    n_ref = len(rows)
    below = {}
    cum = 0
    for v in sorted(ref):
        below[v] = cum
        cum += ref[v]
    per = defaultdict(lambda: [0, 0])
    for g, v in rows:
        per[g][0] += 1
        per[g][1] += 2 * below[v] + ref[v]
    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_ridit"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    weighted = 0.0
    for g, (n_g, s2n) in per.items():
        mean_r = s2n / (2 * n_ref * n_g)
        z = (mean_r - 0.5) / math.sqrt(1 / (12 * n_g))
        row = got[g]
        assert row["n_g"] == n_g
        assert abs(row["mean_ridit"] - mean_r) < 1e-4
        assert abs(row["z"] - z) < 5e-3
        assert 0 < row["mean_ridit"] < 1
        weighted += n_g * mean_r
    # the size-weighted mean ridit over all groups is exactly 1/2
    assert abs(weighted / n_ref - 0.5) < 1e-9


def test_g_test_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT event_type,
               CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-16'
                    THEN 0 ELSE 1 END, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
    """).fetchall()
    n = sum(r[2] for r in rows)
    rt = defaultdict(int)
    ht = defaultdict(int)
    for t, h, o in rows:
        rt[t] += o
        ht[h] += o
    g = 2 * sum(
        o * math.floor(math.log(o * n / (rt[t] * ht[h])) * 1e12 + 0.5) / 1e12
        for t, h, o in rows
        if o > 0
    )
    row = REGISTRY["stat_g_test"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["n_cells"] == len(rows)
    assert abs(row["g_stat"] - g) < max(1e-3, abs(g) * 1e-4)
    assert row["g_stat"] >= -1e-9
    assert row["dependent"] == (row["g_stat"] > 9.4877)
