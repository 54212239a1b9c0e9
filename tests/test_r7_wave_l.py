"""Properties for the round-7 wave-L keys (Wilcoxon signed-rank,
Box-Cox scan, reciprocal kNN) re-derived with plain Python/numpy."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_wilcoxon_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """SELECT CAST(ts AS DATE), event_type,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        FROM events WHERE event_type IN ('purchase', 'click')
        GROUP BY 1, 2"""
    ).fetchall()
    daily = defaultdict(lambda: [0, 0])
    for day, et, v in rows:
        daily[day][0 if et == "purchase" else 1] += v
    diffs = [p - c for p, c in daily.values() if p != c]
    ads = sorted(abs(d) for d in diffs)
    rank = {}
    i = 0
    while i < len(ads):
        j = i
        while j < len(ads) and ads[j] == ads[i]:
            j += 1
        rank[ads[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(rank[abs(d)] for d in diffs if d > 0)
    n = len(diffs)
    ties = defaultdict(int)
    for d in diffs:
        ties[abs(d)] += 1
    tie3 = sum(t**3 - t for t in ties.values())
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    )
    out = REGISTRY["stat_wilcoxon_signed"].build(spark, sf_dir).collect()[0]
    assert out["n"] == n
    assert abs(out["w_plus"] - w_plus) < 1e-6
    assert abs(out["w_minus"] - (n * (n + 1) / 2.0 - w_plus)) < 1e-6
    assert abs(out["z_stat"] - z) < 1e-3


def test_box_cox_matches_numpy(spark, sf_dir):
    from etl_cnc_spark.operators.stats import BC_LAMBDAS

    q = np.array(
        [
            float(r[0])
            for r in _con(sf_dir)
            .execute("SELECT CAST(l_quantity AS BIGINT) FROM lineitem")
            .fetchall()
        ]
    )
    n = len(q)
    slx = np.log(q).sum()
    got = {
        round(r["lam"] * 10): r
        for r in REGISTRY["stat_box_cox"].build(spark, sf_dir).collect()
    }
    lls = {}
    for l10 in BC_LAMBDAS:
        lam = l10 / 10.0
        y = np.log(q) if l10 == 0 else (np.power(q, lam) - 1.0) / lam
        ll = -n / 2.0 * math.log(y.var()) + (lam - 1.0) * slx
        lls[l10] = ll
        assert abs(got[l10]["loglik"] - ll) < max(1e-2, abs(ll) * 1e-5)
    best = max(lls, key=lls.get)
    assert got[best]["is_best"]
    assert sum(1 for r in got.values() if r["is_best"]) == 1


def test_reciprocal_nn_matches_numpy(spark, sf_dir):
    from etl_cnc_spark.llm.similarity import RNN_BLOCK, RNN_K

    rows = _con(sf_dir).execute(
        f"SELECT vec_id, embedding FROM embeddings"
        f" WHERE vec_id < {RNN_BLOCK} ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    X = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    Xn = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
    S = Xn @ Xn.T
    topk = {}
    for i, vid in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-S[i, j], ids[j]),
        )[:RNN_K]
        topk[vid] = {ids[j]: r + 1 for r, j in enumerate(order)}
    want = {
        (a, b)
        for a in topk
        for b in topk[a]
        if a < b and a in topk.get(b, {})
    }
    got = {
        (r["vec_a"], r["vec_b"]): r
        for r in REGISTRY["sim_reciprocal_nn"].build(spark, sf_dir).collect()
    }
    assert set(got) == want
    for (a, b), r in got.items():
        assert r["rank_ab"] == topk[a][b]
        assert r["rank_ba"] == topk[b][a]
