"""Independent-recomputation properties for the round-8 wave-U keys
(log loss, Hosmer-Lemeshow, lexical-richness indices, safety stock)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_W = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])


def _scores(sf_dir):
    rows = duckdb.execute(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    labels = np.array([r[0] for r in rows], dtype=np.int64)
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    return labels % 2, emb @ _W + 0.5


def test_log_loss_matches_numpy(spark, sf_dir):
    y, s = _scores(sf_dir)
    t = (2 * y - 1) * s
    ll = np.maximum(-t, 0.0) + np.log(1.0 + np.exp(-np.abs(t)))
    llq = np.floor(ll * 1e9 + 0.5).astype(np.int64)
    row = REGISTRY["ml_log_loss"].build(spark, sf_dir).collect()[0]
    assert row["n"] == len(y)
    assert row["n_pos"] == int(y.sum())
    assert abs(row["log_loss"] - llq.sum() / 1e9 / len(y)) < 2e-4
    p = y.mean()
    base = -p * math.log(p) - (1 - p) * math.log(1 - p)
    assert abs(row["baseline_log_loss"] - base) < 2e-4
    # a linear scorer on separable-ish synthetic data must beat chance
    assert 0.0 < row["log_loss"]


def test_hosmer_lemeshow_matches_numpy(spark, sf_dir):
    y, s = _scores(sf_dir)
    pq = np.floor(1.0 / (1.0 + np.exp(-s)) * 1e9 + 0.5).astype(np.int64)
    bins = np.minimum(9, pq // 100_000_000)
    got = {
        r["bin"]: r
        for r in REGISTRY["ml_hosmer_lemeshow"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(np.unique(bins).tolist())
    for b in np.unique(bins):
        m = bins == b
        n = int(m.sum())
        obs = int(y[m].sum())
        exp = pq[m].sum() / 1e9
        contrib = (obs - exp) ** 2 / (exp * (1 - exp / n))
        row = got[int(b)]
        assert row["n"] == n and row["obs_pos"] == obs
        assert abs(row["exp_pos"] - exp) < 2e-4
        assert abs(row["hl_contrib"] - contrib) < 2e-3


def test_lexical_richness_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    freqs: dict[str, Counter] = defaultdict(Counter)
    for lang, text in rows:
        freqs[lang].update(text.split(" "))
    got = {
        r["lang"]: r
        for r in REGISTRY["text_lexical_richness"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(freqs)
    for lang, c in freqs.items():
        v = len(c)
        n = sum(c.values())
        v1 = sum(1 for f in c.values() if f == 1)
        v2 = sum(1 for f in c.values() if f == 2)
        row = got[lang]
        assert row["vocab"] == v and row["tokens"] == n
        assert abs(row["herdan_c"] - math.log(v) / math.log(n)) < 2e-4
        assert abs(row["guiraud_r"] - v / math.sqrt(n)) < 2e-4
        assert abs(row["brunet_w"] - n ** (v**-0.165)) < 2e-4
        exp_honore = (
            0.0 if v1 == v else 100.0 * math.log(n) / (1.0 - v1 / v)
        )
        assert abs(row["honore_r"] - exp_honore) < 2e-3
        assert abs(row["sichel_s"] - v2 / v) < 2e-4


def test_safety_stock_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT l_suppkey, CAST(l_shipdate AS DATE),"
        " sum(CAST(l_quantity AS BIGINT))"
        f" FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2"
    ).fetchall()
    daily: dict[int, list[int]] = defaultdict(list)
    for sk, _, q in rows:
        daily[sk].append(int(q))
    got = {
        r["suppkey"]: r
        for r in REGISTRY["orders_safety_stock"].build(spark, sf_dir).collect()
    }
    expected_keys = {sk for sk, qs in daily.items() if len(qs) > 1}
    assert set(got) == expected_keys
    z, lead = 1.6449, 7
    for sk in expected_keys:
        qs = np.array(daily[sk], dtype=np.float64)
        mu = qs.mean()
        sd = qs.std(ddof=1)
        ss = z * sd * math.sqrt(lead)
        row = got[sk]
        assert row["n_days"] == len(qs)
        assert abs(row["mean_daily"] - mu) < 2e-4
        assert abs(row["std_daily"] - sd) < 2e-4
        assert abs(row["safety_stock"] - ss) < 2e-3
        assert abs(row["reorder_point"] - (mu * lead + ss)) < 2e-3
        # ROP always exceeds expected lead-time demand when sd > 0
        assert row["reorder_point"] >= row["mean_daily"] * lead
