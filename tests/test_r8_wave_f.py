"""Independent-recomputation properties for the round-8 wave-F keys
(Brier decomposition, ECE/MCE, seasonal index, Markov entropy rate):
numpy/Counter re-derivations from the raw parquet — a third engine
besides Spark and DuckDB."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _probs(sf_dir):
    """Replicate the shared deterministic scorer + logistic link."""
    rows = duckdb.execute(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    # the scorer weights: mirror _W_EXPR via the registered oracle
    scores = duckdb.execute(
        "SELECT label % 2, "
        + REGISTRY["ml_brier_score"].oracle.split("WITH scored AS (")[1]
        .split("FROM embeddings")[0]
        .replace("SELECT label % 2 AS y, (", "(")
        .replace(") AS p", ")")
        + f" FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    y = np.array([r[0] for r in scores], dtype=np.float64)
    p = np.array([r[1] for r in scores], dtype=np.float64)
    assert len(y) == len(rows)
    return y, p


def test_brier_matches_numpy(spark, sf_dir):
    y, p = _probs(sf_dir)
    n = len(y)
    brier = float(np.mean((p - y) ** 2))
    bins = np.minimum(9, np.floor(p * 10).astype(int))
    rel = res = 0.0
    ybar = y.mean()
    for b in range(10):
        m = bins == b
        if not m.any():
            continue
        nk = m.sum()
        rel += nk * (p[m].mean() - y[m].mean()) ** 2
        res += nk * (y[m].mean() - ybar) ** 2
    row = REGISTRY["ml_brier_score"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["brier"] - brier) < 1e-3
    assert abs(row["reliability"] - rel / n) < 1e-3
    assert abs(row["resolution"] - res / n) < 1e-3
    assert abs(row["uncertainty"] - ybar * (1 - ybar)) < 1e-3
    # Murphy identity (binned): brier ≈ rel - res + unc within binning error
    assert abs(
        row["brier"] - (row["reliability"] - row["resolution"] + row["uncertainty"])
    ) < 0.05


def test_ece_matches_numpy(spark, sf_dir):
    y, p = _probs(sf_dir)
    n = len(y)
    bins = np.minimum(9, np.floor(p * 10).astype(int))
    ece = 0.0
    mce = 0.0
    for b in range(10):
        m = bins == b
        if not m.any():
            continue
        gap = abs(y[m].mean() - p[m].mean())
        ece += m.sum() * gap
        mce = max(mce, gap)
    row = REGISTRY["ml_ece"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["ece"] - ece / n) < 1e-3
    assert abs(row["mce"] - mce) < 1e-3


def test_seasonal_index_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT month(o_orderdate),"
        " CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    sales = defaultdict(int)
    counts = Counter()
    for m, c in rows:
        sales[m] += c
        counts[m] += 1
    total = sum(sales.values())
    out = {
        r["mth"]: r
        for r in REGISTRY["orders_seasonal_index"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(sales)
    for m in sales:
        row = out[m]
        assert row["n_orders"] == counts[m]
        assert abs(row["sales"] - sales[m] / 100.0) < 0.01
        assert abs(row["seasonal_index"] - 12.0 * sales[m] / total) < 1e-3
    # indexes average to ~1 across a full-year month grid
    assert abs(sum(r["seasonal_index"] for r in out.values()) - 12.0) < 0.01


def test_markov_entropy_rate_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT user_id, event_type FROM"
        f" '{sf_dir}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    trans = Counter()
    prev_by_user = {}
    for uid, et in rows:
        if uid in prev_by_user:
            trans[(prev_by_user[uid], et)] += 1
        prev_by_user[uid] = et
    n_all = sum(trans.values())
    row_tot = Counter()
    for (p, _), c in trans.items():
        row_tot[p] += c
    h = sum(
        (c / n_all) * (-math.log2(c / row_tot[p])) for (p, _), c in trans.items()
    )
    row = REGISTRY["events_markov_entropy_rate"].build(spark, sf_dir).collect()[0]
    assert row["n_transitions"] == n_all
    assert abs(row["entropy_rate"] - h) < 1e-3
    # bounded by log2(#states)
    assert 0.0 <= row["entropy_rate"] <= math.log2(5) + 1e-9
