"""Independent-recomputation properties for the round-8 wave-AD keys
(Gumbel block-maxima fit, fixed-effect meta-analysis, ERR@k)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_GAMMA = 0.5772156649015329


def test_gumbel_fit_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(ts AS DATE),"
        " max(CAST(floor(value * 100 + 0.5) AS BIGINT))"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1"
    ).fetchall()
    mx = np.array([r[1] for r in rows], dtype=np.float64) / 100.0
    n = len(mx)
    m, s = mx.mean(), mx.std(ddof=1)
    beta = s * math.sqrt(6) / math.pi
    mu = m - _GAMMA * beta
    rl = mu - beta * math.log(-math.log(1 - 1 / 30))
    row = REGISTRY["stat_gumbel_fit"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["mean_daily_max"] - m) < 2e-3
    assert abs(row["beta"] - beta) < 2e-3
    assert abs(row["mu"] - mu) < 2e-3
    assert abs(row["return_level_30d"] - rl) < 4e-3
    # the 30-day return level sits above the fitted location
    assert row["return_level_30d"] > row["mu"]


def test_meta_fixed_effect_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(isodow(ts) AS BIGINT),
               count_if(hour(ts) >= 12 AND event_type = 'purchase'),
               count_if(hour(ts) >= 12 AND event_type <> 'purchase'),
               count_if(hour(ts) < 12 AND event_type = 'purchase'),
               count_if(hour(ts) < 12 AND event_type <> 'purchase')
        FROM '{sf_dir}/events.parquet' GROUP BY 1
    """).fetchall()
    ys, ws = [], []
    for _, a, b, c, d in rows:
        if min(a, b, c, d) == 0:
            continue
        ys.append(math.log(a * d / (b * c)))
        ws.append(1.0 / (1 / a + 1 / b + 1 / c + 1 / d))
    ys, ws = np.array(ys), np.array(ws)
    # replicate the operator's per-stratum 1e-9 quantization
    swy = np.floor(ws * ys * 1e9 + 0.5).sum() / 1e9
    sw = np.floor(ws * 1e9 + 0.5).sum() / 1e9
    swy2 = np.floor(ws * ys * ys * 1e9 + 0.5).sum() / 1e9
    pooled = swy / sw
    q_het = swy2 - swy * swy / sw
    k = len(ys)
    i2 = max(0.0, (q_het - (k - 1)) / q_het)
    row = REGISTRY["stat_meta_fixed_effect"].build(spark, sf_dir).collect()[0]
    assert row["k"] == k
    assert abs(row["pooled_log_or"] - pooled) < 2e-4
    assert abs(row["pooled_or"] - math.exp(pooled)) < 2e-4
    assert abs(row["se"] - math.sqrt(1 / sw)) < 2e-4
    assert abs(row["q_het"] - q_het) < 2e-3
    assert abs(row["i2"] - i2) < 2e-3
    assert 0.0 <= row["i2"] < 1.0


def test_err_at_k_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    emb = np.array([r[2] for r in rows], dtype=np.float64)
    norms = np.sqrt((emb * emb).sum(axis=1))
    got = {
        r["qid"]: r
        for r in REGISTRY["ml_err_at_k"].build(spark, sf_dir).collect()
    }
    for qi in range(len(ids)):
        if ids[qi] >= 50:
            continue
        cos = emb @ emb[qi] / (norms * norms[qi])
        cq = np.floor(cos * 1e9 + 0.5).astype(np.int64)
        cand = [j for j in range(len(ids)) if ids[j] != ids[qi]]
        order = sorted(cand, key=lambda j: (-cq[j], ids[j]))[:10]
        errq = 0
        h = 0
        n_rel = 0
        for r, j in enumerate(order, start=1):
            if labels[j] == labels[qi]:
                errq += math.floor(1e12 / (r * 2 ** (h + 1)) + 0.5)
                h += 1
                n_rel += 1
        row = got[ids[qi]]
        assert row["n_rel_topk"] == n_rel
        assert abs(row["err"] - errq / 1e12) < 2e-4
        # ERR is bounded by the reciprocal rank of the first hit
        assert row["err"] <= 1.0
