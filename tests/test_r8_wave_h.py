"""Independent-recomputation properties for the round-8 wave-H keys
(KPSS, Dickey-Fuller, semi-hard triplet mining): numpy re-derivations
from the raw parquet plus the FaceNet semi-hard selection rule."""

from __future__ import annotations

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _hourly(sf_dir):
    rows = duckdb.execute(
        "SELECT date_trunc('hour', ts) AS h, count(*) FROM"
        f" '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    return np.array([r[1] for r in rows], dtype=np.float64)


def test_kpss_matches_numpy(spark, sf_dir):
    y = _hourly(sf_dir)
    n = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    lag = 6
    gam = [float((e[l:] * e[:-l] if l else e * e).sum()) / n for l in range(lag + 1)]
    s2_lr = gam[0] + 2 * sum((1 - l / (lag + 1)) * gam[l] for l in range(1, lag + 1))
    eta = float((s**2).sum()) / n**2 / s2_lr
    row = REGISTRY["stat_kpss"].build(spark, sf_dir).collect()[0]
    assert row["n_hours"] == n
    assert abs(row["kpss_eta"] - eta) < max(1e-3, 1e-3 * eta)
    assert row["nonstationary"] == (eta > 0.463)


def test_adf_matches_numpy(spark, sf_dir):
    y = _hourly(sf_dir)
    dy = np.diff(y)
    x = y[:-1]
    n = len(dy)
    sx, sy = x.sum(), dy.sum()
    sxx, sxy, syy = (x * x).sum(), (x * dy).sum(), (dy * dy).sum()
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    sxx_c = sxx - sx * sx / n
    ssr = (syy - sy * sy / n) - (sxy - sx * sy / n) ** 2 / sxx_c
    t = beta / np.sqrt(ssr / (n - 2) / sxx_c)
    row = REGISTRY["stat_adf"].build(spark, sf_dir).collect()[0]
    assert row["n_obs"] == n
    assert abs(row["beta"] - beta) < 1e-3
    assert abs(row["t_stat"] - t) < max(1e-3, 1e-4 * abs(t))
    assert row["stationary"] == (t < -2.86)
    # an hourly count series around a stable mean should mean-revert
    assert row["stationary"]


def test_triplet_mining_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    lab = np.array([r[2] for r in rows])
    norms = np.linalg.norm(V, axis=1)
    out = {
        r["anchor"]: r
        for r in REGISTRY["embed_triplet_mining"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(ids[ids < 50].tolist())
    for aid in ids[ids < 50]:
        av = V[ids == aid][0]
        cos = (V @ av) / (norms * np.linalg.norm(av))
        mask = ids != aid
        order = np.lexsort((ids[mask], -cos[mask]))
        cand_ids = ids[mask][order]
        cand_cos = cos[mask][order]
        cand_lab = lab[mask][order]
        alab = lab[ids == aid][0]
        pos_i = np.argmax(cand_lab == alab)
        pos_id, pos_cos = cand_ids[pos_i], cand_cos[pos_i]
        neg_mask = cand_lab != alab
        semi_mask = neg_mask & (cand_cos < pos_cos)
        if semi_mask.any():
            ni = np.argmax(semi_mask)
            semi_hard = True
        else:
            ni = np.argmax(neg_mask)
            semi_hard = False
        row = out[int(aid)]
        assert row["pos_id"] == int(pos_id)
        assert abs(row["pos_cos"] - pos_cos) < 1e-3
        assert row["neg_id"] == int(cand_ids[ni])
        assert abs(row["neg_cos"] - cand_cos[ni]) < 1e-3
        assert row["semi_hard"] == semi_hard
        assert abs(row["margin"] - (pos_cos - cand_cos[ni])) < 1e-3
        if semi_hard:
            assert row["margin"] >= -1e-9
