"""Independent-recomputation properties for the round-8 wave-T keys
(MRR, Matthews correlation, Goodman-Kruskal gamma / Somers' D,
Jonckheere-Terpstra ordered trend)."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _embeddings(sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    emb = np.array([r[2] for r in rows], dtype=np.float64)
    return ids, labels, emb


def test_mrr_matches_numpy(spark, sf_dir):
    ids, labels, emb = _embeddings(sf_dir)
    norms = np.sqrt((emb * emb).sum(axis=1))
    got = {
        r["qid"]: r
        for r in REGISTRY["ml_mrr"].build(spark, sf_dir).collect()
    }
    nq = 0
    for qi in range(len(ids)):
        if ids[qi] >= 50:
            continue
        nq += 1
        cos = emb @ emb[qi] / (norms * norms[qi])
        cq = np.floor(cos * 1e9 + 0.5).astype(np.int64)
        mask = ids != ids[qi]
        order = sorted(
            np.nonzero(mask)[0], key=lambda j: (-cq[j], ids[j])
        )
        first = 0
        for rank, j in enumerate(order, start=1):
            if labels[j] == labels[qi]:
                first = rank
                break
        row = got[ids[qi]]
        assert row["n_candidates"] == int(mask.sum())
        assert row["first_rel_rank"] == first
        exp_rr = 1.0 / first if first else 0.0
        assert abs(row["rr"] - math.floor(exp_rr * 10000 + 0.5) / 10000.0) < 1e-12
    assert nq == len(got) > 0


def test_matthews_corr_matches_numpy(spark, sf_dir):
    _, labels, emb = _embeddings(sf_dir)
    w = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])
    # fold left-to-right like both engines (order matters for bits,
    # not for the 1e-6-quantized comparison below)
    score = emb @ w + 0.5
    sq = np.floor(score * 1e6 + 0.5).astype(np.int64)
    y = labels % 2
    tp = int(((y == 1) & (sq > 0)).sum())
    fp = int(((y == 0) & (sq > 0)).sum())
    tn = int(((y == 0) & (sq <= 0)).sum())
    fn = int(((y == 1) & (sq <= 0)).sum())
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    tpr, tnr = tp / (tp + fn), tn / (tn + fp)
    row = REGISTRY["ml_matthews_corr"].build(spark, sf_dir).collect()[0]
    assert row["n"] == tp + fp + tn + fn == len(y)
    assert abs(row["mcc"] - mcc) < 2e-4
    assert abs(row["balanced_accuracy"] - 0.5 * (tpr + tnr)) < 2e-4
    assert abs(row["youden_j"] - (tpr + tnr - 1)) < 2e-4
    # identities: J = 2*BA - 1, |mcc| <= 1
    assert abs(row["youden_j"] - (2 * row["balanced_accuracy"] - 1)) < 3e-4
    assert -1.0 <= row["mcc"] <= 1.0


def test_gk_gamma_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT),"
        " CAST(floor(o_totalprice / 20000.0) AS BIGINT), count(*)"
        f" FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2"
    ).fetchall()
    conc = disc = tie_x = tie_y = 0
    for x1, y1, c1 in rows:
        for x2, y2, c2 in rows:
            if x1 < x2 and y1 < y2:
                conc += c1 * c2
            elif x1 < x2 and y1 > y2:
                disc += c1 * c2
            elif x1 < x2 and y1 == y2:
                tie_y += c1 * c2
            elif x1 == x2 and y1 < y2:
                tie_x += c1 * c2
    row = REGISTRY["stat_gk_gamma"].build(spark, sf_dir).collect()[0]
    assert row["conc"] == conc and row["disc"] == disc
    assert abs(row["gamma"] - (conc - disc) / (conc + disc)) < 2e-4
    assert abs(row["somers_dyx"] - (conc - disc) / (conc + disc + tie_y)) < 2e-4
    assert abs(row["somers_dxy"] - (conc - disc) / (conc + disc + tie_x)) < 2e-4
    # gamma ignores ties -> |gamma| >= |somers| always
    assert abs(row["gamma"]) >= abs(row["somers_dyx"]) - 1e-12
    assert abs(row["gamma"]) >= abs(row["somers_dxy"]) - 1e-12


def test_jonckheere_terpstra_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT CAST(l_linenumber AS BIGINT), CAST(l_quantity AS BIGINT),"
        f" count(*) FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2"
    ).fetchall()
    u2 = 0
    for g1, v1, c1 in rows:
        for g2, v2, c2 in rows:
            if g1 < g2:
                if v1 < v2:
                    u2 += 2 * c1 * c2
                elif v1 == v2:
                    u2 += c1 * c2
    nk: dict[int, int] = {}
    for g, _, c in rows:
        nk[g] = nk.get(g, 0) + c
    n = sum(nk.values())
    sk2 = sum(v * v for v in nk.values())
    sk23 = sum(v * v * (2 * v + 3) for v in nk.values())
    e_u = (n * n - sk2) / 4.0
    v0 = (n * n * (2 * n + 3) - sk23) / 72.0
    z = (u2 / 2.0 - e_u) / math.sqrt(v0)
    row = REGISTRY["stat_jonckheere_terpstra"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["n_groups"] == len(nk)
    assert row["u2"] == u2
    assert abs(row["e_u"] - e_u) < 1e-9
    assert abs(row["z"] - z) < 2e-4
