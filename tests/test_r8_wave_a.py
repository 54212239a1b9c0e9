"""Independent-recomputation properties for the round-8 wave-A
retrieval-evaluation keys (MAP@k, truncated RBO, Kendall's W): each
metric is re-derived with plain Python/numpy from the raw parquet — a
third engine besides Spark and DuckDB, so a shared SQL-vs-SQL blind
spot cannot hide."""

from __future__ import annotations

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

K = 10
NQ = 50
RBO_P = 0.9


def _vectors(sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    return ids, V, labels


def _rank(scores, ids, qid):
    """Rank candidates (excluding qid) by score desc, id asc."""
    mask = ids != qid
    cand_ids = ids[mask]
    cand_scores = scores[mask]
    order = np.lexsort((cand_ids, -cand_scores))
    return cand_ids[order]


def test_map_at_k_matches_numpy(spark, sf_dir):
    ids, V, labels = _vectors(sf_dir)
    out = {
        r["qid"]: r
        for r in REGISTRY["ml_map_at_k"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(ids[ids < NQ].tolist())
    norms = np.linalg.norm(V, axis=1)
    lab = dict(zip(ids.tolist(), labels.tolist()))
    for qid in ids[ids < NQ]:
        qv = V[ids == qid][0]
        cos = (V @ qv) / (norms * np.linalg.norm(qv))
        ranked = _rank(cos, ids, qid)
        rel = np.array([lab[c] == lab[qid] for c in ranked])
        n_rel_corpus = int(rel.sum())
        topk = rel[:K]
        hits = np.cumsum(topk)
        m = min(n_rel_corpus, K)
        ap = (
            float(sum(hits[i] / (i + 1) for i in range(K) if topk[i])) / m
            if m
            else 0.0
        )
        row = out[int(qid)]
        assert row["n_rel_corpus"] == n_rel_corpus
        assert row["n_rel_topk"] == int(topk.sum())
        assert abs(row["ap_at_k"] - ap) < 1e-3, (qid, row["ap_at_k"], ap)


def test_rbo_matches_numpy(spark, sf_dir):
    ids, V, labels = _vectors(sf_dir)
    out = {
        r["qid"]: r
        for r in REGISTRY["ml_rank_biased_overlap"]
        .build(spark, sf_dir)
        .collect()
    }
    norms = np.linalg.norm(V, axis=1)
    for qid in ids[ids < NQ]:
        qv = V[ids == qid][0]
        dots = V @ qv
        cos = dots / (norms * np.linalg.norm(qv))
        l_cos = _rank(cos, ids, qid)[:K].tolist()
        l_dot = _rank(dots, ids, qid)[:K].tolist()
        rbo = 0.0
        for d in range(1, K + 1):
            ov = len(set(l_cos[:d]) & set(l_dot[:d]))
            rbo += (1 - RBO_P) * RBO_P ** (d - 1) * ov / d
        ov_k = len(set(l_cos) & set(l_dot))
        row = out[int(qid)]
        assert row["overlap_at_d"] == ov_k
        assert abs(row["rbo"] - rbo) < 1e-3, (qid, row["rbo"], rbo)


def test_kendall_w_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT doc_id, n_chars, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    n = len(rows)
    scores = {
        0: {r[0]: r[1] for r in rows},
        1: {r[0]: len(r[2].split(" ")) for r in rows},
        2: {r[0]: len(set(r[2].split(" "))) for r in rows},
    }
    R = dict.fromkeys(scores[0], 0)
    for rk in range(3):
        order = sorted(scores[rk], key=lambda d: (scores[rk][d], d))
        for pos, d in enumerate(order, start=1):
            R[d] += pos
    mean_r = 3 * (n + 1) / 2
    s = sum((v - mean_r) ** 2 for v in R.values())
    w = 12.0 * s / (9.0 * (n**3 - n))
    chi2 = 3.0 * (n - 1) * w
    row = REGISTRY["ml_kendall_w"].build(spark, sf_dir).collect()[0]
    assert row["n_docs"] == n
    assert abs(row["w_stat"] - w) < 1e-3
    assert abs(row["chi2"] - chi2) < 2e-2
    assert 0.0 <= row["w_stat"] <= 1.0
