"""Independent-recomputation properties for the retrieval / drift /
spatial operators: each is cross-checked against a from-scratch
Python reference over the SAME parquet inputs — the oracle proves
Spark↔DuckDB agreement; these prove the shared formulation means
what it claims (BM25 really is BM25, the KS statistic really is the
ECDF sup-distance, the grid join really finds the nearest neighbor).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _py_bm25(sf_dir, query_terms, k1=1.2, b=0.75):
    """Plain-Python BM25: returns {doc_id: (score, n_terms)}."""
    docs = _docs(sf_dir)
    n = len(docs)
    dl = {}
    tf = defaultdict(Counter)
    df = Counter()
    total_words = 0
    for doc_id, text in docs:
        words = text.split(" ")
        dl[doc_id] = len(words)
        total_words += len(words)
        c = Counter(words)
        for t in query_terms:
            if c[t]:
                tf[doc_id][t] = c[t]
                df[t] += 1
    avgdl = total_words / n
    out = {}
    for doc_id, terms in tf.items():
        score = 0.0
        for t, f in terms.items():
            idf = math.log(1.0 + ((n - df[t]) + 0.5) / (df[t] + 0.5))
            score += idf * (f * (k1 + 1)) / (f + k1 * ((1 - b) + b * (dl[doc_id] / avgdl)))
        out[doc_id] = (score, len(terms))
    return out


def test_bm25_matches_python_reference(spark, sf_dir):
    """The relational BM25 must reproduce a textbook from-scratch
    implementation: same top-20 ids in the same order, same matched-
    term counts, scores equal to 1e-3."""
    from etl_cnc_spark.llm.retrieval import QUERY_TERMS, TOP_N

    ref = _py_bm25(sf_dir, QUERY_TERMS)
    ranked = sorted(ref.items(), key=lambda kv: (-kv[1][0], kv[0]))[:TOP_N]
    got = {
        r["rn"]: r
        for r in REGISTRY["text_bm25"].build(spark, sf_dir).collect()
    }
    assert len(got) == min(TOP_N, len(ranked))
    for i, (doc_id, (score, n_terms)) in enumerate(ranked, start=1):
        row = got[i]
        assert row["doc_id"] == doc_id, f"rank {i}: {row['doc_id']} != {doc_id}"
        assert row["n_terms"] == n_terms
        assert abs(row["score"] - score) <= 1e-3


def _py_cosine_ranks(sf_dir, qid, depth):
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    qv = dict(vecs)[qid]
    qn = math.sqrt(sum(float(x) * float(x) for x in qv))
    scored = []
    for vid, v in vecs:
        dot = sum(float(a) * float(b) for a, b in zip(qv, v))
        vn = math.sqrt(sum(float(x) * float(x) for x in v))
        scored.append((vid, dot / (qn * vn)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return {vid: rn for rn, (vid, _) in enumerate(scored[:depth], start=1)}


def test_hybrid_rrf_matches_python_fusion(spark, sf_dir):
    """RRF fusion recomputed from two independently-built Python rank
    lists (textbook BM25 + numpy-free cosine) must give the same
    fused top-20 in the same order."""
    from etl_cnc_spark.llm.retrieval import (
        HYB_QID,
        LIST_N,
        QUERY_TERMS,
        RRF_K,
        TOP_N,
    )

    lex_ranked = sorted(
        _py_bm25(sf_dir, QUERY_TERMS).items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:LIST_N]
    lex = {doc: rn for rn, (doc, _) in enumerate(lex_ranked, start=1)}
    vec = _py_cosine_ranks(sf_dir, HYB_QID, LIST_N)
    fused = {}
    for doc in set(lex) | set(vec):
        s = 0.0
        if doc in lex:
            s += 1.0 / (RRF_K + lex[doc])
        if doc in vec:
            s += 1.0 / (RRF_K + vec[doc])
        fused[doc] = s
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    got = sorted(
        REGISTRY["sim_hybrid_rrf"].build(spark, sf_dir).collect(),
        key=lambda r: r["rn"],
    )
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for row, (_, s) in zip(got, expect):
        assert abs(row["rrf"] - s) <= 1e-3
        # a fused doc must come from at least one list, with the rank
        # columns faithfully carried through
        assert row["lex_rn"] is not None or row["vec_rn"] is not None
        if row["lex_rn"] is not None:
            assert lex[row["doc_id"]] == row["lex_rn"]
        if row["vec_rn"] is not None:
            assert vec[row["doc_id"]] == row["vec_rn"]


def test_ks_statistic_matches_python_ecdf(spark, sf_dir):
    """KS D recomputed as the literal sup over merged sample points
    of |ECDF1 − ECDF2| (no binning shortcuts beyond the same cent
    quantization)."""
    from etl_cnc_spark.operators.stats import KS_G1, KS_G2

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type IN ('{KS_G1}', '{KS_G2}')"
    ).fetchall()
    s1 = sorted(
        math.floor(v * 100 + 0.5) for t, v in rows if t == KS_G1
    )
    s2 = sorted(
        math.floor(v * 100 + 0.5) for t, v in rows if t == KS_G2
    )
    grid = sorted(set(s1) | set(s2))
    import bisect

    d = 0.0
    for x in grid:
        f1 = bisect.bisect_right(s1, x) / len(s1)
        f2 = bisect.bisect_right(s2, x) / len(s2)
        d = max(d, abs(f1 - f2))
    row = REGISTRY["stat_ks_test"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == len(s1) and row["n2"] == len(s2)
    assert abs(row["ks_d"] - d) <= 1e-3
    crit = 1.358 * math.sqrt((len(s1) + len(s2)) / (len(s1) * len(s2)))
    assert abs(row["d_crit"] - crit) <= 1e-3
    assert row["drifted"] == (d > crit)
    assert 0.0 <= row["ks_d"] <= 1.0


def test_psi_matches_python_fold(spark, sf_dir):
    """PSI recomputed with a plain dict-of-bins Python fold; PSI is
    non-negative by construction."""
    from etl_cnc_spark.operators.stats import PSI_NBINS

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(ts AS DATE) < DATE '2024-01-16', value "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    bins = defaultdict(lambda: [0, 0])  # (etype, b) -> [ref, cur]
    totals = defaultdict(lambda: [0, 0])
    for etype, is_ref, v in rows:
        b = min(int(math.floor(v / 25.0)), PSI_NBINS - 1)
        idx = 0 if is_ref else 1
        bins[(etype, b)][idx] += 1
        totals[etype][idx] += 1
    psi = defaultdict(float)
    nbins = Counter()
    for (etype, b), (nr, nc) in bins.items():
        tr, tc = totals[etype]
        p_ref = (nr + 0.5) / (tr + 10.0)
        p_cur = (nc + 0.5) / (tc + 10.0)
        psi[etype] += (p_cur - p_ref) * math.log(p_cur / p_ref)
        nbins[etype] += 1
    got = REGISTRY["stat_psi_drift"].build(spark, sf_dir).collect()
    assert {r["event_type"] for r in got} == set(totals)
    for r in got:
        assert r["n_ref"] == totals[r["event_type"]][0]
        assert r["n_cur"] == totals[r["event_type"]][1]
        assert r["n_bins"] == nbins[r["event_type"]]
        assert abs(r["psi"] - psi[r["event_type"]]) <= 1e-3
        assert r["psi"] >= 0.0
        assert r["drifted"] == (psi[r["event_type"]] > 0.1)


def _py_coord(salt, key):
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:6]
    return int(h, 16) / 16777216.0


def test_spatial_grid_finds_true_nearest(spark, sf_dir):
    """Brute-force all-pairs check: for every customer the grid join
    must return exactly the nearest supplier within r (ties by
    suppkey), and omit the customer iff no supplier is within r."""
    from etl_cnc_spark.operators.joins import GRID_R2

    r2 = float(GRID_R2)  # the operator's literal bound, NOT r*r
    # (0.05**2 = 0.0025000000000000005 != 0.0025 — the exact FP trap
    # the operator avoids by using one literal on both engines)
    con = duckdb.connect()
    custs = con.execute(
        f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    supps = con.execute(
        f"SELECT s_suppkey FROM '{sf_dir}/supplier.parquet'"
    ).fetchall()
    spts = [
        (sk, _py_coord("sx", sk), _py_coord("sy", sk)) for (sk,) in supps
    ]
    expect = {}
    for (ck,) in custs:
        x, y = _py_coord("cx", ck), _py_coord("cy", ck)
        best = None
        for sk, sx, sy in spts:
            d2 = (x - sx) ** 2 + (y - sy) ** 2
            if d2 <= r2 and (best is None or (d2, sk) < best):
                best = (d2, sk)
        if best is not None:
            expect[ck] = (best[1], math.sqrt(best[0]))
    got = {
        r_["c_custkey"]: (r_["s_suppkey"], r_["dist"])
        for r_ in REGISTRY["join_spatial_grid"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for ck, (sk, dist) in expect.items():
        assert got[ck][0] == sk
        assert abs(got[ck][1] - dist) <= 1e-3
