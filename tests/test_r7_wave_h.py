"""Independent-recomputation properties for the round-7 wave-H keys
(ORC/binaryFile sources, Allen relations, edit distance, MMR
diversification, split conformal): each result is re-derived with
plain Python/numpy/hashlib from the raw parquet — a third engine
besides Spark and DuckDB, so a shared SQL-vs-SQL blind spot cannot
hide."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("nation", "customer", "part", "lineitem", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_source_binary_files_digests_match_hashlib(spark, sf_dir):
    names = dict(
        _con(sf_dir).execute("SELECT n_nationkey, n_name FROM nation").fetchall()
    )
    out = {
        r["n_nationkey"]: r
        for r in REGISTRY["source_binary_files"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(names)
    for k, name in names.items():
        raw = name.encode("utf-8")
        assert out[k]["n_bytes"] == len(raw)
        assert out[k]["digest"] == hashlib.md5(raw).hexdigest()


def test_source_orc_roundtrip_lossless(spark, sf_dir):
    want = _con(sf_dir).execute(
        "SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
        " FROM customer WHERE c_mktsegment = 'BUILDING'"
    ).fetchall()
    got = {
        r["c_custkey"]: r["acctbal_cents"]
        for r in REGISTRY["source_orc"].build(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in want}


def test_allen_relations_match_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, event_id, epoch_us(ts),"
        " CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000 FROM events"
    ).fetchall()
    by = defaultdict(list)
    for u, eid, s, dur in rows:
        by[u].append((s, s + dur, eid))
    want: Counter[str] = Counter()
    for ivs in by.values():
        ivs.sort()
        for (ps, pe, _), (s, e, _) in zip(ivs, ivs[1:]):
            if ps < s and pe < s:
                rel = "precedes"
            elif ps < s and pe == s:
                rel = "meets"
            elif ps < s and pe < e:
                rel = "overlaps"
            elif ps < s and pe == e:
                rel = "finished_by"
            elif ps < s and pe > e:
                rel = "contains"
            elif ps == s and pe < e:
                rel = "starts"
            else:
                rel = "equals"
            want[rel] += 1
    got = {
        r["relation"]: r["pairs"]
        for r in REGISTRY["events_allen_relations"].build(spark, sf_dir).collect()
    }
    assert got == dict(want)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python(spark, sf_dir):
    names = [
        r[0] for r in _con(sf_dir).execute("SELECT p_name FROM part").fetchall()
    ]
    want: Counter[int] = Counter()
    for n in names:
        toks = n.split(" ")
        want[_lev(toks[0], toks[-1])] += 1
    got = {
        r["dist"]: r["n_parts"]
        for r in REGISTRY["fn_edit_distance"].build(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_mmr_matches_numpy(spark, sf_dir):
    from etl_cnc_spark.llm.retrieval import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        MMR_QUERIES,
    )

    rows = _con(sf_dir).execute(
        "SELECT vec_id, embedding FROM embeddings"
    ).fetchall()
    emb = {k: np.asarray(v, dtype=np.float64) for k, v in rows}
    norm = {k: np.sqrt((v * v).sum()) for k, v in emb.items()}
    got = defaultdict(list)
    for r in REGISTRY["sim_mmr_diversify"].build(spark, sf_dir).collect():
        got[r["qid"]].append(r)
    assert set(got) == set(range(MMR_QUERIES))
    for qid in range(MMR_QUERIES):
        rel = {
            c: float(emb[qid] @ emb[c]) / (norm[qid] * norm[c])
            for c in emb
            if c >= MMR_QUERIES
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:MMR_POOL]
        picked: list[int] = []
        for rank in range(1, MMR_K + 1):
            best, best_score = None, None
            for c in pool:
                if c in picked:
                    continue
                red = (
                    max(
                        float(emb[c] @ emb[p]) / (norm[c] * norm[p])
                        for p in picked
                    )
                    if picked
                    else 0.0
                )
                score = MMR_LAMBDA * rel[c] - (1 - MMR_LAMBDA) * red
                if best_score is None or score > best_score:
                    best, best_score = c, score
            picked.append(best)
            row = got[qid][rank - 1]
            assert row["rank"] == rank
            assert row["cid"] == best, (qid, rank, row["cid"], best)
            assert abs(row["mmr_score"] - best_score) < 1e-3


def test_conformal_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT),"
        " CAST(floor(l_extendedprice) AS BIGINT) FROM lineitem"
    ).fetchall()
    tr_x, tr_y, cal, test = [], [], [], []
    for ok, ln, x, y in rows:
        h = hashlib.md5(f"{ok}-{ln}".encode()).hexdigest()
        b = int(h[:6], 16) % 10
        if b <= 5:
            tr_x.append(x)
            tr_y.append(y)
        elif b <= 7:
            cal.append((x, y))
        else:
            test.append((x, y))
    tx, ty = np.array(tr_x, dtype=np.float64), np.array(tr_y, dtype=np.float64)
    n = len(tx)
    b1 = (n * (tx * ty).sum() - tx.sum() * ty.sum()) / (
        n * (tx * tx).sum() - tx.sum() ** 2
    )
    b0 = (ty.sum() - b1 * tx.sum()) / n
    r_cal = sorted(
        int(np.floor(abs(y - (b0 + b1 * x)) * 100 + 0.5)) for x, y in cal
    )
    k = int(np.floor((9 * (len(cal) + 1) + 9) / 10.0))
    qhat = r_cal[k - 1]
    covered = sum(
        int(np.floor(abs(y - (b0 + b1 * x)) * 100 + 0.5)) <= qhat
        for x, y in test
    )
    out = REGISTRY["ml_conformal_interval"].build(spark, sf_dir).collect()[0]
    assert out["n_train"] == n
    assert out["n_cal"] == len(cal)
    assert out["n_test"] == len(test)
    assert abs(out["slope"] - b1) < 1e-3
    assert out["qhat_cents"] == qhat
    assert abs(out["coverage"] - covered / len(test)) < 1e-4
    # the conformal guarantee itself: coverage >= 1 - alpha - slack
    assert out["coverage"] >= 0.85
