"""Independent-recomputation properties for the eleventh round-5
wave (Markov stationary distribution, payload byte entropy)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_markov_stationary_matches_numpy_power(spark, sf_dir):
    """Stationary vector recomputed with dense numpy matrix powers
    (no fixed-point tricks) — must agree to the quantization scale;
    and it must be closer to the fixpoint than the uniform start."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH seq AS (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM '{sf_dir}/events.parquet'
        )
        SELECT prev, event_type, count(*) FROM seq
        WHERE prev IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    states = sorted({r[0] for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for prev, nxt, n in rows:
        if nxt in idx:
            P[idx[prev], idx[nxt]] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(4):
        pi = pi @ P
    out = {r["state"]: r for r in
           REGISTRY["events_markov_stationary"].build(spark, sf_dir).collect()}
    assert set(out) == set(states)
    for s in states:
        assert abs(out[s]["pi"] - pi[idx[s]]) <= 1e-3
    # mass approximately conserved (fixed-point floors lose < 1e-9
    # per term; nxt states outside the prev set would leak mass but
    # the fixture chain is closed)
    assert abs(sum(r["pi"] for r in out.values()) - 1.0) <= 1e-3
    # four iterations must be nearer the true fixpoint than uniform
    pi_inf = pi
    for _ in range(60):
        pi_inf = pi_inf @ P
    d_start = float(np.abs(np.full(len(states), 1 / len(states)) - pi_inf).sum())
    d_four = sum(abs(out[s]["pi"] - pi_inf[idx[s]]) for s in states)
    assert d_four <= d_start + 1e-9


def test_byte_entropy_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id % 10 = 0"
    ).fetchall()
    out = {r["doc_id"]: r for r in
           REGISTRY["multimodal_byte_entropy"].build(spark, sf_dir).collect()}
    assert set(out) == {d for d, _ in rows}
    for did, text in rows:
        b = text.encode()
        c = Counter(b)
        n = len(b)
        ent = -sum((v / n) * math.log2(v / n) for v in c.values())
        r = out[did]
        assert r["n_bytes"] == n
        assert r["distinct_bytes"] == len(c)
        assert abs(r["entropy_bits"] - ent) <= 1e-3
        # entropy bounded by log2 of the alphabet actually used
        assert r["entropy_bits"] <= math.log2(len(c)) + 1e-9
