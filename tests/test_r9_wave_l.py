"""Independent-recomputation property for the round-9 wave-L key
(Viterbi via the exact tropical-matrix associative scan)."""

from __future__ import annotations

import duckdb

from etl_cnc_spark.registry import load_all
from etl_cnc_spark.operators.analytics import (
    _HMM_MATCH,
    _HMM_MISS,
    _HMM_Q,
    _HMM_START,
    _HMM_STAY,
    _HMM_SWITCH,
)

REGISTRY = load_all()


def _viterbi_py(his):
    """Sequential exact-integer Viterbi over the quantized log-probs."""
    def emit(state, hi):
        return _HMM_MATCH if hi == state else _HMM_MISS

    v0 = _HMM_START + emit(0, his[0])
    v1 = _HMM_START + emit(1, his[0])
    for hi in his[1:]:
        n0 = max(v0 + _HMM_STAY, v1 + _HMM_SWITCH) + emit(0, hi)
        n1 = max(v1 + _HMM_STAY, v0 + _HMM_SWITCH) + emit(1, hi)
        v0, v1 = n0, n1
    return v0, v1


def test_hmm_viterbi_matches_sequential_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT CAST(ts AS DATE) AS day, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1 ORDER BY 1
    """).fetchall()
    ys = [r[1] for r in rows]
    med = sorted(ys)[(len(ys) - 1) // 2]
    his = [1 if y > med else 0 for y in ys]
    v0, v1 = _viterbi_py(his)
    best = max(v0, v1)
    row = REGISTRY["events_hmm_viterbi"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == len(ys)
    # exact: the tropical scan and the sequential fold must agree to
    # the quantum (q4 rounding of best/1e9 only)
    assert abs(row["viterbi_loglik"] - best / _HMM_Q) < 1e-4
    assert row["final_state_busy"] == (1 if v1 > v0 else 0)
    # a log-likelihood of a T-step path is at most T * max log-prob < 0
    assert row["viterbi_loglik"] < 0
    # and at least T * (worst transition + worst emission)
    assert row["viterbi_loglik"] > len(ys) * (
        (_HMM_SWITCH + _HMM_MISS) / _HMM_Q
    )


def test_hmm_viterbi_scan_is_order_free():
    """Associativity in the exact integer algebra: folding a random
    observation sequence by pairwise doubling equals the left fold."""
    import random

    rng = random.Random(7)

    def emit(state, hi):
        return _HMM_MATCH if hi == state else _HMM_MISS

    def mat(hi):
        return (
            _HMM_STAY + emit(0, hi),
            _HMM_SWITCH + emit(1, hi),
            _HMM_SWITCH + emit(0, hi),
            _HMM_STAY + emit(1, hi),
        )

    def mul(a, b):
        return (
            max(a[0] + b[0], a[1] + b[2]),
            max(a[0] + b[1], a[1] + b[3]),
            max(a[2] + b[0], a[3] + b[2]),
            max(a[2] + b[1], a[3] + b[3]),
        )

    for trial in range(20):
        his = [rng.randint(0, 1) for _ in range(rng.randint(2, 200))]
        v0, v1 = _viterbi_py(his)
        mats = [mat(h) for h in his[1:]]
        while len(mats) > 1:
            nxt = []
            for i in range(0, len(mats) - 1, 2):
                nxt.append(mul(mats[i], mats[i + 1]))
            if len(mats) % 2:
                nxt.append(mats[-1])
            mats = nxt
        p = mats[0]
        s0 = _HMM_START + emit(0, his[0])
        s1 = _HMM_START + emit(1, his[0])
        w0 = max(s0 + p[0], s1 + p[2])
        w1 = max(s0 + p[1], s1 + p[3])
        assert (w0, w1) == (v0, v1), trial
