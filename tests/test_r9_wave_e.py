"""Independent-recomputation properties for the round-9 wave-E keys
(Fisher exact, Quade, Bhattacharyya/Hellinger, OFFSET pagination)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _lnfact(x: int) -> float:
    return math.lgamma(x + 1)


def test_fisher_exact_matches_python(spark, sf_dir):
    a, b, c, d = duckdb.execute(f"""
        SELECT count_if(CAST(ts AS DATE) <= DATE '2024-01-16'
                        AND event_type = 'error'),
               count_if(CAST(ts AS DATE) <= DATE '2024-01-16'
                        AND event_type = 'signup'),
               count_if(CAST(ts AS DATE) > DATE '2024-01-16'
                        AND event_type = 'error'),
               count_if(CAST(ts AS DATE) > DATE '2024-01-16'
                        AND event_type = 'signup')
        FROM '{sf_dir}/events.parquet'
        WHERE user_id % 199 = 0 AND event_type IN ('error', 'signup')
    """).fetchall()[0]
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d

    def pk(k):
        return math.exp(
            _lnfact(r1) - _lnfact(k) - _lnfact(r1 - k)
            + _lnfact(r2) - _lnfact(c1 - k) - _lnfact(r2 - (c1 - k))
            - (_lnfact(n) - _lnfact(c1) - _lnfact(n - c1))
        )

    lo, hi = max(0, c1 - r2), min(r1, c1)
    p_obs = pk(a)
    p = sum(pk(k) for k in range(lo, hi + 1) if pk(k) <= p_obs * 1.0000001)
    row = REGISTRY["stat_fisher_exact"].build(spark, sf_dir).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    # probabilities over the support sum to 1
    assert abs(sum(pk(k) for k in range(lo, hi + 1)) - 1.0) < 1e-9
    assert abs(row["p_two_sided"] - p) < 1e-3
    assert 0.0 <= row["p_two_sided"] <= 1.0 + 1e-9
    if b * c:
        assert abs(row["odds_ratio"] - a * d / (b * c)) < 1e-3
    assert row["significant"] == (row["p_two_sided"] < 0.05)


def test_quade_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT date_trunc('week', CAST(ts AS DATE)), event_type, count(*)
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
    """).fetchall()
    wks = sorted({r[0] for r in rows})
    trts = sorted({r[1] for r in rows})
    y = {(w, t): 0 for w in wks for t in trts}
    for w, t, c in rows:
        y[(w, t)] = c
    k = len(trts)

    def midranks(vals):
        out = []
        for v in vals:
            less = sum(1 for u in vals if u < v)
            eq = sum(1 for u in vals if u == v)
            out.append(less + (eq + 1) / 2)
        return out

    ranges = {w: max(y[(w, t)] for t in trts) - min(y[(w, t)] for t in trts)
              for w in wks}
    q = dict(zip(wks, midranks([ranges[w] for w in wks])))
    s = {}
    for w in wks:
        r = dict(zip(trts, midranks([y[(w, t)] for t in trts])))
        for t in trts:
            s[(w, t)] = q[w] * (r[t] - (k + 1) / 2)
    a_tot = sum(v * v for v in s.values())
    b_num = sum(
        sum(s[(w, t)] for w in wks) ** 2 for t in trts
    ) / len(wks)
    f = (len(wks) - 1) * b_num / (a_tot - b_num)
    row = REGISTRY["stat_quade_test"].build(spark, sf_dir).collect()[0]
    assert row["n_blocks"] == len(wks) and row["k"] == k
    assert abs(row["quade_f"] - f) < 5e-3
    assert row["quade_f"] >= 0
    assert row["rejected"] == (row["quade_f"] > 2.372)


def test_bhattacharyya_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT event_type,
               CAST(floor(floor(value*100 + 0.5) / 2500) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
        WHERE event_type IN ('click', 'purchase')
    """).fetchall()
    c1 = Counter(b for t, b in rows if t == "click")
    c2 = Counter(b for t, b in rows if t == "purchase")
    n1, n2 = sum(c1.values()), sum(c2.values())
    bins = set(c1) | set(c2)
    bc = sum(
        math.floor(math.sqrt((c1[b] / n1) * (c2[b] / n2)) * 1e12 + 0.5) / 1e12
        for b in bins
    )
    row = REGISTRY["stat_bhattacharyya"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["n_bins"] == len(bins)
    assert abs(row["bc_coefficient"] - bc) < 2e-4
    assert abs(row["hellinger"] - math.sqrt(max(0, 1 - bc))) < 2e-4
    assert abs(row["bhattacharyya_d"] + math.log(bc)) < 2e-3
    # BC in [0,1]; Hellinger consistent with it
    assert 0 <= row["bc_coefficient"] <= 1.0 + 1e-9


def test_offset_page_is_second_page(spark, sf_dir):
    top20 = duckdb.execute(f"""
        SELECT CAST(c_custkey AS BIGINT),
               CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS b
        FROM '{sf_dir}/customer.parquet'
        ORDER BY b DESC, c_custkey LIMIT 20
    """).fetchall()
    got = (
        REGISTRY["sql_entry_offset"].build(spark, sf_dir).collect()
    )
    assert len(got) == 10
    assert [(r["c_custkey"], r["bal_cents"]) for r in got] == top20[10:]
    # the plan must be TakeOrderedAndProject with an offset, never a
    # global sort
    plan = (
        REGISTRY["sql_entry_offset"]
        .build(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan and "offset=10" in plan
