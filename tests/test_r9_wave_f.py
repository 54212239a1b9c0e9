"""Independent-recomputation properties for the round-9 wave-F keys
(Fligner-Killeen with Acklam normal scores, Murphy's Brier
decomposition, epoch-folding periodicity)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from statistics import NormalDist

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_acklam_qnorm_matches_normaldist():
    from etl_cnc_spark.operators.stats import _QN_A  # noqa: F401

    # cross-check the embedded approximation against Python's
    # NormalDist.inv_cdf at points spanning both branches
    import pyspark.sql.functions as F  # noqa: F401
    from etl_cnc_spark.operators.stats import _sql_qnorm_upper

    for u in (0.5001, 0.6, 0.75, 0.9, 0.97, 0.9758, 0.99, 0.9999):
        got = duckdb.execute(
            f"SELECT {_sql_qnorm_upper(str(u))}"
        ).fetchone()[0]
        want = NormalDist().inv_cdf(u)
        assert abs(got - want) < 1e-7, (u, got, want)


def test_fligner_killeen_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/events.parquet'
    """).fetchall()
    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    # per-group median (lower of the two middles, matching 2*cum >= n)
    d_all = []
    group_of = []
    for g, vs in by_g.items():
        vs = sorted(vs)
        med = vs[(len(vs) - 1) // 2]
        for v in vs:
            d_all.append(abs(v - med))
            group_of.append(g)
    n = len(d_all)
    # mid-ranks of d, then Acklam-equivalent normal scores (use
    # Python's inv_cdf — tolerance absorbs the 1e-9 approximation)
    order = sorted(range(n), key=lambda i: d_all[i])
    cnt = Counter(d_all)
    first = {}
    pos = 1
    for v in sorted(cnt):
        first[v] = pos
        pos += cnt[v]
    a = {}
    for v in cnt:
        mid = first[v] + (cnt[v] - 1) / 2
        u = 0.5 + mid / (2 * (n + 1))
        aq = math.floor(NormalDist().inv_cdf(u) * 1e9 + 0.5) / 1e9
        a[v] = aq
    scores = [a[d] for d in d_all]
    abar = sum(scores) / n
    s2 = sum((x - abar) ** 2 for x in scores) / (n - 1)
    num = 0.0
    for g, vs in by_g.items():
        sg = [scores[i] for i in range(n) if group_of[i] == g]
        num += len(sg) * (sum(sg) / len(sg) - abar) ** 2
    x2 = num / s2
    row = REGISTRY["stat_fligner_killeen"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["k"] == len(by_g)
    assert abs(row["fk_stat"] - x2) < max(5e-3, x2 * 1e-3)
    assert row["fk_stat"] >= 0


def test_brier_decomposition_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT label % 2,
               least(9, greatest(0, CAST(floor((
                   list_aggregate([CAST(embedding[i] AS DOUBLE)
                       * (CAST(i * 37 % 19 - 9 AS DOUBLE) / 10.0)
                       for i in range(1, 65)], 'sum') + 0.5 + 3.0) / 0.6)
                   AS BIGINT)))
        FROM '{sf_dir}/embeddings.parquet'
    """).fetchall()
    bins = defaultdict(lambda: [0, 0])
    for y, b in rows:
        bins[b][0] += 1
        bins[b][1] += y
    n = len(rows)
    obar = sum(p for _, p in bins.values()) / n
    rel = sum(
        nk * ((b + 0.5) / 10 - pk / nk) ** 2 for b, (nk, pk) in bins.items()
    ) / n
    res = sum(nk * (pk / nk - obar) ** 2 for _, (nk, pk) in bins.items()) / n
    unc = obar * (1 - obar)
    # direct Brier of the binned forecast equals REL - RES + UNC
    bs_direct = sum(
        ((b + 0.5) / 10 - y) ** 2
        for y, b in rows
    ) / n
    row = REGISTRY["ml_brier_decomposition"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["reliability"] - rel) < 2e-4
    assert abs(row["resolution"] - res) < 2e-4
    assert abs(row["uncertainty"] - unc) < 2e-4
    assert abs(row["brier_score"] - bs_direct) < 5e-4
    assert row["reliability"] >= 0 and row["resolution"] >= 0


def test_epoch_folding_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT epoch_us(ts) // 1000000 FROM '{sf_dir}/events.parquet'
    """).fetchall()
    secs = [r[0] for r in rows]
    got = {
        r["period_s"]: r
        for r in REGISTRY["events_epoch_folding"].build(spark, sf_dir).collect()
    }
    assert set(got) == {21600, 28800, 43200, 86400, 604800}
    for p, row in got.items():
        o = Counter((s % p) * 8 // p for s in secs)
        n = len(secs)
        so2 = sum(c * c for c in o.values())
        chi2 = 8.0 * so2 / n - n
        assert row["n"] == n
        assert abs(row["chi2_stat"] - chi2) < max(1e-2, chi2 * 1e-4)
        assert row["peak_count"] == max(o.values())
        best = min(b for b, c in o.items() if c == max(o.values()))
        assert row["peak_bin"] == best
        assert row["periodic"] == (chi2 > 14.067)
