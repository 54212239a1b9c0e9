"""Independent-recomputation properties for the third round-5
operator wave (Mann-Whitney U, jackknife CV, Benford audit) —
plain-Python references over the SAME parquet inputs, mirroring
test_r5_wave2_props.py."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_mann_whitney_matches_python_fold(spark, sf_dir):
    """U statistic and tie-corrected z recomputed with a naive
    midrank assignment over the pooled sample."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet' "
        "WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    pooled = sorted(
        (math.floor(v * 100 + 0.5), etype) for etype, v in rows
    )
    n1 = sum(1 for _, e in pooled if e == "click")
    n2 = len(pooled) - n1
    # midranks: average rank within each tied value run
    r1 = 0.0
    tie3 = 0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        midrank = (i + 1 + j) / 2  # average of ranks i+1 .. j
        r1 += midrank * sum(1 for k in range(i, j) if pooled[k][1] == "click")
        tie3 += t * t * t - t
        i = j
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    mu = n1 * n2 / 2
    sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1))))
    z = (u1 - mu) / sigma
    row = REGISTRY["stat_mann_whitney"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u1"] - u1) <= 1e-6
    assert abs(row["z"] - z) <= 1e-3
    assert row["significant"] == (abs(z) > 1.96)
    # U is bounded by the pair count
    assert 0 <= row["u1"] <= n1 * n2


def test_jackknife_cv_matches_python_loo(spark, sf_dir):
    """The real thing: n leave-one-out recomputations of the CV,
    which the operator must reproduce from moment algebra alone."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for etype, v in rows:
        groups.setdefault(etype, []).append(math.floor(v * 100 + 0.5))
    got = {
        r["event_type"]: r
        for r in REGISTRY["stat_jackknife_cv"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for etype, xs in groups.items():
        n = len(xs)
        mean = sum(xs) / n
        var = sum((x - mean) ** 2 for x in xs) / (n - 1)
        cv_full = math.sqrt(var) / mean
        loo = []
        for i in range(n):
            rest = xs[:i] + xs[i + 1 :]
            m = sum(rest) / (n - 1)
            v = sum((x - m) ** 2 for x in rest) / (n - 2)
            loo.append(math.sqrt(v) / m)
        cv_bar = sum(loo) / n
        se = math.sqrt((n - 1) / n * sum((c - cv_bar) ** 2 for c in loo))
        bc = n * cv_full - (n - 1) * cv_bar
        r = got[etype]
        assert r["n"] == n
        assert abs(r["cv_full"] - cv_full) <= 1e-3
        assert abs(r["cv_jack_bc"] - bc) <= 1e-3
        assert abs(r["se_jack"] - se) <= 1e-3
        # jackknife SE of the CV must be small relative to the CV
        assert 0 < r["se_jack"] < r["cv_full"]


def test_benford_matches_python_fold(spark, sf_dir):
    con = duckdb.connect()
    prices = [
        p
        for (p,) in con.execute(
            f"SELECT o_totalprice FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    obs = Counter(str(math.floor(p * 100 + 0.5))[0] for p in prices)
    n = sum(obs.values())
    got = {r["d"]: r for r in REGISTRY["etl_benford"].build(spark, sf_dir).collect()}
    assert set(got) == {int(d) for d in obs}
    p_sum = 0.0
    for d, r in got.items():
        exp_p = math.log10(1 + 1 / d)
        e = n * exp_p
        assert r["obs"] == obs[str(d)]
        assert r["n"] == n
        assert abs(r["obs_p"] - obs[str(d)] / n) <= 1e-3
        assert abs(r["exp_p"] - exp_p) <= 1e-3
        assert abs(r["chi2_contrib"] - (obs[str(d)] - e) ** 2 / e) <= 1e-2
        p_sum += r["obs_p"]
    # observed shares are a distribution over the digits present
    assert abs(p_sum - 1.0) <= 1e-3
