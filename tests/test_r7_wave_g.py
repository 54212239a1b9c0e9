"""Independent-recomputation properties for the round-7 wave-G
classical tests (Jarque–Bera, Grubbs, Mood's median, Cochran's Q,
two-proportion z, odds ratio): each statistic is re-derived with
plain Python/numpy from the raw parquet — a third engine besides
Spark and DuckDB, so a shared SQL-vs-SQL blind spot cannot hide."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_jarque_bera_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    by = defaultdict(list)
    for f, q in rows:
        by[f].append(q)
    out = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_jarque_bera"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(by)
    for f, xs in by.items():
        x = np.array(xs, dtype=np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        s = ((x - x.mean()) ** 3).mean() / m2**1.5
        k = ((x - x.mean()) ** 4).mean() / m2**2 - 3
        jb = len(x) / 6.0 * (s * s + k * k / 4.0)
        assert out[f]["n"] == len(x)
        assert abs(out[f]["skewness"] - s) < 1e-3
        assert abs(out[f]["excess_kurtosis"] - k) < 1e-3
        assert abs(out[f]["jb_stat"] - jb) < 1e-2
        assert out[f]["rejected"] == (jb > 5.9915)


def test_grubbs_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT o_orderpriority,"
        " CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) FROM orders"
    ).fetchall()
    by = defaultdict(list)
    for p, v in rows:
        by[p].append(v)
    out = {
        r["o_orderpriority"]: r
        for r in REGISTRY["stat_grubbs"].build(spark, sf_dir).collect()
    }
    for p, xs in by.items():
        x = np.array(xs, dtype=np.float64)
        mu, sd = x.mean(), x.std(ddof=1)
        g = max(x.max() - mu, mu - x.min()) / sd
        assert abs(out[p]["g_stat"] - g) < 1e-3
        want = x.max() if x.max() - mu >= mu - x.min() else x.min()
        assert out[p]["outlier_cents"] == want
        assert abs(out[p]["mean_price"] - mu / 100.0) < 1e-3


def test_mood_median_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT)"
        " FROM events"
    ).fetchall()
    vals = sorted(v for _, v in rows)
    n = len(vals)
    # median = min v with 2*cum >= n over the ascending value grid
    med = vals[(n - 1) // 2] if n % 2 else vals[n // 2 - 1]
    by = defaultdict(list)
    for t, v in rows:
        by[t].append(v)
    above = {t: sum(1 for v in xs if v > med) for t, xs in by.items()}
    tot_above = sum(above.values())
    chi2 = 0.0
    for t, xs in by.items():
        ng = len(xs)
        ea = ng * tot_above / n
        el = ng * (n - tot_above) / n
        chi2 += (above[t] - ea) ** 2 / ea + ((ng - above[t]) - el) ** 2 / el
    out = REGISTRY["stat_mood_median"].build(spark, sf_dir).collect()
    assert len(out) == len(by)
    for r in out:
        assert r["median_cents"] == med
        assert r["n_above"] == above[r["event_type"]]
        assert abs(r["chi2_stat"] - chi2) < 1e-2
        assert r["rejected"] == (chi2 > 9.4877)


def test_cochran_q_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, event_type FROM events"
    ).fetchall()
    users = sorted({u for u, _ in rows})
    types = ("click", "purchase", "view")
    cnt = Counter((u, t) for u, t in rows if t in types)
    tot = {t: sum(c for (u, tt), c in cnt.items() if tt == t) for t in types}
    nu = len(users)
    x = {
        (u, t): 1 if cnt.get((u, t), 0) * nu > tot[t] else 0
        for u in users
        for t in types
    }
    cj = {t: sum(x[(u, t)] for u in users) for t in types}
    r_u = [sum(x[(u, t)] for t in types) for u in users]
    t_total = sum(r_u)
    sum_r2 = sum(r * r for r in r_u)
    k = 3
    q = (
        (k - 1)
        * (k * sum(c * c for c in cj.values()) - t_total**2)
        / (k * t_total - sum_r2)
    )
    row = REGISTRY["stat_cochran_q"].build(spark, sf_dir).collect()[0]
    assert row["n_users"] == nu
    assert row["c_click"] == cj["click"]
    assert row["c_purchase"] == cj["purchase"]
    assert row["c_view"] == cj["view"]
    assert row["t_total"] == t_total
    assert abs(row["q_stat"] - q) < 1e-3


def test_proportions_ztest_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id % 2, event_type = 'purchase' FROM events"
    ).fetchall()
    n1 = sum(1 for g, _ in rows if g == 0)
    x1 = sum(1 for g, s in rows if g == 0 and s)
    n2 = len(rows) - n1
    x2 = sum(1 for g, s in rows if g == 1 and s)
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    h = 2 * (math.asin(math.sqrt(p1)) - math.asin(math.sqrt(p2)))
    row = REGISTRY["stat_proportions_ztest"].build(spark, sf_dir).collect()[0]
    assert (row["n1"], row["x1"], row["n2"], row["x2"]) == (n1, x1, n2, x2)
    assert abs(row["z_stat"] - z) < 1e-3
    assert abs(row["cohens_h"] - h) < 1e-3
    assert row["rejected"] == (abs(z) > 1.96)


def test_odds_ratio_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id % 2, event_type = 'purchase' FROM events"
    ).fetchall()
    a = sum(1 for g, s in rows if g == 0 and s)
    b = sum(1 for g, s in rows if g == 0 and not s)
    c = sum(1 for g, s in rows if g == 1 and s)
    d = sum(1 for g, s in rows if g == 1 and not s)
    lor = math.log(a * d / (b * c))
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    rr = (a / (a + b)) / (c / (c + d))
    row = REGISTRY["stat_odds_ratio"].build(spark, sf_dir).collect()[0]
    assert (row["a"], row["b"], row["c_"], row["d"]) == (a, b, c, d)
    assert abs(row["odds_ratio"] - math.exp(lor)) < 1e-3
    assert abs(row["ci_lo"] - math.exp(lor - 1.96 * se)) < 1e-3
    assert abs(row["ci_hi"] - math.exp(lor + 1.96 * se)) < 1e-3
    assert abs(row["risk_ratio"] - rr) < 1e-3
