"""Independent-recomputation properties for the round-7 wave-I keys
(Kaplan-Meier, Hurst R/S, PACF, Hodges-Lehmann, label propagation,
Theil decomposition): each statistic is re-derived with plain
Python/numpy from the raw parquet — a third engine besides Spark and
DuckDB."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_kaplan_meier_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)"
        " FROM events GROUP BY 1"
    ).fetchall()
    gmax = max(r[2] for r in rows)
    per_t = defaultdict(lambda: [0, 0])  # t -> [deaths, censored]
    for _, first, last in rows:
        t = (last - first).days
        dead = (gmax - last).days > 2
        per_t[t][0 if dead else 1] += 1
    n_total = len(rows)
    got = {
        r["t_days"]: r
        for r in REGISTRY["events_kaplan_meier"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(per_t)
    surv, left = 1.0, 0
    for t in sorted(per_t):
        d, c = per_t[t]
        n_risk = n_total - left
        assert got[t]["n_risk"] == n_risk
        assert got[t]["d_events"] == d
        assert got[t]["c_censored"] == c
        if d >= n_risk:
            surv = 0.0
        elif d:
            surv *= 1.0 - d / n_risk
        assert abs(got[t]["survival"] - surv) < 1e-3
        left += d + c


def test_hurst_matches_numpy(spark, sf_dir):
    from etl_cnc_spark.operators.stats import HURST_SIZES

    rows = _con(sf_dir).execute(
        "SELECT date_trunc('hour', ts),"
        " sum(CAST(floor(value * 100 + 0.5) AS BIGINT))"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    series = np.array([float(v) for _, v in rows])
    got = {
        r["win_n"]: r
        for r in REGISTRY["stat_hurst_rs"].build(spark, sf_dir).collect()
    }
    pts = []
    for n in HURST_SIZES:
        rs_vals = []
        for c in range(len(series) // n):
            chunk = series[c * n : (c + 1) * n]
            dev = np.cumsum(chunk - chunk.mean())
            r = max(dev.max(), 0.0) - min(dev.min(), 0.0)
            s = chunk.std()
            if s > 0:
                rs_vals.append(r / s)
        if rs_vals:
            avg = float(np.mean(rs_vals))
            pts.append((math.log(n), math.log(avg)))
            assert abs(got[n]["rs_avg"] - avg) < 1e-3
            assert got[n]["n_chunks"] == len(rs_vals)
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    h = ((len(x) * (x * y).sum() - x.sum() * y.sum())
         / (len(x) * (x * x).sum() - x.sum() ** 2))
    for r in got.values():
        assert abs(r["hurst"] - h) < 1e-2


def test_pacf_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT date_trunc('hour', ts),"
        " sum(CAST(floor(value * 100 + 0.5) AS BIGINT))"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = np.array([float(v) for _, v in rows])
    n, mu = len(y), y.mean()
    denom = ((y - mu) ** 2).sum()
    r = [1.0] + [
        (((y[k:] - mu) * (y[:-k] - mu)).sum()) / denom for k in (1, 2, 3)
    ]
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    phi21 = phi11 - phi22 * phi11
    e2 = (1 - r[1] ** 2) * (1 - phi22 ** 2)
    phi33 = (r[3] - phi21 * r[2] - phi22 * r[1]) / e2
    got = {
        row["lag"]: row
        for row in REGISTRY["stat_pacf"].build(spark, sf_dir).collect()
    }
    for k, ph in ((1, phi11), (2, phi22), (3, phi33)):
        assert abs(got[k]["acf"] - r[k]) < 1e-3
        assert abs(got[k]["pacf"] - ph) < 1e-3
        assert got[k]["n_terms"] == n - k


def test_hodges_lehmann_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    by = defaultdict(list)
    for f, q in rows:
        by[f].append(q)
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_hodges_lehmann"].build(spark, sf_dir).collect()
    }
    for f, xs in by.items():
        cnt = Counter(xs)
        walsh = Counter()
        vals = sorted(cnt)
        for i, a in enumerate(vals):
            walsh[2 * a] += cnt[a] * (cnt[a] + 1) // 2
            for b in vals[i + 1 :]:
                walsh[a + b] += cnt[a] * cnt[b]
        total = sum(walsh.values())
        cum = 0
        for w in sorted(walsh):
            cum += walsh[w]
            if 2 * cum >= total:
                break
        assert got[f]["n_pairs"] == total
        assert got[f]["pseudo_median"] == w / 2.0


def test_label_propagation_matches_python(spark, sf_dir):
    from etl_cnc_spark.operators.graph import LPA_ROUNDS

    edges = _con(sf_dir).execute(
        """SELECT c.c_nationkey, s.s_nationkey, CAST(count(*) AS BIGINT)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2"""
    ).fetchall()
    nodes = [
        r[0]
        for r in _con(sf_dir).execute(
            "SELECT n_nationkey FROM nation"
        ).fetchall()
    ]
    nbr = defaultdict(list)
    for u, v, w in edges:
        if u != v:
            nbr[u].append((v, w))
            nbr[v].append((u, w))
    lab = {v: v for v in nodes}
    for _ in range(LPA_ROUNDS):
        new = {}
        for v in nodes:
            votes = defaultdict(int)
            for n, w in nbr[v]:
                votes[lab[n]] += w
            if votes:
                new[v] = min(
                    votes, key=lambda l: (-votes[l], l)
                )
            else:
                new[v] = lab[v]
        lab = new
    want = Counter(lab.values())
    got = {
        r["community"]: r
        for r in REGISTRY["graph_label_propagation"]
        .build(spark, sf_dir)
        .collect()
    }
    assert {k: v["n_nations"] for k, v in got.items()} == dict(want)
    for comm, row in got.items():
        assert row["rep_nation"] == min(
            v for v, l in lab.items() if l == comm
        )


def test_theil_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """SELECT c.c_nationkey,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_nationkey"""
    ).fetchall()
    by = defaultdict(list)
    for nat, x in rows:
        by[nat].append(float(x))
    n_tot = sum(len(v) for v in by.values())
    x_tot = sum(sum(v) for v in by.values())
    got = {
        r["nationkey"]: r
        for r in REGISTRY["stat_theil_decomposition"]
        .build(spark, sf_dir)
        .collect()
    }
    t_btw = t_win = 0.0
    for nat, xs in by.items():
        xg, ng = sum(xs), len(xs)
        mu_g = xg / ng
        t_g = sum(x * math.log(x) for x in xs) / xg - math.log(mu_g)
        share = xg / x_tot
        t_btw += share * math.log(share / (ng / n_tot))
        t_win += share * t_g
        assert got[nat]["n_cust"] == ng
        assert abs(got[nat]["theil_g"] - t_g) < 1e-3
        assert abs(got[nat]["spend_share"] - share) < 1e-3
    for r in got.values():
        assert abs(r["t_between"] - t_btw) < 1e-3
        assert abs(r["t_within"] - t_win) < 1e-3
        assert abs(r["t_total"] - (t_btw + t_win)) < 1e-3
