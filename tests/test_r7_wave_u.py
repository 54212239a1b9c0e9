"""Properties for the round-7 wave-U keys (Bland-Altman agreement,
basket-size distribution) re-derived with plain Python/numpy."""

from __future__ import annotations

from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_bland_altman_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """WITH l AS (
            SELECT l_orderkey,
                   sum(CAST(floor(l_extendedprice * (1 + l_tax)
                       * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS lc
            FROM lineitem GROUP BY 1)
        SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) - l.lc
        FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    d = np.array([r[0] for r in rows], dtype=np.float64)
    bias, sd = d.mean(), d.std(ddof=1)
    lo, hi = bias - 1.96 * sd, bias + 1.96 * sd
    out = REGISTRY["orders_bland_altman"].build(spark, sf_dir).collect()[0]
    assert out["n"] == len(d)
    assert abs(out["bias_dollars"] - bias / 100) < 1e-2
    assert abs(out["sd_dollars"] - sd / 100) < 1e-2
    assert abs(out["loa_lo_dollars"] - lo / 100) < 1e-2
    assert abs(out["loa_hi_dollars"] - hi / 100) < 1e-2
    assert out["n_outside"] == int(((d < lo) | (d > hi)).sum())
    # ~95% of differences must sit inside the limits of agreement
    assert out["n_outside"] <= 0.08 * len(d)


def test_basket_size_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_orderkey, count(*) FROM lineitem GROUP BY 1"
    ).fetchall()
    hist = Counter(r[1] for r in rows)
    n_orders = len(rows)
    n_lines = sum(r[1] for r in rows)
    got = {
        r["basket_size"]: r
        for r in REGISTRY["orders_basket_size_distribution"]
        .build(spark, sf_dir)
        .collect()
    }
    assert {k: v["n_orders_k"] for k, v in got.items()} == dict(hist)
    for k, r in got.items():
        assert r["n_orders"] == n_orders
        assert r["n_lines"] == n_lines
        assert r["share_bp"] == 10000 * hist[k] // n_orders


def test_icc_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """SELECT c.c_nationkey,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_nationkey"""
    ).fetchall()
    from collections import defaultdict

    by = defaultdict(list)
    for g, x in rows:
        by[g].append(float(x))
    k = len(by)
    n = sum(len(v) for v in by.values())
    grand = sum(sum(v) for v in by.values()) / n
    ssb = sum(len(v) * (np.mean(v) - grand) ** 2 for v in by.values())
    sst = sum((x - grand) ** 2 for v in by.values() for x in v)
    ssw = sst - ssb
    msb, msw = ssb / (k - 1), ssw / (n - k)
    n0 = n / k
    out = (
        REGISTRY["stat_icc_variance_components"]
        .build(spark, sf_dir)
        .collect()[0]
    )
    assert out["n_groups"] == k and out["n_custs"] == n
    assert abs(out["eta_sq"] - ssb / sst) < 1e-3
    assert abs(out["icc1"] - (msb - msw) / (msb + (n0 - 1) * msw)) < 1e-3
    assert abs(out["f_stat"] - msb / msw) < max(1e-3, abs(msb / msw) * 1e-3)
