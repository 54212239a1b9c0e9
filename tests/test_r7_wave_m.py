"""Properties for the round-7 wave-M SPC keys (XmR control chart,
process capability) re-derived with plain Python/numpy."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_xmr_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT CAST(ts AS DATE), count_if(event_type = 'error')"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in rows]
    xs = [x for _, x in rows]
    mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
    xbar = sum(xs) / len(xs)
    mrbar = sum(mrs) / len(mrs)
    ucl, lcl = xbar + 2.66 * mrbar, xbar - 2.66 * mrbar
    got = {
        r["day"]: r
        for r in REGISTRY["events_xmr_chart"].build(spark, sf_dir).collect()
    }
    assert set(got) == {d.strftime("%Y-%m-%d") for d in days}
    for i, d in enumerate(days):
        r = got[d.strftime("%Y-%m-%d")]
        assert r["x"] == xs[i]
        assert r["moving_range"] == (None if i == 0 else mrs[i - 1])
        assert abs(r["ucl"] - ucl) < 1e-3
        assert abs(r["lcl"] - lcl) < 1e-3
        assert r["out_of_control"] == (xs[i] > ucl or xs[i] < lcl)


def test_capability_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    by = defaultdict(list)
    for f, q in rows:
        by[f].append(q)
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_capability"].build(spark, sf_dir).collect()
    }
    for f, qs in by.items():
        x = np.array(qs, dtype=np.float64)
        mu, sd = x.mean(), x.std(ddof=1)
        r = got[f]
        assert r["n"] == len(qs)
        assert abs(r["mean_qty"] - mu) < 1e-3
        assert abs(r["sd_qty"] - sd) < 1e-3
        assert abs(r["cp"] - (45 - 5) / (6 * sd)) < 1e-3
        assert abs(r["cpk"] - min(45 - mu, mu - 5) / (3 * sd)) < 1e-3
        frac = ((x < 5) | (x > 45)).mean()
        assert abs(r["frac_out_of_spec"] - frac) < 1e-4
