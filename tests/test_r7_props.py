"""Independent-recomputation properties for the round-7 operator
wave (Wasserstein/CvM distances, Cramér's V, Cohen's d,
Page–Hinkley, logistic Newton step, CV target encoding, naive
Bayes, Zipf fit, hapax stats, backlog aging, grid clustering): each
key is re-derived with plain Python/numpy from the raw parquet — a
third engine besides Spark and DuckDB, so a shared SQL-vs-SQL blind
spot cannot hide."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "events", "lineitem", "part", "documents",
              "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _two_sample_cents(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT)"
        " FROM events WHERE event_type IN ('click', 'purchase')"
    ).fetchall()
    a = np.array(sorted(v for t, v in rows if t == "click"), dtype=np.int64)
    b = np.array(sorted(v for t, v in rows if t == "purchase"), dtype=np.int64)
    return a, b


def test_wasserstein_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_wasserstein_1d"].build(spark, sf_dir).collect()[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    # numpy reference: W1 = integral of |ECDF1-ECDF2| over the grid
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    w1 = float(np.sum(np.abs(f1[:-1] - f2[:-1]) * np.diff(grid))) / 100.0
    assert abs(row["w1_dist"] - w1) < 1e-3


def test_cvm_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_cvm_test"].build(spark, sf_dir).collect()[0]
    grid, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    f1 = np.searchsorted(a, grid, side="right") / len(a)
    f2 = np.searchsorted(b, grid, side="right") / len(b)
    n1, n2 = len(a), len(b)
    t = n1 * n2 / (n1 + n2) ** 2 * float(np.sum(counts * (f1 - f2) ** 2))
    assert abs(row["cvm_t"] - t) < 1e-3


def test_cramers_v_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, isodow(ts) - 1, count(*) FROM events GROUP BY 1, 2"
    ).fetchall()
    types = sorted({r[0] for r in rows})
    days = sorted({r[1] for r in rows})
    obs = np.zeros((len(types), len(days)))
    for t, d, n in rows:
        obs[types.index(t), days.index(d)] = n
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    v = math.sqrt(chi2 / (n * (min(len(types), len(days)) - 1)))
    row = REGISTRY["stat_cramers_v"].build(spark, sf_dir).collect()[0]
    assert row["n"] == int(n)
    assert abs(row["chi2"] - chi2) < 0.05  # per-cell 1e-6 quantization
    assert abs(row["cramers_v"] - v) < 1e-3


def test_cohens_d_matches_numpy(spark, sf_dir):
    a, b = _two_sample_cents(sf_dir)
    row = REGISTRY["stat_cohens_d"].build(spark, sf_dir).collect()[0]
    sp = math.sqrt(
        ((len(a) - 1) * a.var(ddof=1) + (len(b) - 1) * b.var(ddof=1))
        / (len(a) + len(b) - 2)
    )
    d = (a.mean() - b.mean()) / sp
    assert abs(row["cohens_d"] - d) < 1e-3
    g = d * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    assert abs(row["hedges_g"] - g) < 1e-3


def test_page_hinkley_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute(
        "SELECT CAST(ts AS DATE) d,"
        " sum(CAST(floor(value*100+0.5) AS BIGINT)), count(*)"
        " FROM events WHERE event_type='purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = np.array([sc / 100.0 / c for _, sc, c in daily])
    sc = np.cumsum([s for _, s, _ in daily])
    cc = np.cumsum([c for _, _, c in daily])
    mu = sc / 100.0 / cc
    m = np.cumsum(x - mu - 0.05)
    ph = m - np.minimum.accumulate(m)
    rows = sorted(
        REGISTRY["stat_page_hinkley"].build(spark, sf_dir).collect(),
        key=lambda r: r["day_n"],
    )
    assert len(rows) == len(x)
    for r, want in zip(rows, ph):
        assert abs(r["ph_stat"] - want) < 1e-3
        assert r["alarm"] == (want > 10.0)
