"""Independent-recomputation properties for the round-8 wave-AJ keys
(Renyi entropy spectrum, Poisson GLM trend step)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_renyi_spectrum_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    freqs: dict[str, Counter] = defaultdict(Counter)
    for lang, text in rows:
        freqs[lang].update(text.split(" "))
    got = {
        r["lang"]: r
        for r in REGISTRY["text_renyi_spectrum"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(freqs)
    for lang, c in freqs.items():
        n = sum(c.values())
        fs = np.array(list(c.values()), dtype=np.float64)
        h_half = 2 * math.log(np.sqrt(fs / n).sum())
        h_sh = math.log(n) - (fs * np.log(fs)).sum() / n
        h2 = -math.log((fs * fs).sum() / (n * n))
        h_min = -math.log(fs.max() / n)
        row = got[lang]
        assert row["vocab"] == len(c) and row["tokens"] == n
        assert abs(row["h_renyi_half"] - h_half) < 2e-3
        assert abs(row["h_shannon"] - h_sh) < 2e-3
        assert abs(row["h_renyi_2"] - h2) < 2e-3
        assert abs(row["h_min"] - h_min) < 2e-3
        # the Renyi spectrum is monotone non-increasing in alpha
        assert (
            row["h_renyi_half"]
            >= row["h_shannon"] - 1e-9
            >= row["h_renyi_2"] - 1e-9
            >= row["h_min"] - 1e-9
        )


def test_poisson_trend_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)),"
        " count_if(event_type = 'purchase')"
        f" FROM '{sf_dir}/events.parquet' GROUP BY 1"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.float64)
    t, sx, sxx = len(x), x.sum(), (x * x).sum()
    sy, sxy = y.sum(), (x * y).sum()
    b1 = (t / sy) * (t * sxy - sx * sy) / (t * sxx - sx * sx)
    b0 = math.log(sy / t) - (sx / t) * b1
    row = REGISTRY["stat_poisson_trend_glm"].build(spark, sf_dir).collect()[0]
    assert row["n_days"] == t and row["n_events"] == int(sy)
    assert abs(row["beta0"] - b0) < 2e-3
    assert abs(row["beta1"] - b1) < 2e-3
    assert abs(row["rate_ratio_per_day"] - math.exp(b1)) < 2e-3
    assert abs(row["mean_daily"] - sy / t) < 2e-3
    # one IRLS step from a constant-weight start equals weighted OLS
    # of (y - ybar)/ybar on x: cross-check against that identity
    ybar = sy / t
    wls_b1 = ((x - x.mean()) * (y - ybar)).sum() / (
        ybar * ((x - x.mean()) ** 2).sum()
    )
    assert abs(row["beta1"] - wls_b1) < 2e-3
