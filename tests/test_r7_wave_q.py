"""Properties for the round-7 wave-Q keys (ordered listagg, Gamma /
negative-binomial moment fits, interpolation oversampling) re-derived
with plain Python/numpy."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("nation", "lineitem", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_listagg_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT n_regionkey, n_name FROM nation"
    ).fetchall()
    by = defaultdict(list)
    for r, n in rows:
        by[r].append(n)
    got = {
        r["n_regionkey"]: r
        for r in REGISTRY["agg_listagg_ordered"].build(spark, sf_dir).collect()
    }
    for r, names in by.items():
        assert got[r]["members"] == ",".join(sorted(names))
        assert got[r]["n"] == len(names)


def test_gamma_fit_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        " FROM lineitem"
    ).fetchall()
    by = defaultdict(list)
    for f, v in rows:
        by[f].append(v / 100.0)
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_gamma_fit_mom"].build(spark, sf_dir).collect()
    }
    for f, xs in by.items():
        x = np.array(xs)
        mu, var = x.mean(), x.var()
        assert abs(got[f]["mean_price"] - mu) < 1e-2
        assert abs(got[f]["shape_k"] - mu * mu / var) < 1e-3
        assert abs(got[f]["scale_theta"] - var / mu) < 1e-2


def test_negbin_fit_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, CAST(ts AS DATE), count(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    c = np.array([r[2] for r in rows], dtype=np.float64)
    mu, var = c.mean(), c.var()
    out = REGISTRY["stat_negbin_fit_mom"].build(spark, sf_dir).collect()[0]
    assert out["n"] == len(c)
    assert abs(out["mean_count"] - mu) < 1e-3
    assert abs(out["var_count"] - var) < 1e-3
    assert abs(out["dispersion"] - var / mu) < 1e-3
    assert abs(out["nb_r"] - mu * mu / (var - mu)) < 1e-3
    assert abs(out["nb_p"] - mu / var) < 1e-4


def test_oversample_matches_numpy(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    counts = Counter(r[1] for r in rows)
    minority = min(counts, key=lambda l: (counts[l], l))
    members = [
        np.asarray(r[2], dtype=np.float64)
        for r in rows
        if r[1] == minority
    ]
    checksum = 0
    for a, b in zip(members, members[1:]):
        mid = (a + b) / 2.0
        checksum += int(np.floor(mid * 1e8 + 0.5).astype("int64").sum())
    got = {
        r["label"]: r
        for r in REGISTRY["ml_oversample_interpolate"]
        .build(spark, sf_dir)
        .collect()
    }
    assert {k: v["n_orig"] for k, v in got.items()} == dict(counts)
    for label, r in got.items():
        if label == minority:
            assert r["n_synth"] == len(members) - 1
            assert r["checksum_q"] == checksum
        else:
            assert r["n_synth"] == 0
            assert r["checksum_q"] == 0
