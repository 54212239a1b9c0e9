"""Independent-recomputation properties for the round-8 wave-AM keys
(partition-spec planner, Lepage location-scale test)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_partition_spec_planner_matches_duckdb(spark, sf_dir):
    exp = {}
    for spec, expr in (
        ("day", "strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')"),
        (
            "week",
            "strftime(date_trunc('week', CAST(l_shipdate AS DATE)),"
            " '%Y-%m-%d')",
        ),
        ("month", "strftime(CAST(l_shipdate AS DATE), '%Y-%m')"),
    ):
        rows = duckdb.execute(
            f"SELECT {expr}, count(*) FROM '{sf_dir}/lineitem.parquet'"
            " GROUP BY 1"
        ).fetchall()
        ns = [r[1] for r in rows]
        exp[spec] = (
            len(ns),
            sum(ns),
            max(ns),
            sum(ns) / len(ns),
            max(ns) * len(ns) / sum(ns),
            sum(1 for x in ns if x < 25_000) / len(ns),
        )
    got = {
        r["spec"]: r
        for r in REGISTRY["etl_partition_spec_planner"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == {"day", "week", "month"}
    for spec, (np_, nr, mx, avg, skew, small) in exp.items():
        row = got[spec]
        assert row["n_partitions"] == np_
        assert row["n_rows"] == nr
        assert row["max_rows"] == mx
        assert abs(row["avg_rows"] - avg) < 2e-3
        assert abs(row["skew_ratio"] - skew) < 2e-3
        assert abs(row["small_frac"] - small) < 2e-4
    # coarser specs have fewer partitions and bigger maxima
    assert (
        got["day"]["n_partitions"]
        > got["week"]["n_partitions"]
        > got["month"]["n_partitions"]
    )
    assert got["month"]["max_rows"] >= got["day"]["max_rows"]


def test_lepage_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT)"
        f" FROM '{sf_dir}/lineitem.parquet'"
        " WHERE l_returnflag IN ('A', 'R')"
    ).fetchall()
    xa = np.array([v for g, v in rows if g == "A"], dtype=np.float64)
    xr = np.array([v for g, v in rows if g == "R"], dtype=np.float64)
    comb = np.concatenate([xa, xr])
    n = len(comb)
    na, nr = len(xa), len(xr)
    pool = np.sort(comb)

    def midranks(sample):
        lo = np.searchsorted(pool, sample, side="left")
        hi = np.searchsorted(pool, sample, side="right")
        return (lo + hi + 1) / 2.0

    def linear_rank_z(scores_all, scores_r):
        sbar = scores_all.mean()
        t = scores_r.sum()
        var = na * nr / (n * (n - 1)) * ((scores_all - sbar) ** 2).sum()
        return (t - nr * sbar) / math.sqrt(var)

    w_all = midranks(comb)
    w_r = midranks(xr)
    a_all = (n + 1) / 2.0 - np.abs(w_all - (n + 1) / 2.0)
    a_r = (n + 1) / 2.0 - np.abs(w_r - (n + 1) / 2.0)
    zw = linear_rank_z(w_all, w_r)
    za = linear_rank_z(a_all, a_r)
    row = REGISTRY["stat_lepage"].build(spark, sf_dir).collect()[0]
    assert row["na"] == na and row["nr"] == nr
    assert abs(row["z_location"] - zw) < 2e-3
    assert abs(row["z_scale"] - za) < 2e-3
    assert abs(row["lepage_l"] - (zw * zw + za * za)) < 5e-3
    assert row["lepage_l"] >= 0
