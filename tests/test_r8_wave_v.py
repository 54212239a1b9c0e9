"""Independent-recomputation properties for the round-8 wave-V keys
(Theil's U, Fleiss' kappa, Pythagorean means, Luhn checksum)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_theil_u_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT event_type, hour(ts) // 6 FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    n = len(rows)
    cxy = Counter(rows)
    cx = Counter(r[0] for r in rows)
    cy = Counter(r[1] for r in rows)

    def h(counts):
        return math.log(n) - sum(c * math.log(c) for c in counts.values()) / n

    h_xy, h_x, h_y = h(cxy), h(cx), h(cy)
    mi = h_x + h_y - h_xy
    row = REGISTRY["stat_theil_u"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert abs(row["h_x"] - h_x) < 2e-4
    assert abs(row["h_y"] - h_y) < 2e-4
    assert abs(row["theil_u_yx"] - mi / h_y) < 2e-4
    assert abs(row["theil_u_xy"] - mi / h_x) < 2e-4
    assert abs(row["u_symmetric"] - 2 * mi / (h_x + h_y)) < 2e-4
    # U is a normalized MI: inside [0, 1]
    assert -1e-9 <= row["theil_u_yx"] <= 1.0
    assert -1e-9 <= row["theil_u_xy"] <= 1.0


def test_fleiss_kappa_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    w = np.array([((i * 37) % 19 - 9) / 10.0 for i in range(1, 65)])
    emb = np.array([r[0] for r in rows], dtype=np.float64)
    sq = np.floor((emb @ w + 0.5) * 1e6 + 0.5).astype(np.int64)
    m = 3
    n_pos = sum((sq > t).astype(int) for t in (-500_000, 0, 500_000))
    n = len(sq)
    p_bar = float(
        (n_pos * (n_pos - 1) + (m - n_pos) * (m - 1 - n_pos)).sum()
    ) / n / (m * (m - 1))
    p1 = n_pos.sum() / (n * m)
    p_e = p1**2 + (1 - p1) ** 2
    kappa = (p_bar - p_e) / (1 - p_e)
    row = REGISTRY["ml_fleiss_kappa"].build(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["n_raters"] == m
    assert abs(row["p_bar"] - p_bar) < 2e-4
    assert abs(row["p_e"] - p_e) < 2e-4
    assert abs(row["kappa"] - kappa) < 2e-3
    # correlated raters must agree above chance
    assert row["kappa"] > 0


def test_pythagorean_means_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT l_returnflag, l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    by_flag: dict[str, list[float]] = {}
    for fl, x in rows:
        by_flag.setdefault(fl, []).append(x)
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_pythagorean_means"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(by_flag)
    for fl, xs in by_flag.items():
        a = np.array(xs)
        row = got[fl]
        assert row["n"] == len(a)
        assert abs(row["mean_arith"] - a.mean()) < 0.02
        assert abs(row["mean_geom"] - math.exp(np.log(a).mean())) < 0.05
        assert abs(row["mean_harm"] - len(a) / (1.0 / a).sum()) < 0.05
        assert abs(row["mean_rms"] - math.sqrt((a * a).mean())) < 0.05
        # the Pythagorean ladder: HM <= GM <= AM <= RMS
        assert (
            row["mean_harm"]
            <= row["mean_geom"]
            <= row["mean_arith"]
            <= row["mean_rms"]
        )


def _luhn_total(acct: str) -> int:
    tot = 0
    for p, ch in enumerate(reversed(acct)):
        d = int(ch)
        if p % 2 == 0:
            tot += d
        else:
            tot += d * 2 - 9 if d * 2 > 9 else d * 2
    return tot


def test_luhn_matches_python(spark, sf_dir):
    keys = [
        r[0]
        for r in duckdb.execute(
            f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    rems = Counter(
        _luhn_total(str((k * 7919 + 12345) % 10**12).zfill(12)) % 10
        for k in keys
    )
    got = {
        r["rem"]: r
        for r in REGISTRY["fn_luhn_check"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(rems)
    for rem, n in rems.items():
        assert got[rem]["n"] == n
        assert got[rem]["luhn_valid"] == (rem == 0)
    # classic Luhn property: appending the right check digit validates
    assert sum(r["n"] for r in got.values()) == len(keys)
