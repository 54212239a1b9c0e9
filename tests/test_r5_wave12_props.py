"""Independent-recomputation properties for the twelfth round-5 wave
(HDR log-bucket histogram, skyline query)."""

from __future__ import annotations

import math

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_hdr_histogram_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    hist: dict[tuple[str, int], int] = {}
    for et, vc in rows:
        b = max(vc, 1).bit_length()
        hist[(et, b)] = hist.get((et, b), 0) + 1
    out = REGISTRY["agg_hdr_histogram"].build(spark, sf_dir).collect()
    got = {(r["event_type"], r["bucket"]): r for r in out}
    assert set(got) == set(hist)
    totals: dict[str, int] = {}
    for (et, _), n in hist.items():
        totals[et] = totals.get(et, 0) + n
    for (et, b), n in hist.items():
        r = got[(et, b)]
        assert r["n"] == n
        assert r["lo_cents"] == 2 ** (b - 1)
        assert r["hi_cents"] == 2**b - 1
        cum = sum(v for (e2, b2), v in hist.items() if e2 == et and b2 <= b)
        assert r["cum_n"] == cum
        assert abs(r["cum_share"] - cum / totals[et]) <= 1e-3
    # exactly one p95 bucket per event_type, and the bucket's bounds
    # bracket the true p95 value
    for et in totals:
        p95 = [r for (e2, _), r in got.items() if e2 == et and r["is_p95_bucket"]]
        assert len(p95) == 1
        vals = sorted(max(vc, 1) for e2, vc in rows if e2 == et)
        true_p95 = vals[math.ceil(0.95 * len(vals)) - 1]
        assert p95[0]["lo_cents"] <= true_p95 <= p95[0]["hi_cents"]


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    """The windowed sweep must reproduce the O(n^2) dominance
    definition exactly (computed with sorting + scan in Python)."""
    con = duckdb.connect()
    pts = con.execute(
        f"SELECT o_orderkey, CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), "
        f"CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    # scan in descending price order, tracking the best day seen at
    # strictly-higher price and the best day within the tie group
    pts_sorted = sorted(pts, key=lambda t: (-t[1], -t[2]))
    frontier = set()
    best_higher = -1
    i = 0
    while i < len(pts_sorted):
        j = i
        while j < len(pts_sorted) and pts_sorted[j][1] == pts_sorted[i][1]:
            j += 1
        group = pts_sorted[i:j]
        best_same = max(d for _, _, d in group)
        for key, _, d in group:
            if d == best_same and d > best_higher:
                frontier.add(key)
        best_higher = max(best_higher, best_same)
        i = j
    out = REGISTRY["orders_skyline"].build(spark, sf_dir).collect()
    assert {r["o_orderkey"] for r in out} == frontier
    # frontier property: no member dominates another
    mem = [(r["cents"], r["day_n"]) for r in out]
    for a in mem:
        for b in mem:
            if a != b:
                assert not (a[0] >= b[0] and a[1] >= b[1]
                            and (a[0] > b[0] or a[1] > b[1]))
