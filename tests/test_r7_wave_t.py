"""Properties for the round-7 wave-T keys (winsorized/trimmed means,
diurnal-weekly profile) re-derived with plain Python/numpy."""

from __future__ import annotations

from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_winsorized_trimmed_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    by = defaultdict(list)
    for f, q in rows:
        by[f].append(q)
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_winsorized_trimmed"]
        .build(spark, sf_dir)
        .collect()
    }
    for f, xs in by.items():
        xs.sort()
        n = len(xs)
        # smallest v with 100*cum >= p*n, over the value grid
        def bound(p):
            cum = 0
            last = None
            for v in xs:
                cum += 1
                if 100 * cum >= p * n and (last is None or v != last):
                    return v
                last = None
            return xs[-1]

        # recompute exactly as defined: grid cum counts
        from collections import Counter

        cnt = Counter(xs)
        vals = sorted(cnt)
        cum = 0
        lo = hi = None
        for v in vals:
            cum += cnt[v]
            if lo is None and 100 * cum >= 5 * n:
                lo = v
            if hi is None and 100 * cum >= 95 * n:
                hi = v
        w = [min(max(x, lo), hi) for x in xs]
        kept = [x for x in xs if lo <= x <= hi]
        r = got[f]
        assert r["n"] == n
        assert r["p05"] == lo and r["p95"] == hi
        assert abs(r["winsorized_mean"] - sum(w) / n) < 1e-3
        assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-3
        assert r["n_kept"] == len(kept)
        # robustness sanity: both means within the bounds
        assert lo <= r["winsorized_mean"] <= hi
        assert lo <= r["trimmed_mean"] <= hi


def test_diurnal_profile_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT isodow(ts), hour(ts),"
        " CAST(floor(value * 100 + 0.5) AS BIGINT) FROM events"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])
    for d, h, c in rows:
        cells[(d, h)][0] += 1
        cells[(d, h)][1] += c
    total = sum(v[0] for v in cells.values())
    got = {
        (r["dow"], r["hod"]): r
        for r in REGISTRY["events_diurnal_weekly_profile"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(cells)
    for k, (n, cents) in cells.items():
        assert got[k]["n"] == n
        assert got[k]["cents"] == cents
        assert got[k]["share_bp"] == 10000 * n // total
    assert all(1 <= d <= 7 and 0 <= h <= 23 for d, h in got)


def test_mad_robust_scale_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem"
    ).fetchall()
    from collections import defaultdict

    by = defaultdict(list)
    for f, q in rows:
        by[f].append(q)

    def lower_median(xs):
        xs = sorted(xs)
        n = len(xs)
        cum = 0
        for v in xs:
            cum += 1
            if 2 * cum >= n:
                return v

    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["stat_mad_robust_scale"]
        .build(spark, sf_dir)
        .collect()
    }
    for f, xs in by.items():
        med = lower_median(xs)
        mad = lower_median([abs(x - med) for x in xs])
        r = got[f]
        assert r["n"] == len(xs)
        assert r["median_qty"] == med
        assert r["mad"] == mad
        assert abs(r["sigma_robust"] - mad * 1.4826) < 1e-3
