"""Properties for the round-7 wave-S keys (grouping_id rollup labels,
batch session_window) re-derived with plain Python."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_grouping_id_levels_consistent(spark, sf_dir):
    rows = REGISTRY["agg_grouping_id"].build(spark, sf_dir).collect()
    by_gid = defaultdict(list)
    for r in rows:
        by_gid[r["gid"]].append(r)
    # gid 0 = detail, 1 = per-flag subtotal, 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    total = by_gid[3][0]
    assert len(by_gid[3]) == 1
    assert total["l_returnflag"] is None and total["l_linestatus"] is None
    assert sum(r["n"] for r in by_gid[0]) == total["n"]
    assert sum(r["qty"] for r in by_gid[0]) == total["qty"]
    sub = {r["l_returnflag"]: r for r in by_gid[1]}
    for flag, r in sub.items():
        details = [d for d in by_gid[0] if d["l_returnflag"] == flag]
        assert sum(d["n"] for d in details) == r["n"]
        assert sum(d["qty"] for d in details) == r["qty"]
    want = dict(
        _con(sf_dir).execute(
            "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert {f: r["n"] for f, r in sub.items()} == want


def test_session_window_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, epoch_us(ts) FROM events ORDER BY user_id, 2"
    ).fetchall()
    by = defaultdict(list)
    for u, t in rows:
        by[u].append(t)
    want = {}
    for u, ts in by.items():
        sizes = []
        cur = 1
        for a, b in zip(ts, ts[1:]):
            if b - a > 1800000000:
                sizes.append(cur)
                cur = 1
            else:
                cur += 1
        sizes.append(cur)
        want[u] = (len(sizes), max(sizes), sum(sizes))
    got = {
        r["user_id"]: (r["n_sessions"], r["max_events"], r["total_events"])
        for r in REGISTRY["win_session_window"].build(spark, sf_dir).collect()
    }
    assert got == want
