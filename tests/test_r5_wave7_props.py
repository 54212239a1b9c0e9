"""Independent-recomputation properties for the seventh round-5 wave
(count-min sketch, interval union, streaming upsert snapshot)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_countmin_matches_python_sketch(spark, sf_dir):
    """Build the same 4x256 sketch with hashlib and replay the
    min-of-cells estimates; check the one-sided CMS guarantee."""
    con = duckdb.connect()
    keys = [
        r[0]
        for r in con.execute(
            f"SELECT l_partkey FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    ]
    counts = Counter(keys)
    cells: dict[tuple[int, int], int] = {}

    def bucket(j: int, k: int) -> int:
        return int(hashlib.md5(f"{j}_{k}".encode()).hexdigest()[:6], 16) % 256

    for k, c in counts.items():
        for j in range(4):
            cell = (j, bucket(j, k))
            cells[cell] = cells.get(cell, 0) + c
    out = REGISTRY["agg_countmin_sketch"].build(spark, sf_dir).collect()
    top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:20]
    assert {r["l_partkey"] for r in out} == {k for k, _ in top}
    n = len(keys)
    for r in out:
        k = r["l_partkey"]
        est = min(cells[(j, bucket(j, k))] for j in range(4))
        assert r["cms_estimate"] == est
        assert r["exact_cnt"] == counts[k]
        # one-sided: CMS never underestimates
        assert r["overestimate"] >= 0
        # CMS bound: overestimate <= e*N/w with high probability; allow
        # the loose deterministic 4x slack for a fixture-sized check
        assert r["overestimate"] <= 4 * 2.72 * n / 256


def test_interval_union_matches_python_sweep(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, epoch_us(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    ivs: dict[int, list[tuple[int, int, int]]] = {}
    HOLD = 300_000_000
    for uid, eid, s in rows:
        ivs.setdefault(uid, []).append((s, s + HOLD, eid))
    out = {r["user_id"]: r for r in
           REGISTRY["events_interval_union"].build(spark, sf_dir).collect()}
    assert set(out) == set(ivs)
    for uid, lst in ivs.items():
        lst.sort()
        merged: list[list[int]] = []
        for s, e, _ in lst:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        r = out[uid]
        assert r["n_intervals"] == len(merged)
        assert r["n_events"] == len(lst)
        assert r["covered_us"] == sum(e - s for s, e in merged)
        assert r["longest_us"] == max(e - s for s, e in merged)
        # union never exceeds the naive duration sum, never undercuts
        # the longest single interval
        assert r["covered_us"] <= len(lst) * HOLD
        assert r["covered_us"] >= HOLD


def test_upsert_snapshot_is_latest_per_user(spark, sf_dir):
    """The incremental merge must converge to the batch latest-per-
    user answer (recomputed in Python)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_id, event_type, value, epoch_us(ts) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    latest: dict[int, tuple] = {}
    for uid, eid, et, v, ts in rows:
        cur = latest.get(uid)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            latest[uid] = (ts, eid, et, v)
    agg: dict[str, list[float]] = {}
    for ts, eid, et, v in latest.values():
        import math

        cents = math.floor(v * 100 + 0.5)
        cur = agg.setdefault(et, [0, 0])
        cur[0] += 1
        cur[1] += cents
    out = REGISTRY["stream_upsert_snapshot"].build(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in out}
    assert set(got) == set(agg)
    for et, (n, cents) in agg.items():
        assert got[et]["n_users"] == n
        assert abs(got[et]["total_value"] - cents / 100.0) <= 1e-9
    # every user appears exactly once across types
    assert sum(r["n_users"] for r in out) == len(latest)
