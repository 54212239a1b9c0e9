"""Independent-recomputation properties for the ninth round-5 wave
(audience overlap, time-constrained funnel, keyword extraction)."""

from __future__ import annotations

from collections import Counter

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_user_overlap_matches_python_sets(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT event_type, user_id FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    sets: dict[str, set[int]] = {}
    for et, uid in rows:
        sets.setdefault(et, set()).add(uid)
    out = REGISTRY["events_user_overlap"].build(spark, sf_dir).collect()
    types = sorted(sets)
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1:]
        if sets[a] & sets[b]
    }
    got = {(r["type_a"], r["type_b"]): r for r in out}
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert r["n_a"] == len(sets[a]) and r["n_b"] == len(sets[b])
        assert r["n_both"] == inter
        assert abs(r["jaccard"] - inter / union) <= 1e-3
        assert abs(r["containment"] - inter / min(len(sets[a]), len(sets[b]))) <= 1e-3
        # containment dominates jaccard by definition
        assert r["containment"] >= r["jaccard"] - 1e-9


def test_constrained_funnel_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, epoch_us(ts) "
        f"FROM '{sf_dir}/events.parquet' "
        f"WHERE event_type IN ('view', 'click', 'purchase')"
    ).fetchall()
    by_user: dict[int, dict[str, list[int]]] = {}
    for uid, et, t in rows:
        by_user.setdefault(uid, {}).setdefault(et, []).append(t)
    H1, D1 = 3_600_000_000, 86_400_000_000
    n_view = n_click = n_buy = 0
    for uid, evs in by_user.items():
        if "view" not in evs:
            continue
        n_view += 1
        tv = min(evs["view"])
        clicks = [t for t in evs.get("click", []) if tv < t <= tv + H1]
        if not clicks:
            continue
        n_click += 1
        tc = min(clicks)
        buys = [t for t in evs.get("purchase", []) if tc < t <= tc + D1]
        if buys:
            n_buy += 1
    r = REGISTRY["events_funnel_constrained"].build(spark, sf_dir).collect()[0]
    assert r["n_view"] == n_view
    assert r["n_click_1h"] == n_click
    assert r["n_buy_24h"] == n_buy
    # the constrained funnel can never beat the unconstrained one
    u = {row["user_id"]: row
         for row in REGISTRY["events_funnel"].build(spark, sf_dir).collect()}
    assert n_view == len(u)
    assert n_click <= sum(1 for row in u.values() if row["click_us"] is not None)


def test_keyword_extract_matches_python(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    tf: dict[int, Counter] = {}
    df: Counter = Counter()
    for did, text in rows:
        c = Counter(text.split(" "))
        tf[did] = c
        df.update(c.keys())
    out = REGISTRY["text_keyword_extract"].build(spark, sf_dir).collect()
    got: dict[int, list] = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r)
    assert set(got) == {d for d in tf if d % 20 == 0}
    for did, rs in got.items():
        ranked = sorted(
            ((-(c / df[t]), t) for t, c in tf[did].items()),
        )[:3]
        rs.sort(key=lambda r: r["rank"])
        assert [r["tok"] for r in rs] == [t for _, t in ranked]
        for r in rs:
            assert r["tf"] == tf[did][r["tok"]]
            assert r["df"] == df[r["tok"]]
            assert abs(r["score"] - r["tf"] / r["df"]) <= 1e-3
