"""Properties for the round-7 wave-N keys: HLL sketch accuracy +
mergeability gates, and conversion latency re-derived in Python."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_hll_estimate_within_bound_and_merge_consistent(spark, sf_dir):
    exacts = dict(
        _con(sf_dir).execute(
            "SELECT l_returnflag, count(DISTINCT l_orderkey)"
            " FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    exact_global = _con(sf_dir).execute(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()[0]
    rows = REGISTRY["agg_hll_sketch_union"].build(spark, sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(exacts)
    for r in rows:
        assert r["exact_flag"] == exacts[r["l_returnflag"]]
        assert abs(r["est_flag"] - r["exact_flag"]) <= 0.02 * r["exact_flag"]
        assert r["exact_global"] == exact_global
        assert (
            abs(r["est_global"] - exact_global) <= 0.02 * exact_global
        )
        assert r["rel_err"] <= 0.02
    # mergeability: the union of partial sketches estimates within
    # 1% of the single-pass sketch (DataSketches HLL union can lose
    # a little register precision, so exact equality is not promised)
    from pyspark.sql import functions as F
    from etl_cnc_spark.catalog import table

    li = table(spark, sf_dir, "lineitem")
    single = li.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").alias("e")
    ).collect()[0]["e"]
    assert abs(rows[0]["est_global"] - int(single)) <= 0.01 * int(single)


def test_time_to_convert_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT user_id, event_type, epoch_us(ts) FROM events"
        " WHERE event_type IN ('signup', 'purchase')"
    ).fetchall()
    first_signup: dict[int, int] = {}
    purchases = defaultdict(list)
    for u, et, ts in rows:
        if et == "signup":
            first_signup[u] = min(first_signup.get(u, ts), ts)
        else:
            purchases[u].append(ts)
    deltas = {}
    for u, s in first_signup.items():
        after = [p for p in purchases.get(u, []) if p >= s]
        if after:
            deltas[u] = min(after) - s
    buckets = Counter(d // (3600000000 * 6) for d in deltas.values())
    got = {
        r["bucket_6h"]: r
        for r in REGISTRY["events_time_to_convert"]
        .build(spark, sf_dir)
        .collect()
    }
    assert {k: v["n_users"] for k, v in got.items()} == dict(buckets)
    for r in got.values():
        assert r["n_signup"] == len(first_signup)
        assert r["n_conv"] == len(deltas)
        assert (
            abs(r["conversion_rate"] - len(deltas) / len(first_signup))
            < 1e-4
        )
