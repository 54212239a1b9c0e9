"""Independent-recomputation properties for the round-5 operators:
each clever distributed rewrite (prefix-sum EWMA, explode-window
rolling distinct, cumulative-weight percentiles, unrolled BFS) is
cross-checked against a plain sequential Python fold of the SAME
inputs — the oracle proves Spark↔DuckDB agreement; these prove the
shared formulation means what it claims."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from etl_cnc_spark.catalog import table
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_ewma_matches_sequential_recurrence(spark, sf_dir):
    """The prefix-sum closed form must equal the literal
    s_t = α·x_t + (1−α)·s_{t−1} fold over the dense daily series."""
    from etl_cnc_spark.operators.analytics import EWMA_ALPHA

    rows = REGISTRY["events_ewma"].build(spark, sf_dir).collect()
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r["event_type"]][r["day_n"]] = r
    for etype, days in by_type.items():
        s = None
        for day_n in sorted(days):
            x = float(days[day_n]["n"])
            s = x if s is None else EWMA_ALPHA * x + (1 - EWMA_ALPHA) * s
            got = days[day_n]["ewma"]
            assert abs(got - s) <= 1e-3 + 1e-6 * abs(s), (
                f"{etype} day {day_n}: closed-form {got} vs recurrence {s}"
            )


def test_dau_mau_matches_set_recount(spark, sf_dir):
    """Rolling distinct actives must equal literal set counts over
    the trailing 1/7/30-day windows of (user, day) activity."""
    act = {
        (r["d"], r["user_id"])
        for r in table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .collect()
    }
    days = {d for d, _ in act}
    epoch = min(days)
    rows = REGISTRY["events_dau_mau"].build(spark, sf_dir).collect()
    assert len(rows) == len(days)
    for r in rows:
        import datetime

        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=r["day_n"])
        for col, span in (("dau", 1), ("wau", 7), ("mau", 30)):
            expect = len(
                {
                    u
                    for (ad, u) in act
                    if 0 <= (d - ad).days < span
                }
            )
            assert r[col] == expect, f"{d} {col}: {r[col]} vs {expect}"
        assert r["wau"] >= r["dau"] and r["mau"] >= r["wau"]


def test_weighted_percentile_matches_python_fold(spark, sf_dir):
    """wp50 must be the first value whose cumulative weight reaches
    half the total, recomputed by a sorted sequential scan."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("v"),
            F.floor(F.col("l_quantity") + 0.5).cast("long").alias("w"),
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append((r["v"], r["w"]))
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_weighted_percentile"].build(spark, sf_dir).collect()
    }
    for flag, pairs in groups.items():
        pairs.sort()
        tw = sum(w for _, w in pairs)
        for col, num, den in (
            ("wp25_cents", 1, 4),
            ("wp50_cents", 1, 2),
            ("wp75_cents", 3, 4),
        ):
            cw = 0
            expect = None
            for v, w in pairs:
                cw += w
                if den * cw >= num * tw:
                    expect = v
                    break
            assert rows[flag][col] == expect, f"{flag} {col}"
        assert rows[flag]["total_weight"] == tw


def test_bfs_matches_python_bfs(spark, sf_dir):
    """Unrolled-plan BFS distances must equal a queue BFS over the
    same sparsified edge set."""
    from etl_cnc_spark.operators.graph import BFS_ROUNDS, BFS_SRC, BFS_TOPK

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    edges_w = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    by_u = defaultdict(list)
    for r in edges_w:
        by_u[r["u"]].append((-r["w"], r["v"]))
    adj = {
        u: [v for _, v in sorted(lst)[:BFS_TOPK]] for u, lst in by_u.items()
    }
    dist = {BFS_SRC: 0}
    frontier = [BFS_SRC]
    for depth in range(1, BFS_ROUNDS + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = depth
                    nxt.append(v)
        frontier = nxt
    got = {
        r["v"]: r["dist"]
        for r in REGISTRY["graph_bfs_distance"].build(spark, sf_dir).collect()
    }
    assert got == dist


def test_incremental_dedup_statuses_partition_batch(spark, sf_dir):
    """Every batch doc gets exactly one status; canonical_id is set
    iff the doc is a duplicate, and corpus dups point OUTSIDE the
    batch while batch dups point at an earlier batch doc."""
    rows = REGISTRY["dedup_incremental"].build(spark, sf_dir).collect()
    n_batch = (
        table(spark, sf_dir, "documents").where(F.col("doc_id") % 3 == 0).count()
    )
    assert len(rows) == n_batch
    for r in rows:
        assert r["status"] in ("dup_of_corpus", "dup_in_batch", "new")
        if r["status"] == "new":
            assert r["canonical_id"] is None
        elif r["status"] == "dup_in_batch":
            assert r["canonical_id"] is not None
            assert r["canonical_id"] % 3 == 0 and r["canonical_id"] < r["doc_id"]
        else:
            assert r["canonical_id"] is not None
            assert r["canonical_id"] % 3 != 0


def test_kmv_error_within_sketch_bound(spark, sf_dir):
    """KMV relative error is ~1/sqrt(k); assert a generous 3× that,
    and exactness whenever the group is smaller than k."""
    from etl_cnc_spark.operators.aggregates import KMV_K

    for r in REGISTRY["agg_kmv_distinct"].build(spark, sf_dir).collect():
        if r["n_exact"] < KMV_K:
            assert r["est_kmv"] == float(r["n_exact"])
        else:
            rel = abs(r["est_kmv"] - r["n_exact"]) / r["n_exact"]
            assert rel <= 3.0 / (KMV_K ** 0.5), (
                f"{r['event_type']}: rel err {rel:.3f}"
            )
