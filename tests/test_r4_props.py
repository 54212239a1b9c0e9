"""Invariant tests for the round-4 operators — the structural laws
the DuckDB hash can't state (monotone funnels, partitions, conserved
totals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_cnc_spark.catalog import table
from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_curate_funnel_is_monotone(spark, sf_dir):
    """Each curation stage can only shrink the corpus, per group and
    in total; token mass only counts clean docs."""
    rows = REGISTRY["pipeline_curate_e2e"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_raw"] >= r["n_quality"] >= r["n_unique"] >= r["n_clean"]
        assert (r["tokens_clean"] > 0) == (r["n_clean"] > 0)
    d = table(spark, sf_dir, "documents")
    n_train = d.where(F.col("doc_id") % 20 != 7).count()
    assert sum(r["n_raw"] for r in rows) == n_train


def test_curriculum_phases_partition_corpus(spark, sf_dir):
    """Phases 1..N cover every document exactly once with balanced
    sizes (±1) and non-overlapping, increasing difficulty ranges."""
    rows = sorted(
        REGISTRY["pipeline_curriculum"].build(spark, sf_dir).collect(),
        key=lambda r: r["phase"],
    )
    total = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a["max_difficulty"] <= b["min_difficulty"]


def test_cohort_ltv_cumulative_consistency(spark, sf_dir):
    """Per cohort: the cumulative curve is non-decreasing in age and
    its final value equals the cohort's summed cell revenue."""
    rows = REGISTRY["orders_cohort_ltv"].build(spark, sf_dir).collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_ym"], []).append(r)
    assert by_cohort
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r["age_months"])
        run = 0
        for c in cells:
            run += c["revenue_cents"]
            assert c["cum_revenue_cents"] == run


def test_k_anonymity_no_small_identified_groups(spark, sf_dir):
    """After generalization, every NON-masked quasi-identifier
    combination appearing in the release must hide ≥ K rows, and
    every row keeps exactly one ladder level."""
    from etl_cnc_spark.operators.etl import K_ANON

    df = REGISTRY["etl_k_anonymity"].build(spark, sf_dir)
    rows = df.collect()
    # per-row ladder consistency (holds at every SF, even when the
    # corpus is so small that everything is fully masked)
    for r in rows:
        if r["generalization_level"] == 0:
            assert r["group_n"] >= K_ANON
            assert r["nation_qi"] != "*" and r["segment_qi"] != "*"
        elif r["generalization_level"] == 1:
            assert r["group_n"] >= K_ANON
            assert r["nation_qi"] != "*" and r["segment_qi"] == "*"
        else:
            assert r["group_n"] == 0
            assert r["nation_qi"] == "*" and r["segment_qi"] == "*"
    # released (non-masked) QI combinations must each hide >= K rows
    released = (
        df.where(F.col("generalization_level") < 2)
        .groupBy("nation_qi", "segment_qi")
        .count()
        .collect()
    )
    for r in released:
        assert r["count"] >= K_ANON, (r["nation_qi"], r["segment_qi"])
    assert len(rows) == table(spark, sf_dir, "customer").count()


def test_resample_gapfill_conserves_counts(spark, sf_dir):
    """The dense grid must be complete (|days|×|types| rows) and
    zero-fill must not invent or lose events."""
    df = REGISTRY["events_resample_gapfill"].build(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    n_types = e.select("event_type").distinct().count()
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    ).first()
    n_days = (bounds["d1"] - bounds["d0"]).days + 1
    assert df.count() == n_days * n_types
    assert (
        df.agg(F.sum("n")).first()[0] == e.count()
    ), "gap-fill changed the event total"


def test_twap_bounded_by_min_max_value(spark, sf_dir):
    """A time-weighted average must lie within the user's observed
    value range (cents)."""
    rows = REGISTRY["events_time_weighted_avg"].build(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    rng = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in e.groupBy("user_id")
        .agg(
            F.min(F.floor(F.col("value") * 100 + 0.5)).alias("lo"),
            F.max(F.floor(F.col("value") * 100 + 0.5)).alias("hi"),
        )
        .collect()
    }
    assert rows
    for r in rows:
        lo, hi = rng[r["user_id"]]
        assert lo / 100 - 0.01 <= r["twap"] <= hi / 100 + 0.01


def test_near_dup_clusters_contain_their_edges(spark, sf_dir):
    """Every candidate pair above the threshold must land in the SAME
    cluster (transitivity actually closed), and cluster ids are the
    component minima."""
    from etl_cnc_spark.llm.dedup import NEARDUP_TAU

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in REGISTRY["text_near_dup_cluster"].build(spark, sf_dir).collect()
    }
    pairs = (
        REGISTRY["dedup_minhash_relational"]
        .build(spark, sf_dir)
        .where(F.col("est_jaccard") >= NEARDUP_TAU)
        .collect()
    )
    assert pairs
    for p in pairs:
        assert labels[p["doc_a"]] == labels[p["doc_b"]]
    for doc, lab in labels.items():
        assert lab <= doc
        assert labels[lab] == lab, "cluster representative must be its own root"


def test_hierarchy_depths_are_consistent(spark, sf_dir):
    """depth(child) == depth(parent) + 1 for every edge, exactly one
    root at depth 0, every part present."""
    rows = REGISTRY["graph_hierarchy_walk"].build(spark, sf_dir).collect()
    depth = {r["p_partkey"]: r["depth"] for r in rows}
    roots = [r for r in rows if r["parent_key"] is None]
    assert len(roots) == 1 and roots[0]["depth"] == 0
    for r in rows:
        if r["parent_key"] is not None:
            assert r["depth"] == depth[r["parent_key"]] + 1, r
    assert len(rows) == table(spark, sf_dir, "part").count()


def test_hierarchy_rollup_conserves_mass(spark, sf_dir):
    """The root's subtree equals the whole table's cents and
    descendant count; every subtree is at least its own node."""
    rows = REGISTRY["graph_hierarchy_rollup"].build(spark, sf_dir).collect()
    p = table(spark, sf_dir, "part")
    total_cents = p.agg(
        F.sum(F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long"))
    ).first()[0]
    n = p.count()
    root = next(r for r in rows if r["p_partkey"] == 1)
    assert root["n_descendants"] == n - 1
    assert root["subtree_cents"] == total_cents
    for r in rows:
        assert r["n_descendants"] >= 0 and r["subtree_cents"] > 0


def test_capped_balance_stays_in_bounds(spark, sf_dir):
    """Every balance is ≥ 0, and equals the plain (unclamped) running
    sum whenever that sum never went negative for the user."""
    rows = REGISTRY["events_capped_balance"].build(spark, sf_dir).collect()
    assert rows and all(r["balance_after"] >= 0 for r in rows)
    assert len(rows) == table(spark, sf_dir, "events").count()
