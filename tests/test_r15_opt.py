"""Round-15 optimization-round plan pins (OPTIMIZATION_r15.md).

Each test freezes the STRUCTURAL property an r15 optimization bought,
so a regression is caught by shape, not by timing noise.
"""

from __future__ import annotations

from tests.test_plans import node_count, plan_of


def test_q21_single_fact_pass(spark, sf_dir):
    """r15: the late-row count folds into the per-order aggregate
    (``sum(count_if(late))``), so lineitem⋈orders runs ONCE — the old
    join-back replayed the fact join (two lineitem + two orders scans).
    One scan per table, and no join of two data-scaled sides remains
    (the only join left is per-order stats ⋈ broadcast supplier)."""
    plan = plan_of("tpch_q21", spark, sf_dir)
    scans = [
        line
        for line in plan.splitlines()
        if line.lstrip().startswith("(") and "Scan parquet" in line
    ]
    assert len(scans) == 3, plan  # lineitem, orders, supplier — once each
    # the distinct-count rewrite from r12 must survive too
    assert node_count(plan, "Expand") == 0, plan


def test_cindex_single_fact_scan(spark, sf_dir):
    """r15: the (t, s) cell grid is persist()ed — its three consumers
    (dt spine, ds spine, dense left join) share one events scan + one
    per-user aggregate instead of replaying the fact lineage 3x."""
    plan = plan_of("ml_survival_cindex", spark, sf_dir)
    assert node_count(plan, "Scan parquet") == 1, plan
    assert "InMemoryRelation" in plan, plan


def test_spread_scan_small_file_repartitions(spark, sf_dir):
    """r15: a byte-small scan feeding a compute-dense fold is spread
    to the session's shuffle parallelism with a PINNED partition count
    (a bare repartition(col) is AQE-coalescible and measured useless)."""
    from etl_cnc_spark.catalog import table
    from etl_cnc_spark.utils import spread_scan

    e = table(spark, sf_dir, "embeddings")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = spread_scan(e, sf_dir, "embeddings", "vec_id")
    assert out.rdd.getNumPartitions() == parts


def test_spread_scan_big_file_noop(spark, sf_dir):
    """r15: once the file plans >= shuffle.partitions scan splits the
    helper returns the frame UNCHANGED — at production scale no extra
    shuffle is ever paid (simulated by shrinking maxPartitionBytes so
    the fixture file counts as 'big')."""
    from etl_cnc_spark.catalog import table
    from etl_cnc_spark.utils import spread_scan

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        e = table(spark, sf_dir, "embeddings")
        out = spread_scan(e, sf_dir, "embeddings", "vec_id")
        assert out is e
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_spread_scan_size_parser():
    from etl_cnc_spark.utils import _size_bytes

    assert _size_bytes("134217728b") == 128 << 20
    assert _size_bytes("128m") == 128 << 20
    assert _size_bytes("128MB") == 128 << 20
    assert _size_bytes("1g") == 1 << 30
    assert _size_bytes("4096") == 4096


def test_topk_exact_fold_is_spread(spark, sf_dir):
    """r15: sim_topk_exact's candidate side carries the spread-scan
    exchange, so the Q·N·d fold no longer runs on one byte-sized
    scan split."""
    plan = plan_of("sim_topk_exact", spark, sf_dir)
    assert "hashpartitioning(vec_id" in plan, plan


def test_rfm_melts_with_one_generate(spark, sf_dir):
    """r15: the metric melt is ONE explode of a 3-struct array (a
    single Generate node over one cache read), not a 3-way union of
    per-metric selects that tripled the rollup lineage in the plan."""
    plan = plan_of("events_rfm", spark, sf_dir)
    assert node_count(plan, "Generate") == 1, plan
    assert node_count(plan, "Union") == 0, plan


def test_global_ordered_direct_call_leaks_no_cache(spark, sf_dir):
    """r15: global_ordered persists its bucketed frame ONLY inside a
    registered build (where the release wrapper reclaims it) — a
    direct call has no release point, so persisting there would leave
    a CacheManager entry for the session's lifetime and break the r14
    release invariant for every later key."""
    from pyspark.sql import functions as F

    from etl_cnc_spark.operators.prefix import global_ordered
    from etl_cnc_spark.registry import REGISTRY

    before_empty = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    df = spark.range(50).select(F.col("id").alias("k"))
    global_ordered(df, [F.col("k")], bucket_key="k").collect()
    if before_empty:
        assert (
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        ), "direct global_ordered call must not register a cache entry"
    # inside a registered build the persist IS taken and released at
    # the next key's top-level build (the r14 invariant end-to-end)
    REGISTRY["topk_global"].build(spark, sf_dir).collect()
    REGISTRY["agg_global"].build(spark, sf_dir).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_minhash_estimate_single_join(spark, sf_dir):
    """r15: est_jaccard comes straight from the bucket join's per-pair
    row count — the old distinct + two re-joins against the signature
    table are gone, so exactly ONE join remains in the plan."""
    plan = plan_of("dedup_minhash_relational", spark, sf_dir)
    joins = sum(
        node_count(plan, n)
        for n in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
    )
    assert joins == 1, plan


def test_wasserstein_cached_grid_single_scan(spark, sf_dir):
    """r15: the cents grid and the cumulative frame are persist()ed
    (not lazily checkpointed) — consumers share one computation
    without the RDD materialization barrier, and the single events
    scan stays visible to plan audits."""
    plan = plan_of("stat_wasserstein_1d", spark, sf_dir)
    assert node_count(plan, "Scan parquet") == 1, plan
    assert "InMemoryRelation" in plan, plan


def test_cluster_edges_symmetrize_without_union(spark, sf_dir):
    """r15: the symmetric edge frames are one explode over the pair
    frame — the 2-way union consumed `pairs` twice and re-executed
    the whole candidate chain (bucket join + md5 estimate aggregate)
    per run (two identical heavy stages in the profile)."""
    for key in ("text_near_dup_cluster", "dedup_cluster"):
        plan = plan_of(key, spark, sf_dir)
        assert node_count(plan, "Union") == 0, (key, plan)
