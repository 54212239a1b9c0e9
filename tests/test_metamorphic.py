"""Metamorphic invariants (SURVEY.md §5): results must be invariant
to physical execution layout — partition count, input split size,
and therefore partial-aggregation order. This is the local proxy for
the 100 TB claim in SCALE.md: a 1000-executor cluster is "just" a
different partitioning, so any key that changes its answer under
repartitioning here is broken at scale by construction.
"""

from __future__ import annotations

import pytest

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

# Keys whose outputs are designed partition-order-exact (integer-cent
# money, deterministic tie-breaks, content-hash sampling).
INVARIANT_KEYS = [
    "agg_groupby",
    "join_inner",
    "join_multiway",
    "win_ranking",
    "dedup_exact",
    "sample_deterministic",
    "pipeline_docs_clean",
    "etl_merge_upsert",
    "sim_topk_exact",
    # r4: the keys whose machinery is MOST at risk of partition
    # dependence — prefix-rank melts, iterative closures, grouped
    # sequential folds, blocked candidate joins
    "events_rfm",
    "pipeline_seq_pack",
    "pipeline_curriculum",
    "dedup_cluster",
    "graph_hierarchy_walk",
    "graph_hierarchy_rollup",
    "events_capped_balance",
    "dedup_embedding",
    "events_attribution",
    "pipeline_curate_e2e",
    # r5: the new machinery most at risk of partition dependence —
    # the capped-centroid lazy count, PQ encode/reconstruct windows,
    # the EWMA prefix-sum rewrite, weighted cumulative crossings,
    # rolling-distinct explode, and the derived-partsupp aggregate
    "sim_ann_ivfpq",
    "events_ewma",
    "agg_weighted_percentile",
    "events_dau_mau",
    "dedup_incremental",
    "tpch_q9",
    "join_interval_overlap",
    # r5 retrieval/drift/spatial wave: fixed-slot float sums (BM25),
    # two-list fusion, bounded-grid ECDF, fixed-point PSI sums, and
    # the 9-cell replicated join — all designed order-exact
    "text_bm25",
    "sim_hybrid_rrf",
    "stat_ks_test",
    "stat_psi_drift",
    "join_spatial_grid",
    "dedup_substring_spans",
    "sim_topk_diverse",
    "stat_chi2_test",
    "stream_drift_monitor",
    "events_seasonal_decompose",
    "events_theil_sen",
    "graph_link_features",
    # r5 wave 3: fixed-point moment sums (jackknife/entropy/decay),
    # bounded-grid midranks, top-k-by-hash sketches, the sequential
    # Holt fold, iterative k-core peel, and the one-pass PIT window —
    # again the machinery most at risk of partition dependence
    "stat_mann_whitney",
    "stat_jackknife_cv",
    "agg_kmv_setops",
    "agg_bloom_membership",
    "events_holt",
    "events_decay_counter",
    "graph_kcore",
    "ml_point_in_time_features",
    "text_token_entropy",
    "text_vocab_growth",
    "embed_centroid_inertia",
    "win_gaps_islands",
    "sql_entry_recursive",
    # r5 closing waves: hash-derived Poisson weights + quantized
    # order statistics, exact sufficient-statistic solves, integer
    # sketch cells, running-max interval sweeps, the two-level AUC
    # prefix, fold-based MIPS ranking, and packed-score argmax —
    # every one claims order-exactness by construction; prove it
    "stat_bootstrap_ci",
    "stat_linreg_multi",
    "stat_welch_ttest",
    "agg_countmin_sketch",
    "events_interval_union",
    "ml_roc_auc",
    "ml_confusion_metrics",
    "sim_mips_transform",
    "pipeline_preference_pairs",
    "ml_train_test_split",
    "events_user_overlap",
    "text_keyword_extract",
    "embed_whitening_stats",
]


def _rows(df):
    cols = sorted(df.columns)
    out = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(out, key=repr)


@pytest.mark.parametrize("key", INVARIANT_KEYS)
def test_result_invariant_to_partitioning(key, spark, sf_dir):
    conf = spark.conf
    old_shuffle = conf.get("spark.sql.shuffle.partitions")
    old_split = conf.get("spark.sql.files.maxPartitionBytes")
    build = REGISTRY[key].build
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        conf.set("spark.sql.files.maxPartitionBytes", "65536")  # many tiny splits
        a = _rows(build(spark, sf_dir))
        conf.set("spark.sql.shuffle.partitions", "32")
        conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        b = _rows(build(spark, sf_dir))
    finally:
        conf.set("spark.sql.shuffle.partitions", old_shuffle)
        conf.set("spark.sql.files.maxPartitionBytes", old_split)
    assert len(a) == len(b), f"{key}: row count changed with partitioning"
    assert a == b, f"{key}: values changed with partitioning"
