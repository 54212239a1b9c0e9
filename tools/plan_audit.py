#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan audit of the flagship (bench)
queries plus the heaviest non-bench operators — the ".explain and
iterate" evidence trail. For each audited key it extracts the plan
features that matter at 100 TB:

Reproducibility caveat: exchange counts — and, for keys whose plans
hit exchange/subquery REUSE (e.g. graph_pagerank, graph_kcore), the
broadcast/sort-merge split in the join-mix column — can differ by ±1
between runs: reuse depends on what the session planned earlier in
the same process, and a reused exchange can flip one join's build
side. Treat a one-count drift on an untouched row as run-order
noise, not a regression; pushdown, BNL-count, and scan columns are
stable.

- scan health: PushedFilters present? ReadSchema column count
  (column pruning) vs table width;
- join strategy mix (broadcast / sort-merge / hash / BNL);
- exchange (shuffle) count — the scale cost driver;
- whole-stage-codegen coverage (JVM hot path vs interpreted);
- AQE presence.

Run: python tools/plan_audit.py   (writes PLANS.md)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_cnc_spark.registry import load_all  # noqa: E402
from etl_cnc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Heavy representative non-bench keys worth auditing alongside bench set.
EXTRA_KEYS = [
    "join_broadcast",
    "join_bucketed",
    "join_range_binned",
    "scan_parquet_pruned",
    "dedup_minhash_relational",
    "pipeline_orders_mart",
    "pipeline_training_mix",
    "graph_pagerank",
    "sim_auto",
    "join_lateral",
    "join_fuzzy_blocked",
    "agg_sketch_cms",
    # range-partitioned prefix-rank rewrites (r2): verify no
    # unpartitioned window survives in any of these plans
    "events_concurrency",
    "events_pareto",
    "events_rfm",
    "sort_zorder",
    "sim_recall_report",
    # r4 additions (VERDICT r3 #4): the de-quadratic embedding dedup
    # (must show no data×data BNL), the prefix-sum packer, and a
    # second star-join representative
    "dedup_embedding",
    "pipeline_seq_pack",
    "tpch_q5",
    # r4 new-operator wave
    "pipeline_curate_e2e",
    "sim_ann_ivf_q8",
    "events_attribution",
    "events_conversion_paths",
    "events_resample_gapfill",
    "pipeline_curriculum",
    "embed_matryoshka_topk",
    "etl_k_anonymity",
    "orders_cohort_ltv",
    "events_bot_detection",
    "events_time_weighted_avg",
    "agg_linear_trend",
    "etl_fk_integrity",
    "graph_hierarchy_rollup",
    "events_capped_balance",
    "etl_skew_report",
    "orders_order_to_cash",
    "sample_weighted_deterministic",
    "sql_entry_window",
    # r5 new-operator wave: the PQ tier (BNLs must all be bounded
    # broadcasts), the derived-partsupp star joins, the bucket-blocked
    # interval join, and the explode-to-window rolling distinct
    "sim_ann_ivfpq",
    "tpch_q2",
    "tpch_q9",
    "join_interval_overlap",
    "dedup_incremental",
    "events_dau_mau",
    "pipeline_dataset_card",
    "events_ewma",
    "agg_weighted_percentile",
    "agg_kmv_distinct",
    "dedup_containment",
    "graph_bfs_distance",
    "join_asof_tolerance",
    # r5 retrieval/drift/spatial wave: BM25 + RRF fusion (bounded
    # top-N windows only after linear scoring stages), the bounded-
    # grid KS window, the integer-summed PSI, and the 3×3-cell
    # spatial join (no all-pairs BNL)
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
    # r5 wave 3: rank tests on the bounded value grid, sketch set-ops
    # (the three KMV sketches must plan as TakeOrderedAndProject),
    # the broadcast Bloom probe, multi-pass-blocked fuzzy matching,
    # survivorship's shared-shuffle windows, the recursive Holt fold,
    # and the corpus/embedding profile aggregates
    "stat_mann_whitney",
    "stat_jackknife_cv",
    "agg_kmv_setops",
    "agg_bloom_membership",
    "join_fuzzy_names",
    "etl_survivorship",
    "etl_benford",
    "events_autocorr",
    "events_changepoint",
    "events_holt",
    "text_vocab_growth",
    "text_token_entropy",
    "embed_norm_stats",
    "embed_centroid_inertia",
    "sql_entry_lateral",
    # r5 wave 4: the one-pass PIT window (must be ONE shuffle on
    # user_id), the recursive-CTE UnionLoop, the iterative k-core
    # semi-joins, the scan-pushed sampling estimate, and the
    # bounded-grid sequential-test windows
    "ml_point_in_time_features",
    "sql_entry_recursive",
    "graph_kcore",
    "join_cardinality_estimate",
    "events_ab_sequential",
    "events_forecast_backtest",
    "events_decay_counter",
    "win_gaps_islands",
    "agg_equidepth_histogram",
    "etl_dp_release",
    "stream_topk_windowed",
    "set_intersect_all",
    # financial-dedup / causal / graph-walk wave
    "orders_duplicate_payments",
    "events_diff_in_diff",
    "events_power_analysis",
    "events_mix_shift",
    "graph_random_walk",
    # closed-form inference / curation wave
    "stat_bootstrap_ci",
    "stat_linreg_multi",
    "stat_welch_ttest",
    "pipeline_preference_pairs",
    "text_tokenizer_fertility",
    # whitening / MIPS / robust-outlier / split wave
    "embed_whitening_stats",
    "sim_mips_transform",
    "events_anomaly_mad",
    "ml_train_test_split",
    # sketch / interval wave (stream_upsert_snapshot excluded: its
    # build executes a streaming job, not a single explainable plan)
    "agg_countmin_sketch",
    "events_interval_union",
    # model-evaluation wave
    "ml_confusion_metrics",
    "ml_roc_auc",
    "ml_calibration_bins",
    # audience / funnel / keyword wave
    "events_user_overlap",
    "events_funnel_constrained",
    "text_keyword_extract",
    # structured-text / BI wave
    "fn_structured_parse",
    "orders_yoy_growth",
    # iterative-fixpoint / binary-payload wave
    "events_markov_stationary",
    "multimodal_byte_entropy",
    # histogram / skyline wave
    "agg_hdr_histogram",
    "orders_skyline",
    # nearest-asof / rank-correlation wave
    "join_asof_nearest",
    "stat_spearman",
    "text_vocab_overlap",
    "events_rolling_slope",
    "events_volatility_band",
    # r6 wave: global-rank BI/ML keys (must show the prefix machine,
    # no unpartitioned data windows), the broadcast-scored Lloyd
    # step, bit-packed Hamming retrieval, bounded-grid tau/VaR, and
    # the one-aggregate KPI shapes
    "orders_abc_analysis",
    "orders_price_elasticity",
    "events_drawdown",
    "events_var_cvar",
    "ml_target_encoding",
    "ml_woe_iv",
    "ml_lift_gains",
    "ml_ndcg_eval",
    "text_gopher_rules",
    "text_word_burstiness",
    "embed_hamming_topk",
    "sim_kmeans_refine",
    "stat_kendall_tau",
    "stat_anova_oneway",
    "etl_cdc_net_changes",
    "dedup_recall_report",
    "orders_perfect_order",
    "events_burst_intervals",
    "fn_collation",
    "etl_l_diversity",
    "ml_auc_pr",
    "embed_gram_power_iter",
    "text_kn_lm_score",
    "ml_feature_hashing",
    "ml_mutual_info",
    "graph_modularity",
    "events_retention_halflife",
    "text_js_divergence",
    "stat_tost_equivalence",
    "orders_peak_exposure",
    "orders_repurchase_interval",
    "events_hysteresis_alerts",
    "dedup_cdc_chunks",
    "events_sax_symbolic",
    "multimodal_energy_segments",
    "ml_cohen_kappa",
    "orders_supplier_scorecard",
    "embed_expert_routing",
    "text_bpe_pair_counts",
    "pipeline_length_buckets",
    "stat_levene",
    "embed_hubness_stats",
    "dedup_threshold_sweep",
    "sql_entry_group_by_all",
    "events_weibull_fit",
    "stat_granger_causality",
    "ml_gbm_histogram",
    "graph_assortativity",
    "sim_rocchio_feedback",
    "text_readability",
    "stat_mann_kendall",
    "stat_runs_test",
    "events_holt_winters",
    "stat_friedman_test",
    "ml_class_weights",
    "stat_kruskal_wallis",
    # r7 completion wave (VERDICT r6 #6): every remaining TPC-H query
    # (the multi-join star/correlated shapes), the heavy dedup/ANN/
    # multimodal keys, ETL merge/SCD machinery, and the sequence/
    # funnel analytics — after this, the unaudited remainder is
    # single-operator contract keys (fn_*, simple scans/joins/aggs)
    # whose plans are one scan + at most one exchange.
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19",
    "tpch_q20", "tpch_q22",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_exact",
    "dedup_cluster", "dedup_contamination", "dedup_keep_best",
    "sim_ann_ivf", "sim_range_search", "embed_quantize",
    "ml_batch_inference", "multimodal_decode", "multimodal_framesample",
    "multimodal_dedup", "pipeline_shuffle_epoch", "pipeline_docs_clean",
    "text_fingerprint", "text_ngram_novelty", "text_chunk_windows",
    "graph_triangles", "graph_hierarchy_walk",
    "etl_merge_upsert", "etl_scd2", "etl_incremental_merge",
    "etl_table_diff", "etl_scd2_lookup", "etl_profile_columns",
    "sample_stratified", "sample_reservoir", "unpivot_melt",
    "events_funnel", "events_retention", "events_sessionize",
    "events_survival", "events_cusum", "orders_market_basket",
    "events_sequence_match",
    "pipeline_rag_corpus", "pipeline_mix_temperature", "text_repetition",
    # r7 new-operator waves: ECDF-distance grid folds (must show the
    # prefix machine, no data-sized windows), the naive-Bayes
    # two-pass train/score join, grid density clustering (bounded
    # neighbor equi-join + components loop), Zipf prefix-machine
    # ranks, the closed-form logistic step, and the bounded-bin
    # isotonic minimax
    "stat_wasserstein_1d", "stat_cvm_test", "stat_anderson_darling",
    "stat_cramers_v", "stat_cohens_d", "stat_page_hinkley",
    "stat_benjamini_hochberg", "ml_logreg_irls_step",
    "ml_target_encoding_cv", "ml_naive_bayes", "ml_isotonic_calibration",
    "text_zipf_fit", "text_hapax_stats", "orders_backlog_aging",
    "events_grid_cluster", "events_croston", "events_lorenz_curve",
    "stat_qq_table", "events_activity_histogram", "parts_slow_movers",
    "stat_tukey_hsd", "events_cohort_matrix", "text_burrows_delta",
    "orders_margin_waterfall", "orders_leadtime_bands",
    "sql_entry_pipe", "ml_knn_classifier",
    "stat_bartlett", "stat_mcnemar", "stat_partial_corr",
    "stat_durbin_watson", "orders_bullwhip", "orders_eoq_policy",
    "orders_xyz_analysis", "events_interrupted_ts",
    "events_peak_detection", "events_seasonality_strength",
    "text_simpson_diversity", "ml_linear_attribution",
    "graph_copurchase_components", "orders_kraljic_matrix",
    "events_fano_factor", "ml_drop_column_importance",
    "events_ljung_box", "stat_cooks_distance", "ml_pinball_loss",
    "ml_learning_curve",
    # r7 waves G/H/I: classical tests, sources, temporal/retrieval/
    # survival/inequality operators
    "stat_jarque_bera", "stat_grubbs", "stat_mood_median",
    "stat_cochran_q", "stat_proportions_ztest", "stat_odds_ratio",
    "source_orc", "source_binary_files", "events_allen_relations",
    "fn_edit_distance", "sim_mmr_diversify", "ml_conformal_interval",
    "events_kaplan_meier", "stat_hurst_rs", "stat_pacf",
    "stat_hodges_lehmann", "graph_label_propagation",
    "stat_theil_decomposition",
    "stream_rate_source", "stream_late_metrics",
    "text_contamination_check", "embed_mahalanobis_ood",
    "stat_wilcoxon_signed", "stat_box_cox", "sim_reciprocal_nn",
    "events_xmr_chart", "stat_capability",
    "agg_hll_sketch_union", "events_time_to_convert",
    "sql_entry_unpivot", "sql_entry_distribute_by",
    "etl_compact_small_files", "agg_listagg_ordered",
    "stat_gamma_fit_mom", "stat_negbin_fit_mom",
    "ml_oversample_interpolate", "stream_incremental_exactly_once",
    "fn_haversine", "orders_herfindahl",
    "pipeline_interleave_roundrobin", "agg_grouping_id",
    "win_session_window", "join_hint_shuffle_hash",
    "stat_winsorized_trimmed", "events_diurnal_weekly_profile",
    "orders_bland_altman", "orders_basket_size_distribution",
    "udtf_polymorphic", "sql_entry_parameterized",
    "sql_entry_cache_table", "stat_icc_variance_components",
    "stat_mad_robust_scale", "fn_try_cast",
    "sql_entry_filter_clause", "stat_cronbach_alpha",
    "agg_min_max_by", "text_compression_quality", "stat_periodogram",
    "ml_cluster_nmi",
]


def audit(plan: str, simple: str) -> dict[str, object]:
    # Executed AQE output repeats the whole tree under
    # "== Initial Plan ==". Count operators from the simple explain's
    # FINAL tree (one line per node); pull scan details (pushdown,
    # ReadSchema) from the formatted details section, keyed by the
    # node ids that appear in the formatted FINAL tree only.
    simple_final = simple.split("== Initial Plan ==")[0]
    plan_final_tree = plan.split("== Initial Plan ==")[0]
    final_ids = set(re.findall(r"\((\d+)\)", plan_final_tree))

    def n(name: str) -> int:
        return len(re.findall(rf"\b{name}\b", simple_final))

    # formatted details blocks: "(id) Scan parquet \n ... ReadSchema: ..."
    scans, pushed, read_cols = 0, 0, []
    for m in re.finditer(
        r"\((\d+)\) Scan parquet.*?ReadSchema: struct<([^>]*)>",
        plan,
        re.S,
    ):
        if m.group(1) not in final_ids:
            continue
        scans += 1
        block = m.group(0)
        if re.search(r"PushedFilters: \[(?!\])", block):
            pushed += 1
        read_cols.append(
            len(m.group(2).split(",")) if m.group(2) else 0
        )
    return {
        "scans": scans,
        "scans_with_pushdown": pushed,
        "read_cols": read_cols,
        "exchanges": n("Exchange"),
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "shj": n("ShuffledHashJoin"),
        "bnl": n("BroadcastNestedLoopJoin") + n("CartesianProduct"),
        # codegen spans only show in simple mode as `*(id)`
        "wscg": len(set(re.findall(r"\*\((\d+)\)", simple_final))),
        "aqe": "AdaptiveSparkPlan" in simple,
    }


def main() -> None:
    registry = load_all()
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    keys = sorted(
        {k for k, q in registry.items() if q.bench} | set(EXTRA_KEYS)
    )
    lines = [
        "# PLANS — physical-plan audit of flagship + heavy operators",
        "",
        f"Generated by `python tools/plan_audit.py` at {SF_DIR} "
        "(regenerate after plan-affecting changes; values are "
        "plan-shape, not timings, so they are host-stable — except "
        "exchange counts, which can drift ±1 on keys whose plans hit "
        "exchange/subquery reuse depending on session run order; "
        "treat such a one-count drift on an untouched row as noise).",
        "",
        "Columns: scans with predicate pushdown / total parquet scans; "
        "columns read per scan (pruning); shuffle exchanges; join "
        "strategies (broadcast-hash / sort-merge / shuffled-hash / "
        "nested-loop+cartesian); WholeStageCodegen span count; AQE.",
        "",
        "| key | pushdown | read cols | exchanges | BHJ/SMJ/SHJ/BNL | "
        "WSCG | AQE |",
        "|---|---|---|---|---|---|---|",
    ]
    for k in keys:
        df = registry[k].build(spark, SF_DIR)
        df.collect()  # finalize the AQE plan so codegen spans are visible
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            df.explain()
        a = audit(buf.getvalue(), buf2.getvalue())
        joins = f"{a['bhj']}/{a['smj']}/{a['shj']}/{a['bnl']}"
        lines.append(
            f"| `{k}` | {a['scans_with_pushdown']}/{a['scans']} "
            f"| {a['read_cols']} | {a['exchanges']} | {joins} "
            f"| {a['wscg']} | {'✓' if a['aqe'] else ''} |"
        )
    lines += [
        "",
        "Reading guide: the only BNL entries are the deliberate "
        "broadcast joins of a bounded query block / single-row totals "
        "(sim_* top-k, training-mix) — never data×data; `read cols` far below table width shows "
        "column pruning reaching the footer; exchange counts are the "
        "shuffle budget each query pays per run at any scale.",
        "",
    ]
    with open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md"),
        "w",
    ) as f:
        f.write("\n".join(lines))
    print(f"PLANS.md written ({len(keys)} keys audited)")


if __name__ == "__main__":
    main()
