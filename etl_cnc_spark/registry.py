"""Query registry — the single source of truth for the operator
inventory (SURVEY.md §2).

Every operator module registers its queries here with the
``@register`` decorator; ``__spark_entry__.py`` exposes the registry
to the driver as ``queries()`` / ``oracle_sql()``.

Checks (SURVEY.md §5):
- ``check="hash"``: a DuckDB oracle SQL string exists; the driver
  hash-compares values (order-insensitive, columns sorted by name).
- ``check="rows"``: no oracle (non-SQL-expressible op); the driver
  records a weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: BuildFn
    oracle: str | None = None
    check: str = "hash"  # "hash" | "rows"
    notes: str = ""
    bench: bool = False  # part of the flagship bench set (BASELINE.md)


REGISTRY: dict[str, QueryDef] = {}

# The driver's correctness sweep checks a bounded prefix of the
# registry (first 50 keys), so ordering is evidence.  Rounds 1-4
# accumulated 197 distinct driver-checked keys (193 hash-green, 3
# rows-only by design, 1 red).  DRIVER_WINDOW r5 = the red key
# (embed_quantize, re-verify after its q8 array->string fix) plus the
# next 49 never-driver-checked keys in registry order (the round-4
# operator wave: curation/attribution/paths/hierarchy/q8-IVF/
# matryoshka, the fn_* long tail, the text_* tail).  Remainder after
# the r5 sweep: 52 never-checked keys — the 7 r4 leftovers
# (pipeline_rag_corpus, pipeline_mix_temperature, text_repetition,
# pipeline_curriculum, multimodal_framesample, sql_entry_agg,
# sql_entry_window), the 30 keys from r5's first waves (TPC-H
# completion, interval/asof-tolerance joins, incremental/containment
# dedup, KMV/weighted-percentile, BFS, dataset card, IVF-PQ, DPP,
# BM25/RRF retrieval, KS/PSI/chi2 drift, spatial grid, span dedup,
# diverse top-k, drift monitor, seasonal/Theil-Sen, link features),
# and the 15 keys from r5 wave 3 (stat_mann_whitney,
# stat_jackknife_cv, etl_benford, agg_kmv_setops,
# agg_bloom_membership, events_autocorr, events_changepoint,
# events_holt, join_fuzzy_names, etl_survivorship, sql_entry_lateral,
# text_vocab_growth, text_token_entropy, embed_norm_stats,
# embed_centroid_inertia).  Wave 4+ added 17 more
# (win_gaps_islands, graph_kcore, events_decay_counter,
# ml_point_in_time_features, sql_entry_recursive,
# stream_topk_windowed, etl_dp_release, agg_equidepth_histogram,
# events_ab_sequential, events_forecast_backtest, set_intersect_all,
# join_cardinality_estimate, orders_duplicate_payments,
# events_diff_in_diff, events_power_analysis, events_mix_shift,
# graph_random_walk), and the closing waves added 18 more (stat_
# bootstrap_ci/linreg_multi/welch_ttest, pipeline_preference_pairs,
# text_tokenizer_fertility, embed_whitening_stats,
# sim_mips_transform, events_anomaly_mad, ml_train_test_split,
# agg_countmin_sketch, events_interval_union,
# stream_upsert_snapshot, ml_confusion_metrics/roc_auc/
# calibration_bins, events_user_overlap, events_funnel_constrained,
# text_keyword_extract), then fn_structured_parse,
# orders_yoy_growth, events_markov_stationary, and
# multimodal_byte_entropy, agg_hdr_histogram, orders_skyline,
# join_asof_nearest, stat_spearman, text_vocab_overlap,
# events_rolling_slope, and events_volatility_band.
# State at end of r5: 346 registered, 197 driver-checked, 149
# never-checked; the r5 sweep (this window) covers 50, leaving 99.
# Plan: r6 window = first 50 in registry order
# (`python tools/next_window.py` prints them), r7 window = the
# remaining 49 plus re-verify slots.  Run `python tools/preflight.py`
# before rotating (catches driver-canonicalization traps).
DRIVER_WINDOW: list[str] = [
    # re-verify after the q8 array-column -> comma-joined-string fix
    # (r4's only red row: the driver's canonicalizer cannot
    # factorize numpy array cells)
    "embed_quantize",
    # round-3/4 operators never yet driver-attested
    "lakehouse_manifest_snapshot", "agg_approx_quantile", "agg_hll_merge",
    "etl_k_anonymity", "orders_cohort_ltv", "etl_fk_integrity",
    "etl_skew_report", "orders_order_to_cash",
    "sample_weighted_deterministic", "events_attribution",
    "events_resample_gapfill", "events_conversion_paths",
    "events_bot_detection", "events_time_weighted_avg",
    "events_capped_balance", "agg_linear_trend", "graph_hierarchy_walk",
    "graph_hierarchy_rollup",
    # fn_* long tail
    "fn_hash_native", "fn_bitwise", "fn_strdist", "fn_sequence",
    "fn_trig", "fn_url", "fn_struct", "fn_posexplode", "fn_try_arith",
    "fn_datetime2", "fn_hex", "fn_timezone", "fn_array_setops",
    "fn_variant", "fn_format", "fn_mask_builtin", "fn_struct_surgery",
    # LLM-pipeline wave
    "pipeline_curate_e2e", "text_near_dup_cluster", "sim_topk_pandas",
    "sim_recall_lsh", "sim_ann_ivf_q8", "embed_matryoshka_topk",
    # text_* tail
    "text_tokens", "text_fingerprint", "text_normalize", "text_pii_mask",
    "text_bigram_freq", "text_lm_score", "text_chunk_windows",
    "text_ngram_novelty",
]

# SURVEY.md §2 contract keys (all driver-green across rounds 1-2 except
# agg_partial_final, which is in DRIVER_WINDOW above).  Kept as the
# contract-completeness check; ordering places them right after the
# driver window, ahead of the remaining extras.
CONTRACT_PRIORITY: list[str] = [
    "source_stream_files", "sink_stream", "agg_pivot", "win_ranking",
    "win_lag_lead", "win_running", "win_moving", "win_first_last",
    "win_pct", "topk_per_group", "sort_multi", "limit_k", "topk_global",
    "set_union_all", "set_union", "set_intersect", "set_except",
    "fn_string", "fn_regex", "fn_datetime", "fn_math", "fn_conditional",
    "fn_cast", "fn_hash", "fn_array", "fn_map", "fn_json",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark", "stream_dedup", "stream_stateful", "stream_join",
    "dedup_exact", "dedup_minhash", "sim_topk_exact", "sim_ann_lsh",
    "text_stats", "text_tfidf", "text_lang_profile", "multimodal_cols",
    "udf_python", "udf_pandas_scalar", "udaf_pandas_agg",
    "udtf_grouped_map", "udtf_python", "udf_arrow_batch",
    "scan_parquet", "scan_parquet_pruned", "source_csv", "source_json",
    "sink_parquet", "sink_csv_json", "project_cols", "project_expr",
    "filter_simple", "filter_compound", "filter_null", "distinct_rows",
    "filter_subquery", "join_inner", "join_left", "join_right",
    "join_full", "join_semi", "join_anti", "join_cross", "join_broadcast",
    "join_range", "join_asof", "join_multiway", "join_skew_salted",
    "agg_global", "agg_groupby", "agg_having", "agg_count_distinct",
    "agg_approx_distinct", "agg_stats", "agg_collect", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_partial_final",
]

# Modules that register queries (imported for side effects by load_all).
_OP_MODULES = [
    "etl_cnc_spark.sources.scans",
    "etl_cnc_spark.sources.sinks",
    "etl_cnc_spark.sources.kafka",
    "etl_cnc_spark.sources.lakehouse",
    "etl_cnc_spark.sources.python_ds",
    "etl_cnc_spark.operators.projection",
    "etl_cnc_spark.operators.joins",
    "etl_cnc_spark.operators.aggregates",
    "etl_cnc_spark.operators.windows",
    "etl_cnc_spark.operators.sorts",
    "etl_cnc_spark.operators.sets",
    "etl_cnc_spark.operators.etl",
    "etl_cnc_spark.operators.analytics",
    "etl_cnc_spark.operators.stats",
    "etl_cnc_spark.operators.graph",
    "etl_cnc_spark.operators.tpch",
    "etl_cnc_spark.functions.scalar",
    "etl_cnc_spark.streaming.batch_equiv",
    "etl_cnc_spark.streaming.streams",
    "etl_cnc_spark.llm.dedup",
    "etl_cnc_spark.llm.similarity",
    "etl_cnc_spark.llm.text",
    "etl_cnc_spark.llm.multimodal",
    "etl_cnc_spark.llm.retrieval",
    "etl_cnc_spark.udfs",
    "etl_cnc_spark.sql",
    "etl_cnc_spark.plans.rewrite",  # needs llm.similarity registered first
]


def register(
    name: str,
    oracle: str | None = None,
    *,
    check: str | None = None,
    notes: str = "",
    bench: bool = False,
) -> Callable[[BuildFn], BuildFn]:
    """Register a query builder under ``name`` with its DuckDB oracle."""

    def deco(fn: BuildFn) -> BuildFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        resolved = check or ("hash" if oracle is not None else "rows")
        REGISTRY[name] = QueryDef(
            name=name, build=fn, oracle=oracle, check=resolved, notes=notes, bench=bench
        )
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QueryDef]:
    """Import every operator module (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _OP_MODULES:
            # A missing operator module means silent coverage loss —
            # always raise so the registry can never shrink unnoticed.
            importlib.import_module(mod)
        priority = list(dict.fromkeys(DRIVER_WINDOW + CONTRACT_PRIORITY))
        missing = [k for k in priority if k not in REGISTRY]
        if missing:
            raise RuntimeError(f"contract keys not registered: {missing}")
        ordered = {k: REGISTRY.pop(k) for k in priority}
        ordered.update(REGISTRY)
        REGISTRY.clear()
        REGISTRY.update(ordered)
        _loaded = True
    return REGISTRY
