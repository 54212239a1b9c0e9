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
# registry (first 50 keys), so ordering is evidence.  Rounds 1-5
# accumulated 246 distinct driver-checked keys (238 hash-green, 8
# rows-only by design, 0 red at HEAD).  DRIVER_WINDOW r6 =
# sim_recall_report + sim_recall_lsh (fresh recall attestation after
# the IVF-PQ / matryoshka additions, per VERDICT r5 item 7) plus the
# next 48 never-driver-checked keys in registry order (the r5 join/
# sketch/ETL/time-series waves).  Round 6 also added 56 NEW keys
# (registry now 402), so the remainder after this sweep is 52 r5
# leftovers + 60 r6 keys = 112 never-checked — r7/r8 windows = the
# next 50 each printed by `python tools/next_window.py`, r9 = the
# final 8 plus re-verify slots.  Run `python tools/preflight.py`
# before rotating (catches driver-canonicalization traps like r4's
# embed_quantize numpy-cell issue).
DRIVER_WINDOW: list[str] = [
    # §2.10 statistical-gate re-attestation (recall numbers re-measured
    # after the IVF-PQ and matryoshka retrieval additions)
    "sim_recall_report", "sim_recall_lsh",
    # r5 join wave
    "join_dynamic_partition_pruning", "join_interval_overlap",
    "join_asof_tolerance", "join_spatial_grid", "join_fuzzy_names",
    "join_cardinality_estimate", "join_asof_nearest",
    # sketch / histogram aggregates
    "agg_kmv_distinct", "agg_kmv_setops", "agg_bloom_membership",
    "agg_equidepth_histogram", "agg_countmin_sketch", "agg_hdr_histogram",
    "win_gaps_islands", "set_intersect_all",
    # ETL data-quality wave
    "etl_benford", "etl_survivorship", "etl_dp_release",
    "etl_table_checksum", "etl_pseudonymize",
    # time-series / experimentation wave
    "events_dau_mau", "events_ewma", "events_seasonal_decompose",
    "events_theil_sen", "events_autocorr", "events_changepoint",
    "events_holt", "events_decay_counter", "ml_point_in_time_features",
    "events_ab_sequential", "events_forecast_backtest",
    "orders_duplicate_payments", "events_diff_in_diff",
    "events_power_analysis", "events_mix_shift", "events_anomaly_mad",
    "events_interval_union", "events_user_overlap",
    "events_funnel_constrained", "orders_yoy_growth",
    "events_markov_stationary", "orders_skyline", "events_rolling_slope",
    "events_volatility_band", "agg_weighted_percentile",
    # drift / nonparametric stats
    "stat_ks_test", "stat_psi_drift", "stat_mann_whitney",
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
    "etl_cnc_spark.operators.mlprep",
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
