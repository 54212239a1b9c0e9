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
            try:
                importlib.import_module(mod)
            except ModuleNotFoundError as e:
                # Modules are added incrementally during the build; a
                # missing module is fine as long as its keys aren't
                # declared anywhere yet.
                if mod not in str(e):
                    raise
        _loaded = True
    return REGISTRY
