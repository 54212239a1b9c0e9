"""Sort / limit / top-k operators (SURVEY.md §2.6).

LIMIT is only deterministic after a total order, so every query here
sorts on a key made unique by a tie-break column (SURVEY §5
order-insensitivity note). At scale, orderBy+limit compiles to
TakeOrderedAndProject — per-partition top-k then a single merge,
never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import q2, sql_q2


@register(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np, o_totalprice
    FROM orders
    ORDER BY status_np ASC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort: asc + desc + explicit NULLS LAST (nulls are
    manufactured via nullif — the fixtures have none; Spark defaults
    to NULLS FIRST on ASC, DuckDB to NULLS LAST, so being explicit is
    mandatory for parity)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.expr("nullif(o_orderstatus, 'P')").alias("status_np"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_np").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            "o_orderkey",
        )
        .limit(50)
    )


@register(
    "limit_k",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
)
def limit_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT after a total order."""
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(10)
    )


@register(
    "topk_global",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_q2("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    ORDER BY revenue DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k on a computed column (TakeOrderedAndProject)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            q2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )
