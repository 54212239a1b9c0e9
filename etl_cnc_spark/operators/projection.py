"""Projection / filter / predicate operators (SURVEY.md §2.2).

All plain DataFrame API — Catalyst pushes these predicates and
projections down to the parquet scan (verified by explain() tests in
tests/test_plans.py), so at 100 TB only the needed row groups and
columns are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import q2, sql_q2


@register(
    "project_cols",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
)
def project_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection + renaming; prunes to 3 columns at the scan."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "project_expr",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_q2("l_extendedprice * (1 - l_discount)")} AS revenue,
           {sql_q2("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns (TPC-H revenue/charge expressions), quantized
    with the cross-engine-deterministic 2dp formula (utils.q2)."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        q2(rev).alias("revenue"),
        q2(rev * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 30
    """,
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single comparison predicate — pushed to parquet row-group stats."""
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "filter_compound",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE (p_type IN ('PROMO', 'ECONOMY') OR p_name LIKE '%widget%')
      AND p_size BETWEEN 10 AND 40
      AND NOT p_brand = 'Brand#5'
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN + LIKE in one predicate tree."""
    p = table(spark, sf_dir, "part")
    return p.where(
        (F.col("p_type").isin("PROMO", "ECONOMY") | F.col("p_name").like("%widget%"))
        & F.col("p_size").between(10, 40)
        & ~(F.col("p_brand") == "Brand#5")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "filter_null",
    oracle="""
    SELECT c_custkey,
           (e.user_id IS NULL) AS no_events,
           (e.max_type IS NOT DISTINCT FROM 'view') AS last_is_view
    FROM customer c
    LEFT JOIN (
        SELECT user_id, max(event_type) AS max_type FROM events GROUP BY user_id
    ) e ON c.c_custkey = e.user_id
    WHERE e.user_id IS NULL OR e.max_type IS NOT DISTINCT FROM 'view'
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL and null-safe equality (``<=>``) on outer-join-produced
    nulls (fixtures themselves contain no NULLs — FIXTURES.md)."""
    c = table(spark, sf_dir, "customer")
    e = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("event_type").alias("max_type"))
    )
    j = c.join(e, c.c_custkey == e.user_id, "left")
    return j.where(
        F.col("user_id").isNull() | F.col("max_type").eqNullSafe("view")
    ).select(
        "c_custkey",
        F.col("user_id").isNull().alias("no_events"),
        F.col("max_type").eqNullSafe("view").alias("last_is_view"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash aggregate with map-side partial dedup."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "filter_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS total
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
    """,
)
def filter_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery, expressed as a left-semi join (what Catalyst
    rewrites IN to anyway); the semi side is broadcastable."""
    o = table(spark, sf_dir, "orders")
    rich = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9500).select("c_custkey")
    return o.join(
        F.broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("total"))
