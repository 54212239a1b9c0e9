"""Set operators (SURVEY.md §2.7).

Two overlapping customer subsets drive all four ops:
  A = customers with c_acctbal > 8000   (rich)
  B = customers in segment AUTOMOBILE
Both non-empty, overlapping, neither contained in the other, so
union/intersect/except all produce non-trivial results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


def _rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 8000)
        .select("c_custkey", "c_nationkey")
    )


def _auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey", "c_nationkey")
    )


_A = "SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 8000"
_B = "SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'"


@register("set_union_all", oracle=f"{_A} UNION ALL {_B}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, overlap rows appear twice."""
    return _rich(spark, sf_dir).unionByName(_auto(spark, sf_dir))


@register("set_union", oracle=f"{_A} UNION {_B}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) = unionByName + distinct (one dedup shuffle)."""
    return _rich(spark, sf_dir).unionByName(_auto(spark, sf_dir)).distinct()


@register("set_intersect", oracle=f"{_A} INTERSECT {_B}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): rich AUTOMOBILE customers."""
    return _rich(spark, sf_dir).intersect(_auto(spark, sf_dir))


@register(
    "set_except",
    oracle=f"""
    SELECT c_nationkey FROM ({_A}) EXCEPT ALL SELECT c_nationkey FROM ({_B})
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL on the nationkey *multiset* — genuine bag
    semantics: each nationkey survives max(count_A - count_B, 0)
    times (distinct EXCEPT would collapse to almost nothing here)."""
    a = _rich(spark, sf_dir).select("c_nationkey")
    b = _auto(spark, sf_dir).select("c_nationkey")
    return a.exceptAll(b)


@register(
    "set_intersect_all",
    oracle=f"""
    SELECT c_nationkey FROM ({_A})
    INTERSECT ALL
    SELECT c_nationkey FROM ({_B})
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL on the nationkey multiset — bag semantics
    completing the §2.7 family next to set_except's EXCEPT ALL:
    each nationkey survives min(count_A, count_B) times. Planned as
    one count-per-key aggregate on each side + a join (no row-pair
    matching), which is the shape that scales."""
    a = _rich(spark, sf_dir).select("c_nationkey")
    b = _auto(spark, sf_dir).select("c_nationkey")
    return a.intersectAll(b)
