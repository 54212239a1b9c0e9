"""Descriptive-statistics operators (``df.stat``-family re-expressed
relationally): contingency tables and frequent items.

Spark ships these as driver-side helpers (``DataFrame.stat.crosstab``
/ ``freqItems``); we express them as plain aggregations instead so
they stay declarative — Catalyst plans them as one hash-aggregate
pass (plus a broadcast of the single-row total), which is exactly the
shape that scales: no driver-side result assembly, map-side partial
aggregation, cardinality of the output bounded by the attribute
domains, not the input rows.

No reference citations possible — /root/reference is empty (see
SURVEY.md §0); surface derives from the driver contract + the public
``df.stat`` API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import q4, sql_q4

_STATUSES = ("F", "O", "P")
_CROSSTAB_COLS = ", ".join(
    "CAST(count_if(o_orderstatus = '{s}') AS BIGINT) AS \"{s}\"".format(s=s)
    for s in _STATUSES
)


@register(
    "stat_crosstab",
    oracle=f"""
    SELECT o_orderpriority, {_CROSSTAB_COLS}
    FROM orders GROUP BY o_orderpriority
    """,
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table o_orderpriority × o_orderstatus
    (``df.stat.crosstab`` semantics, one column per status value).

    Implemented as ``groupBy().pivot(values=...)``: passing the pivot
    values explicitly skips the extra distinct-values job Spark would
    otherwise run, so the whole table is a single hash-aggregate —
    output rows = |priority domain|, independent of input size."""
    o = table(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{s}`"), F.lit(0)).cast("long").alias(s)
            for s in _STATUSES
        ],
    )


@register(
    "stat_freq_items",
    oracle=f"""
    WITH stacked AS (
        SELECT 'o_orderstatus' AS col, o_orderstatus AS item FROM orders
        UNION ALL
        SELECT 'o_orderpriority' AS col, o_orderpriority AS item FROM orders
    ), tot AS (SELECT count(*) AS total FROM orders)
    SELECT col, item, CAST(count(*) AS BIGINT) AS cnt,
           {sql_q4("count(*) / (SELECT total FROM tot)")} AS support
    FROM stacked GROUP BY col, item
    HAVING count(*) * 8 > (SELECT total FROM tot)
    """,
)
def stat_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent items over two orders attributes: every value
    with support > 1/8 (``df.stat.freqItems`` semantics, but exact —
    the sketch variant trades that for one pass; at our domain sizes
    the exact groupBy is already one pass + a tiny shuffle).

    The stack→groupBy shape generalizes to any column set; the total
    joins in via a broadcast of a single-row aggregate rather than a
    driver-side ``count()`` so the whole query stays one job."""
    o = table(spark, sf_dir, "orders")
    stacked = o.select(
        F.lit("o_orderstatus").alias("col"), F.col("o_orderstatus").alias("item")
    ).unionAll(
        o.select(
            F.lit("o_orderpriority").alias("col"),
            F.col("o_orderpriority").alias("item"),
        )
    )
    tot = o.agg(F.count(F.lit(1)).alias("total"))
    return (
        stacked.groupBy("col", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * 8 > F.col("total"))
        .select(
            "col",
            "item",
            "cnt",
            q4(F.col("cnt") / F.col("total")).alias("support"),
        )
    )
