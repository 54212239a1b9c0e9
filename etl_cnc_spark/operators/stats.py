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


def _moments_sql() -> str:
    # raw moment sums are exact integers (l_quantity is integer-valued,
    # x^k <= 50^4 and partial sums < 2^53), so they are order-free;
    # the float formulas then run ONCE per group in a fixed shape
    return """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT) *
                        CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
               CAST(SUM(CAST(l_quantity AS BIGINT) *
                        CAST(l_quantity AS BIGINT) *
                        CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT) *
                        CAST(l_quantity AS BIGINT) *
                        CAST(l_quantity AS BIGINT) *
                        CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        FROM lineitem GROUP BY l_returnflag
    """


@register(
    "agg_moments",
    oracle=f"""
    WITH m AS ({_moments_sql()}),
    c AS (
        SELECT l_returnflag, n, s1, s2, s3, s4,
               CAST(s1 AS DOUBLE) / n AS mu
        FROM m
    ), central AS (
        SELECT l_returnflag, n, mu,
               (CAST(s2 AS DOUBLE) / n) - mu * mu AS m2,
               (CAST(s3 AS DOUBLE) / n) - 3 * mu * (CAST(s2 AS DOUBLE) / n)
                   + 2 * mu * mu * mu AS m3,
               (CAST(s4 AS DOUBLE) / n) - 4 * mu * (CAST(s3 AS DOUBLE) / n)
                   + 6 * mu * mu * (CAST(s2 AS DOUBLE) / n)
                   - 3 * mu * mu * mu * mu AS m4
        FROM c
    )
    SELECT l_returnflag, n, {sql_q4("mu")} AS mean_qty,
           {sql_q4("m2")} AS var_pop,
           {sql_q4("m3 / pow(m2, 1.5)")} AS skewness,
           {sql_q4("m4 / (m2 * m2) - 3")} AS excess_kurtosis
    FROM central
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments (population skewness, excess
    kurtosis) computed the distributed-exact way: raw power sums
    Σx..Σx⁴ as BIGINTs (integer-valued measure → exact, therefore
    order-independent across any partitioning — engine skewness()
    builtins use running float updates whose bias corrections AND
    summation orders differ between engines), then the central-moment
    formulas applied once per group in a fixed association order.
    Raw moment sums are also trivially mergeable — the same shape
    works as a partial-aggregate / rollup state."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q * q * q).cast("long").alias("s3"),
        F.sum(q * q * q * q).cast("long").alias("s4"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    s2n = F.col("s2").cast("double") / F.col("n")
    s3n = F.col("s3").cast("double") / F.col("n")
    s4n = F.col("s4").cast("double") / F.col("n")
    m2 = s2n - mu * mu
    m3 = s3n - 3 * mu * s2n + 2 * mu * mu * mu
    m4 = s4n - 4 * mu * s3n + 6 * mu * mu * s2n - 3 * mu * mu * mu * mu
    return m.select(
        "l_returnflag",
        "n",
        q4(mu).alias("mean_qty"),
        q4(m2).alias("var_pop"),
        q4(m3 / F.pow(m2, 1.5)).alias("skewness"),
        q4(m4 / (m2 * m2) - 3).alias("excess_kurtosis"),
    )
