"""Sink operators (SURVEY.md §2.1): partitioned parquet, csv, json.

Each sink query is write → read-back → verify, so the oracle checks
that the sink preserved the data (not merely that a file appeared).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import sql_sum_money, sum_money


@register(
    "sink_parquet",
    oracle=f"""
    SELECT l_returnflag, count(*) AS n,
           {sql_sum_money("l_extendedprice")} AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet write (partitionBy l_returnflag) +
    read-back aggregate. At scale, partitionBy on a low-cardinality
    column gives partition pruning to every downstream reader."""
    out = tempfile.mkdtemp(prefix="etlcnc_sinkpq_")
    li = table(spark, sf_dir, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        sum_money(F.col("l_extendedprice")).alias("sum_price"),
    )


@register(
    "sink_csv_json",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority
    """,
)
def sink_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON sinks: the same aggregate is written to both
    formats, read back, and inner-joined on equal counts — a row
    drops out (failing the oracle row-count) if either sink corrupts
    anything."""
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    out_csv = tempfile.mkdtemp(prefix="etlcnc_sinkcsv_")
    out_json = tempfile.mkdtemp(prefix="etlcnc_sinkjson_")
    agg.write.mode("overwrite").option("header", True).csv(out_csv)
    agg.write.mode("overwrite").json(out_json)
    c = (
        spark.read.option("header", True)
        .schema("o_orderpriority STRING, n LONG")
        .csv(out_csv)
    )
    j = spark.read.schema("o_orderpriority STRING, n LONG").json(out_json)
    return c.join(j, ["o_orderpriority", "n"], "inner")
