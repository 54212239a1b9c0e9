"""Sink operators (SURVEY.md §2.1): partitioned parquet, csv, json.

Each sink query is write → read-back → verify, so the oracle checks
that the sink preserved the data (not merely that a file appeared).
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from ..utils import cents, sql_sum_money, sum_money, tmpdir


@contextlib.contextmanager
def _conf(spark: SparkSession, key: str, value: str):
    """Set a SQLConf for the duration of a write, restoring the prior
    value (the shared test session must not leak config)."""
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


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
    out = tmpdir(prefix="etlcnc_sinkpq_", stable=True, key=sf_dir)
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
    out_csv = tmpdir(prefix="etlcnc_sinkcsv_", stable=True, key=sf_dir)
    out_json = tmpdir(prefix="etlcnc_sinkjson_", stable=True, key=sf_dir)
    agg.write.mode("overwrite").option("header", True).csv(out_csv)
    agg.write.mode("overwrite").json(out_json)
    c = (
        spark.read.option("header", True)
        .schema("o_orderpriority STRING, n LONG")
        .csv(out_csv)
    )
    j = spark.read.schema("o_orderpriority STRING, n LONG").json(out_json)
    return c.join(j, ["o_orderpriority", "n"], "inner")


@register(
    "sink_partition_overwrite",
    oracle="""
    WITH final AS (
        SELECT o_orderstatus, o_totalprice FROM orders
        WHERE o_orderstatus <> 'P'
        UNION ALL
        SELECT o_orderstatus, o_totalprice * 2 AS o_totalprice FROM orders
        WHERE o_orderstatus = 'P'
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM final GROUP BY o_orderstatus
    """,
)
def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the production backfill
    primitive: rewrite ONE hive partition in place while every other
    partition's files are untouched (partitionOverwriteMode=dynamic,
    vs the static mode that would truncate the whole table). The key
    writes orders partitioned by status, backfills the 'P' partition
    with corrected rows (price×2), and aggregates the read-back; the
    oracle recomputes the expected final state relationally, so a
    mode bug (clobbered sibling partitions) or a non-atomic rewrite
    breaks count AND cents.

    Money is compared in integer cents (exact, order-free sums)."""
    out = tmpdir(prefix="etlcnc_dynover_", stable=True, key=sf_dir)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    # Materialize the backfill BEFORE overwriting its own source
    # partition: with task retries/speculation on a real cluster, a
    # lazy plan re-scanning the path after the partition commit could
    # observe the rewritten 'P' data and double-apply the correction.
    fixed = (
        spark.read.parquet(out)
        .where(F.col("o_orderstatus") == "P")
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .localCheckpoint(eager=True)
    )
    with _conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        fixed.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("o_totalprice"))).cast("long").alias("sum_cents"),
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT o_orderpriority AS dim_priority,
               CASE WHEN substr(md5(o_orderpriority), 1, 1) < '8'
                    THEN 'a' ELSE 'b' END AS tier
        FROM orders
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders JOIN dim ON o_orderpriority = dim_priority
    WHERE tier = 'a'
    GROUP BY o_orderpriority
    """,
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact table is stored
    hive-partitioned on the join key (o_orderpriority); the dim
    table is a STORED parquet table carrying a tier attribute whose
    relationship to the key only exists as data — so when the query
    filters ``tier = 'a'`` and joins on the key, the qualifying
    partitions are unknowable at plan time and Spark injects a
    dynamic-pruning subquery into the fact SCAN's PartitionFilters:
    whole partition directories are skipped at RUN time based on the
    dim's surviving keys. At 100 TB with date-partitioned facts and
    a "which dates are in this campaign" dim, this is the biggest
    I/O lever after column pruning. Both tables stage once per
    process (stable dirs); the plan assertion lives in
    tests/test_plans.py::test_dpp_subquery_in_fact_scan.

    The tier is an md5-derived deterministic attribute (DuckDB
    computes the identical digests in the oracle), stored — not
    computed in the query — precisely so Catalyst cannot fold the
    filter through the join statically (which would demote this to
    static partition pruning)."""
    import os

    out = tmpdir(prefix="etlcnc_dpp_", stable=True, key=sf_dir)
    fact_dir = os.path.join(out, "fact")
    dim_dir = os.path.join(out, "dim")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    if not os.path.exists(os.path.join(fact_dir, "_SUCCESS")):
        o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
            fact_dir
        )
    if not os.path.exists(os.path.join(dim_dir, "_SUCCESS")):
        tier = F.when(
            F.substring(F.md5(F.col("dim_priority")), 1, 1) < "8", "a"
        ).otherwise("b")
        (
            table(spark, sf_dir, "orders")
            .select(F.col("o_orderpriority").alias("dim_priority"))
            .distinct()
            .withColumn("tier", tier)
            .write.mode("overwrite")
            .parquet(dim_dir)
        )
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where(F.col("tier") == "a")
    return (
        fact.join(dim, F.col("o_orderpriority") == F.col("dim_priority"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
    )
