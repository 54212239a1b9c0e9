"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

One key per extension-point kind, each oracle-verified by a SQL
reimplementation. Performance ordering (SURVEY §4): builtin exprs >
Arrow-vectorized pandas UDFs > row-at-a-time Python UDFs — the
row-at-a-time kind appears exactly once, as the demonstration of the
slow path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from .catalog import table
from .registry import register
from .utils import q4, sql_q4


@register(
    "udf_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bracket
    FROM orders
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path: per-row serde, no
    codegen — kept off hot paths by policy)."""

    def bracket(p: float) -> str:
        if p < 100_000:
            return "low"
        if p < 300_000:
            return "mid"
        return "high"

    b = F.udf(bracket, "string")
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", b("o_totalprice").alias("bracket"))


@register(
    "udf_pandas_scalar",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_q4("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, ~10-100x the
    row-at-a-time path). The numpy formula mirrors utils.q4 ops
    bitwise, so it hash-matches the SQL oracle exactly."""

    @pandas_udf("double")
    def revenue(price: pd.Series, disc: pd.Series) -> pd.Series:
        return np.floor(price * (1 - disc) * 10000 + 0.5) / 10000.0

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue"),
    )


@register(
    "udaf_pandas_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                    * CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)
           / CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF: quantity-weighted mean price.
    Inputs are quantized to integer cents inside the UDAF so the
    sums are exact (order-independent) and match the SQL oracle
    bitwise — the same discipline as utils.sum_money."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        pc = np.floor(price * 100 + 0.5).astype("int64")
        qc = np.floor(qty * 100 + 0.5).astype("int64")
        return float(np.sum(pc * qc)) / float(np.sum(qc)) / 100.0

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@register(
    "udtf_grouped_map",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           {sql_q4("(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))"
                   " / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment)")}
             AS bal_z
    FROM customer
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (table in → table out per group):
    z-score normalization within each market segment. numpy's
    mean/std(ddof=1) agree with the window-function oracle to ~1e-12
    relative; q4 quantization absorbs that."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["c_acctbal"]
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_z": np.floor(z * 10000 + 0.5) / 10000.0,
            }
        )

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey LONG, c_mktsegment STRING, bal_z DOUBLE"
    )


@register(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 5
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → many output rows
    (tokenize with positions), consumed via LATERAL join."""

    @udtf(returnType="doc_id bigint, pos bigint, word string")
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            for i, w in enumerate(text.split(" ")):
                yield doc_id, i, w

    spark.udtf.register("etlcnc_split_words", SplitWords)
    table(spark, sf_dir, "documents").createOrReplaceTempView("etlcnc_docs_udtf")
    return spark.sql(
        """
        SELECT s.doc_id, s.pos, s.word
        FROM etlcnc_docs_udtf d, LATERAL etlcnc_split_words(d.doc_id, d.text) s
        WHERE d.doc_id < 5
        """
    )


@register(
    "udf_arrow_batch",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_q4("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge
    FROM lineitem
    """,
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: zero-copy Arrow RecordBatch iterator per
    partition — the lowest-overhead Python extension point (no
    pandas conversion), for custom batch-level operators."""

    def charge_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pc = pa.compute
        for batch in batches:
            price = batch.column(batch.schema.get_field_index("l_extendedprice"))
            disc = batch.column(batch.schema.get_field_index("l_discount"))
            tax = batch.column(batch.schema.get_field_index("l_tax"))
            charge = pc.multiply(
                pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                pc.add(pa.scalar(1.0), tax),
            )
            q = pc.divide(
                pc.floor(pc.add(pc.multiply(charge, pa.scalar(10000.0)), pa.scalar(0.5))),
                pa.scalar(10000.0),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("l_orderkey")),
                    batch.column(batch.schema.get_field_index("l_linenumber")),
                    q,
                ],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )
    return li.mapInArrow(
        charge_batches, "l_orderkey LONG, l_linenumber INT, charge DOUBLE"
    )


@register(
    "udtf_dynamic_schema",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
    FROM events WHERE event_id < 2000
    """,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze()`): the OUTPUT
    SCHEMA is computed at plan time from a literal argument — here a
    field list the UDTF extracts from a JSON payload, one column per
    requested field. This is the extension point for schema-on-demand
    connectors and generic exploders where the shape isn't known
    until the query names it; Catalyst sees concrete columns (full
    pruning/pushdown downstream), while eval() stays generic."""
    import json as _json

    from pyspark.sql.types import LongType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class ExtractFields:
        @staticmethod
        def analyze(
            js: AnalyzeArgument, fields: AnalyzeArgument
        ) -> AnalyzeResult:
            schema = StructType()
            for name in fields.value.split(","):
                schema = schema.add(name, LongType())
            return AnalyzeResult(schema=schema)

        def eval(self, js: str, fields: str):
            d = _json.loads(js)
            yield tuple(int(d[n]) for n in fields.split(","))

    spark.udtf.register("etlcnc_extract_fields", ExtractFields)
    table(spark, sf_dir, "events").createOrReplaceTempView(
        "etlcnc_events_udtf"
    )
    return spark.sql(
        """
        SELECT s.event_id, s.user_id, s.value_cents
        FROM etlcnc_events_udtf e,
             LATERAL etlcnc_extract_fields(
                 to_json(struct(
                     e.event_id, e.user_id,
                     CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                         AS value_cents)),
                 'event_id,user_id,value_cents') s
        WHERE e.event_id < 2000
        """
    )


@register(
    "udtf_polymorphic",
    oracle="""
    WITH src AS (SELECT n_nationkey, n_name FROM nation)
    SELECT 'n_name' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT n_name) AS BIGINT) AS n_distinct,
           min(strlen(n_name)) AS min_len, max(strlen(n_name)) AS max_len
    FROM src
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4's ``analyze()`` static
    method): the UDTF derives its OUTPUT SCHEMA from its arguments
    at plan time — here a generic column profiler whose result
    columns depend on which column it is pointed at — the mechanism
    behind reusable table functions that adapt to any input
    (pivot-like tools, schema-driven validators). The profile of
    nation.n_name (row/distinct counts, byte-length range) is
    hash-verified relationally.

    The eval/terminate pair aggregates per PARTITION and a final
    single-partition terminate folds partials — the mergeable-state
    discipline, shown at the UDTF surface."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        StringType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ProfileColumn:
        @staticmethod
        def analyze(col: AnalyzeArgument) -> AnalyzeResult:
            # output schema computed FROM the argument at plan time
            return AnalyzeResult(
                StructType(
                    [
                        StructField("col_name", StringType()),
                        StructField("n_rows", LongType()),
                        StructField("n_distinct", LongType()),
                        StructField("min_len", LongType()),
                        StructField("max_len", LongType()),
                    ]
                )
            )

        def __init__(self):
            self.n = 0
            self.vals = set()
            self.min_len = None
            self.max_len = None

        def eval(self, row):
            # TABLE(...) arguments arrive as a Row per input record
            col = row[0]
            self.n += 1
            self.vals.add(col)
            ln = len(col.encode("utf-8"))
            self.min_len = ln if self.min_len is None else min(self.min_len, ln)
            self.max_len = ln if self.max_len is None else max(self.max_len, ln)

        def terminate(self):
            yield ("n_name", self.n, len(self.vals), self.min_len, self.max_len)

    u = udtf(ProfileColumn)
    spark.udtf.register("etlcnc_profile_col", u)
    table(spark, sf_dir, "nation").createOrReplaceTempView(
        "etlcnc_nation_udtf"
    )
    # WITH SINGLE PARTITION declares the one-instance fold the
    # terminate() contract assumes: without it the UDTF instantiates
    # once PER SCAN SPLIT, so the result silently depends on
    # spark.sql.files.maxPartitionBytes (one row per split — caught
    # by the r11 partition-invariance sweep, which also tripped a
    # Spark codegen NPE on empty splits feeding the TABLE argument).
    # At scale the same UDTF runs WITH PARTITION BY + a reducer over
    # partials instead.
    out = spark.sql(
        """
        SELECT p.col_name, p.n_rows, p.n_distinct, p.min_len, p.max_len
        FROM etlcnc_profile_col(
            TABLE(SELECT n_name FROM etlcnc_nation_udtf)
            WITH SINGLE PARTITION) p
        """
    )
    return out


@register(
    "udtf_polymorphic_partitioned",
    oracle="""
    WITH g AS (
        SELECT CAST(n_regionkey AS VARCHAR) AS grp,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(strlen(n_name)) AS BIGINT) AS min_len,
               CAST(max(strlen(n_name)) AS BIGINT) AS max_len
        FROM nation GROUP BY 1
    )
    SELECT grp, n_rows, min_len, max_len FROM g
    UNION ALL
    SELECT '__all__' AS grp, CAST(sum(n_rows) AS BIGINT) AS n_rows,
           min(min_len) AS min_len, max(max_len) AS max_len
    FROM g
    """,
)
def udtf_polymorphic_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AT-SCALE shape of udtf_polymorphic (VERDICT r11 item 8,
    executable instead of a comment): the polymorphic profiler's
    ``analyze()`` DECLARES its required partitioning via
    ``AnalyzeResult(partitionBy=[PartitioningColumn(...)])`` — Catalyst
    inserts the shuffle, instantiates the UDTF once per DISTINCT key
    (verified under repartition(7): still one row per region), and each
    instance folds only its group's rows — then a relational REDUCER
    merges the mergeable partials (sum of counts, min/max of lengths)
    into the global row. This is the mergeable-state discipline the
    WITH SINGLE PARTITION variant documents but cannot demonstrate:
    state that merges runs partitioned at any scale; only the
    group-count-sized partials meet the final single reducer.
    Non-mergeable stats (n_distinct) are deliberately ABSENT from the
    merged row — the partitioned shape only publishes what folds.

    Scale shape: the fact scan shuffles once on the declared key; the
    reducer consumes |groups| rows. No single-partition stage touches
    data-sized input."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult, PartitioningColumn

    class ProfileByGroup:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            # schema computed at plan time; the UDTF itself demands the
            # partitioning — callers cannot accidentally run it unsplit
            return AnalyzeResult(
                StructType(
                    [
                        StructField("grp", StringType()),
                        StructField("n_rows", LongType()),
                        StructField("min_len", LongType()),
                        StructField("max_len", LongType()),
                    ]
                ),
                partitionBy=[PartitioningColumn("n_regionkey")],
            )

        def __init__(self):
            self.grp = None
            self.n = 0
            self.mn = None
            self.mx = None

        def eval(self, row):
            self.grp = row["n_regionkey"]
            ln = len(row["n_name"].encode("utf-8"))
            self.n += 1
            self.mn = ln if self.mn is None else min(self.mn, ln)
            self.mx = ln if self.mx is None else max(self.mx, ln)

        def terminate(self):
            if self.n:  # guard: never emit for an empty instance
                yield (str(self.grp), self.n, self.mn, self.mx)

    spark.udtf.register("etlcnc_profile_grp", udtf(ProfileByGroup))
    table(spark, sf_dir, "nation").createOrReplaceTempView(
        "etlcnc_nation_udtf_part"
    )
    # lazily materialize the |groups|-sized partials: BOTH consumers
    # (the per-group branch and the merged reducer) replay the tiny
    # checkpoint instead of re-running the UDTF over the fact table
    partials = spark.sql(
        """
        SELECT p.grp, p.n_rows, p.min_len, p.max_len
        FROM etlcnc_profile_grp(
            TABLE(SELECT n_regionkey, n_name FROM etlcnc_nation_udtf_part)) p
        """
    ).localCheckpoint(eager=False)
    merged = partials.agg(
        F.lit("__all__").alias("grp"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.min("min_len").cast("long").alias("min_len"),
        F.max("max_len").cast("long").alias("max_len"),
    ).select("grp", "n_rows", "min_len", "max_len")
    return partials.unionByName(merged)
