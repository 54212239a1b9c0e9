"""Kafka source plumbing (SURVEY.md §2.1 / memory: round-2 stub).

The real connector (`spark-sql-kafka-0-10`) is a separate jar that is
NOT baked into this container, so `read_kafka` / `read_kafka_stream`
gate behind a try and raise with the exact `--packages` coordinate a
cluster deploy needs. What IS testable offline — and what this module
makes real — is everything downstream of the connector: the wire
schema (key/value as opaque binary + topic/partition/offset), the
binary→JSON decode, and per-partition offset bookkeeping. The
`source_kafka_shape` key builds a byte-exact replica of the
connector's output frame from the events fixture and runs the full
consumer path over it, so swapping in the real connector changes one
`spark.read` call and nothing else.

Scale notes: a Kafka scan parallelizes by (topic, partition) — one
Spark task per Kafka partition — so the aggregate below shuffles on
the natural partition key with bounded cardinality (#partitions), and
offset tracking is a per-partition max, exactly how Structured
Streaming checkpoints progress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import table
from ..registry import register

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"

N_PARTITIONS = 8

#: The connector's fixed output schema (public contract of the
#: kafka data source, minus timestampType which is connector-internal).
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def read_kafka(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """Batch-read a topic via the real connector (cluster only)."""
    try:
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .load()
        )
    except Exception as exc:  # connector jar absent in this container
        raise NotImplementedError(
            f"kafka connector not on classpath; submit with "
            f"--packages {KAFKA_PACKAGE}"
        ) from exc


def read_kafka_stream(spark: SparkSession, bootstrap: str, topic: str) -> DataFrame:
    """readStream variant of `read_kafka` (cluster only)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .load()
        )
    except Exception as exc:
        raise NotImplementedError(
            f"kafka connector not on classpath; submit with "
            f"--packages {KAFKA_PACKAGE}"
        ) from exc


def wire_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic replica of the connector's output for the events
    fixture: key = user_id bytes, value = JSON payload bytes, 8 hash
    partitions, contiguous 0-based offsets per partition in event_id
    order (the producer order)."""
    e = table(spark, sf_dir, "events")
    part = (F.col("user_id") % N_PARTITIONS).cast("int")
    w = Window.partitionBy("partition").orderBy("event_id")
    return (
        e.select(
            F.col("user_id").cast("string").cast("binary").alias("key"),
            F.to_json(
                F.struct("event_id", "event_type", "user_id")
            ).cast("binary").alias("value"),
            F.lit("events").alias("topic"),
            part.alias("partition"),
            F.col("ts").alias("timestamp"),
            F.col("event_id"),
        )
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .select([f.name for f in WIRE_SCHEMA.fields])
    )


@register(
    "source_kafka_shape",
    oracle=f"""
    WITH wire AS (
        SELECT user_id % {N_PARTITIONS} AS partition, event_id, event_type,
               user_id,
               row_number() OVER (PARTITION BY user_id % {N_PARTITIONS}
                                  ORDER BY event_id) - 1 AS "offset"
        FROM events
    )
    SELECT 'events' AS topic, CAST(partition AS INT) AS partition,
           CAST(count(*) AS BIGINT) AS messages,
           CAST(max("offset") AS BIGINT) AS max_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS producers,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS purchases
    FROM wire GROUP BY partition
    """,
)
def source_kafka_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka consumer path over a byte-exact wire-format replica:
    decode binary key/value (value is JSON, parsed with `from_json`),
    then the canonical per-partition bookkeeping aggregate — message
    count, high-water offset, distinct producers, and a payload-
    derived measure (purchases) proving the decode round-trip.

    Everything after `wire_frame` is exactly what runs against the
    real connector; the oracle recomputes from the raw events, so a
    decode bug (not just a count bug) breaks the hash."""
    wire = wire_frame(spark, sf_dir)
    decoded = wire.select(
        "topic",
        "partition",
        "offset",
        F.col("key").cast("string").cast("long").alias("producer_id"),
        F.from_json(F.col("value").cast("string"), _VALUE_SCHEMA).alias("v"),
    )
    return (
        decoded.groupBy("topic", "partition")
        .agg(
            F.count(F.lit(1)).alias("messages"),
            F.max("offset").alias("max_offset"),
            F.countDistinct("producer_id").alias("producers"),
            F.sum(
                F.when(F.col("v.event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("purchases"),
        )
    )
