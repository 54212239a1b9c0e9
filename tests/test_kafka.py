"""Kafka wire-format plumbing tests: offset bookkeeping invariants,
decode round-trip, and the documented connector-absent failure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cnc_spark.catalog import table
from etl_cnc_spark.sources import kafka


def test_offsets_contiguous_per_partition(spark, sf_dir):
    """Offsets are 0..n-1 with no gaps inside every partition — the
    invariant real Kafka guarantees and checkpointing relies on."""
    wire = kafka.wire_frame(spark, sf_dir)
    stats = (
        wire.groupBy("partition")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.countDistinct("offset").alias("d"),
        )
        .collect()
    )
    assert len(stats) == kafka.N_PARTITIONS
    for r in stats:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"]


def test_wire_schema_matches_connector(spark, sf_dir):
    wire = kafka.wire_frame(spark, sf_dir)
    assert [f.name for f in wire.schema.fields] == [
        f.name for f in kafka.WIRE_SCHEMA.fields
    ]
    got = {f.name: f.dataType.simpleString() for f in wire.schema.fields}
    assert got["key"] == "binary" and got["value"] == "binary"
    assert got["partition"] == "int" and got["offset"] == "bigint"


def test_decode_roundtrip_totals(spark, sf_dir):
    """Sum of per-partition message counts == events rows; purchases
    decoded from the JSON payload match the raw table."""
    from etl_cnc_spark.registry import load_all

    out = load_all()["source_kafka_shape"].build(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    agg = out.agg(
        F.sum("messages").alias("m"), F.sum("purchases").alias("p")
    ).first()
    assert agg["m"] == e.count()
    assert agg["p"] == e.where(F.col("event_type") == "purchase").count()


def test_connector_stub_raises_with_package_hint(spark):
    with pytest.raises(NotImplementedError) as ei:
        kafka.read_kafka(spark, "localhost:9092", "events")
    assert "--packages" in str(ei.value)


def test_lakehouse_stubs_raise_with_recipes(spark):
    from etl_cnc_spark.sources import lakehouse

    with pytest.raises(NotImplementedError) as d:
        lakehouse.read_delta(spark, "/tmp/nope")
    assert "--packages io.delta" in str(d.value)
    assert "DeltaSparkSessionExtension" in str(d.value)
    with pytest.raises(NotImplementedError) as i:
        lakehouse.read_iceberg(spark, "local.db.t")
    assert "iceberg-spark-runtime" in str(i.value)
