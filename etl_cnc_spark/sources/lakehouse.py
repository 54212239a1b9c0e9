"""Lakehouse table formats (Delta Lake / Apache Iceberg) — connector
stubs with exact deploy recipes.

Neither format's jar is baked into this container, so these gate
behind try and raise with the `--packages` coordinate plus the
session config a cluster deploy needs (same pattern as
`sources/kafka.py`).

Blocked-by-environment evidence (re-verified round 2, 2026-08-13):
``pip download delta-spark --no-deps`` fails with DNS resolution
errors ('Name or service not known') — no PyPI, no Maven, and the
bundled pyspark jars dir has no delta/iceberg/kafka artifacts (only
rocksdbjni). A runnable Delta round-trip therefore cannot execute
here; the recipes below are the deployable path. The repo's own ACID-adjacent behaviors —
dynamic partition overwrite (`sink_partition_overwrite`), MERGE
(`etl_merge_upsert`), SCD2 (`etl_scd2`), snapshot diff
(`etl_table_diff`), incremental loads (`etl_incremental_merge`) —
are implemented format-agnostically on parquet, so adopting a table
format swaps the storage call, not the pipeline logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DELTA_PACKAGE = "io.delta:delta-spark_2.13:4.0.0"
DELTA_CONFS = {
    "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog": (
        "org.apache.spark.sql.delta.catalog.DeltaCatalog"
    ),
}

ICEBERG_PACKAGE = (
    "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"
)
ICEBERG_CONFS = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions"
        ".IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.local.type": "hadoop",
    "spark.sql.catalog.local.warehouse": "<warehouse-path>",
}


def _stub(fmt: str, package: str, confs: dict[str, str], exc: Exception):
    lines = "".join(f"\n  --conf {k}={v}" for k, v in confs.items())
    raise NotImplementedError(
        f"{fmt} runtime not on classpath; submit with "
        f"--packages {package}{lines}"
    ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a Delta table (cluster only)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as exc:
        _stub("delta", DELTA_PACKAGE, DELTA_CONFS, exc)


def read_iceberg(spark: SparkSession, table_id: str) -> DataFrame:
    """Batch-read an Iceberg table by catalog identifier."""
    try:
        return spark.read.format("iceberg").load(table_id)
    except Exception as exc:
        _stub("iceberg", ICEBERG_PACKAGE, ICEBERG_CONFS, exc)
