"""SQL entry point (SURVEY.md §3.2).

``run(spark, sf_dir, text)`` registers the ten fixture tables as temp
views (same names the DuckDB oracle uses) and executes arbitrary SQL
through the full Catalyst pipeline: parse → analyze → optimize →
physical plan → AQE. Exists because oracle-parity debugging is 10×
faster when the same SQL text can be pasted into both engines — and
because an engine with the reference's capabilities must accept SQL,
not only the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views


def run(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Execute ``text`` against the fixture tables as temp views."""
    register_views(spark, sf_dir)
    return spark.sql(text)
