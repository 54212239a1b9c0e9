"""etl_cnc_spark — a PySpark-native analytics engine.

A Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``Jamie0810/etl-cnc``.

Provenance note (see SURVEY.md §0): ``/root/reference`` is an empty
directory, so docstrings in this package cite SURVEY.md sections
(the operator contract) instead of reference ``file:line``.

Design principles (SURVEY.md §4, 100 TB mandate):
- Everything is a DataFrame; the logical plan is declared with the
  DataFrame/SQL API and Catalyst+AQE pick the physical strategy.
- No driver-side collects inside operators; no unbounded crossJoin;
  broadcast hints for dimension tables; salting helper for skew.
- Python UDFs only where built-ins cannot express the semantics, and
  then Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
"""

from .registry import REGISTRY, QueryDef, load_all
from .session import get_spark, tune

__all__ = ["REGISTRY", "QueryDef", "load_all", "get_spark", "tune"]
__version__ = "0.1.0"
