"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference pipeline's
per-event-type SUCCESS/ERROR pivot — ``airflow/dags/spark.py:17-46`` —
re-expressed over the driver ``events`` table) at sf0.001.

``queries()`` / ``oracle_sql()`` expose the full operator registry;
every operator module in ``end2end_data_pipeline_spark/operators/``
registers its queries + DuckDB oracle SQL on import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import end2end_data_pipeline_spark.operators  # noqa: F401  (registers queries)
from end2end_data_pipeline_spark.registry import ORACLE, QUERIES

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["event_status_pivot"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted entries get the
    driver's weaker rows-only check)."""
    return dict(ORACLE)
