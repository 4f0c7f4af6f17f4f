"""end2end_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference pipeline
(Xadra-T/End2End-Data-Pipeline): the reference's 5-service topology
(producer -> Kafka -> Kafka Connect -> ClickHouse -> Airflow+Spark ->
dashboard) collapses into one engine with three layers:

1. batch relational analytics on partitioned Parquet (``operators/``),
2. Structured Streaming for the ingest/window path (``streaming/``),
3. a thin report/presentation shim (``plans/report.py``).

Everything is declared through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, partition pruning, join selection
and whole-stage codegen; there are zero custom Catalyst rules and no
row-at-a-time Python UDFs in hot paths.

Designed for 100 TB scale: AQE on by default, broadcast joins for dim
tables, LSH instead of quadratic similarity, no driver-side collect()
outside O(k) report shims.
"""

__version__ = "0.1.0"

from end2end_data_pipeline_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
