"""Interchange formats beyond parquet: JSON-lines, CSV, ORC.

The reference's interchange surface is Avro-over-Kafka plus JSON
reports (``producer/schema_registry.py``, ``airflow/dags/spark.py``);
a drop-in engine must also bulk-load the landing formats raw event
feeds actually arrive in. Each round-trip here is schema-explicit
(never ``inferSchema`` — a schema inference pass reads the data twice
and can silently widen types between runs) and is verified
row-identical to the parquet source in ``tests/test_formats.py``.

Scale notes: all three writers/readers are distributed (one file per
partition, no driver funnel). JSON/CSV are row-major text — fine as
INGEST formats, 5-20x larger and column-prune-blind vs parquet, so
the warehouse layer always re-materializes to parquet
(``generator.py:write_warehouse``). ORC is the columnar alternative
kept for interop with Hive-era lakes; Spark reads/writes it natively.
Timestamps are written as ISO-8601 strings in text formats (the only
representation that round-trips microseconds engine-portably).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# events interchange schema: ts carried as ISO-8601 micros string in
# text formats, restored to TimestampNTZ on read
EVENTS_TEXT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", StringType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _stringify_ts(events: DataFrame) -> DataFrame:
    return events.withColumn("ts", F.date_format("ts", _TS_FMT))


def _restore_ts(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "ts", F.to_timestamp("ts", _TS_FMT).cast(TimestampNTZType())
    )


def write_events_jsonl(events: DataFrame, path: str) -> None:
    """Events as JSON-lines (the raw-feed landing format)."""
    _stringify_ts(events).write.mode("overwrite").json(path)


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return _restore_ts(spark.read.schema(EVENTS_TEXT_SCHEMA).json(path))


def write_events_csv(events: DataFrame, path: str) -> None:
    """Events as headered CSV. ``props`` holds JSON — quote/escape set
    so embedded commas, quotes, and newlines survive the round trip."""
    _stringify_ts(events).write.mode("overwrite").option("header", True).option(
        "quote", '"'
    ).option("escape", '"').csv(path)


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    return _restore_ts(
        spark.read.schema(EVENTS_TEXT_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_events_orc(events: DataFrame, path: str) -> None:
    """Events as ORC (columnar interop with Hive-era lakes); native
    types, no string shim needed."""
    events.write.mode("overwrite").orc(path)


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
