"""External connector wiring: Kafka source/sink, Avro serde, and
S3A object-store configuration (SURVEY.md §2.1 S3-S5, S10).

The reference moves events producer -> Kafka (Avro + Schema Registry)
-> Kafka Connect -> ClickHouse (``producer/producer.py:100-105``,
``producer/schema_registry.py:13-30``,
``kafka/clickhouse_connector_configuration.json``). In Spark all of
that is reader/writer configuration on ONE engine: this module builds
those readers/writers.

This container ships neither a Kafka broker nor the ``spark-avro`` /
``spark-sql-kafka`` packages (both are add-on jars, not part of the
pyspark wheel), so every entry point degrades with an actionable
error instead of a py4j stack trace. The wiring itself — option
names, schema contract, from_avro/from_json placement, checkpointed
writeStream shape — is the production layout and is unit-tested to
the degradation boundary.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.streaming.pipeline import EVENT_SCHEMA

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13"
AVRO_PACKAGE = "org.apache.spark:spark-avro_2.13"

# The canonical event schema as an Avro record, kept in lockstep with
# EVENT_SCHEMA (the reference's user_event_schema.avsc analog).
EVENT_AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "UserEvent",
        "fields": [
            {"name": "event_id", "type": "string"},
            {"name": "user_id", "type": "string"},
            {"name": "session_id", "type": "string"},
            {"name": "event_type", "type": "string"},
            {
                "name": "event_timestamp",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "request_latency_ms", "type": "int"},
            {"name": "status", "type": "string"},
            {"name": "error_code", "type": ["null", "int"], "default": None},
            {"name": "product_id", "type": ["null", "int"], "default": None},
        ],
    }
)


class ConnectorUnavailable(RuntimeError):
    """Raised when an optional connector jar isn't on the classpath."""


def _require(spark: SparkSession, cls: str, package: str, what: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
    except Exception as exc:
        raise ConnectorUnavailable(
            f"{what} needs the {package} package on the Spark classpath "
            f"(submit with --packages {package}); not bundled in pyspark"
        ) from exc


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "user_interactions",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    value_format: str = "json",
) -> DataFrame:
    """Streaming Kafka source -> typed event columns.

    The reference's broker/topic/backpressure knobs map 1:1:
    6-partition topic (parallelism) -> Spark reads one task per
    partition; ``maxOffsetsPerTrigger`` is the backpressure bound
    (T8). Value decoding: 'json' uses from_json against EVENT_SCHEMA;
    'avro' uses from_avro against EVENT_AVRO_SCHEMA (schema-registry
    wire format needs the 5-byte header stripped: substring(value, 6)).
    """
    _require(
        spark,
        "org.apache.spark.sql.kafka010.KafkaSourceProvider",
        KAFKA_PACKAGE,
        "Kafka source",
    )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    if value_format == "avro":
        _require(
            spark,
            "org.apache.spark.sql.avro.AvroDataToCatalyst",
            AVRO_PACKAGE,
            "Avro deserialization",
        )
        from pyspark.sql.avro.functions import from_avro

        # Confluent wire format: magic byte + 4-byte schema id, then avro
        payload = from_avro(F.expr("substring(value, 6)"), EVENT_AVRO_SCHEMA)
    else:
        payload = F.from_json(F.col("value").cast("string"), EVENT_SCHEMA)
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"), payload.alias("e")
    ).select("kafka_key", "e.*")


def write_kafka_events(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str = "user_interactions",
    checkpoint_path: str | None = None,
):
    """Kafka sink (batch or streaming): key = user_id (the reference's
    per-user ordering contract), value = JSON of the full event, snappy
    compression (``producer/config.py:29-37``)."""
    spark = events.sparkSession
    _require(
        spark,
        "org.apache.spark.sql.kafka010.KafkaSourceProvider",
        KAFKA_PACKAGE,
        "Kafka sink",
    )
    keyed = events.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct(*events.columns)).alias("value"),
    )
    common = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "kafka.compression.type": "snappy",
    }
    if events.isStreaming:
        writer = keyed.writeStream.format("kafka").options(**common)
        if checkpoint_path:
            writer = writer.option("checkpointLocation", checkpoint_path)
        return writer.start()
    return keyed.write.format("kafka").options(**common).save()


def s3a_conf(
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
    ssl: bool | None = None,
) -> dict[str, str]:
    """The s3a configuration block the reference injects per spark-submit
    (``airflow/dags/pipeline.py:188-194``), as a conf dict for
    ``get_spark(extra_conf=...)``. MinIO needs path-style access.

    SSL defaults from the endpoint scheme (an ``https://`` endpoint —
    or a bare host, which s3a treats as https — keeps SSL on) so
    credentials never travel plaintext unless the caller explicitly
    opted into an ``http://`` endpoint or passed ``ssl=False``."""
    if ssl is None:
        ssl = not endpoint.startswith("http://")
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(ssl).lower(),
    }
