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


# ---------------------------------------------------------------------
# Pure-Python Avro serde over DataFrames (degraded path for S4/S5).
#
# Production path: JVM from_avro/to_avro (read_kafka_events above).
# When the spark-avro jar is absent — this container — the schema
# contract still has to be EXECUTABLE, not just declared, so these two
# functions run the same Confluent-framed Avro binary serde through
# sources/avro_min.py inside Arrow-batched mapInPandas. Per-batch cost
# is pure-Python byte assembly; acceptable for the degraded/test tier,
# and the call sites swap to from_avro/to_avro unchanged when the jar
# is present.

_EVENT_WIRE_SCHEMA = "key string, value binary"


def _avro_schema_dict() -> dict:
    return json.loads(EVENT_AVRO_SCHEMA)


def encode_events_avro_py(events: DataFrame, schema_id: int = 1) -> DataFrame:
    """events (EVENT_SCHEMA) -> Kafka-shaped frames: key = user_id,
    value = Confluent-framed Avro binary (magic 0 + BE schema id)."""
    from end2end_data_pipeline_spark.sources import avro_min

    schema = _avro_schema_dict()

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            ts_ms = (
                pd.to_datetime(pdf["event_timestamp"])
                .astype("datetime64[ms]")
                .astype("int64")
            )
            values = []
            for i in range(len(pdf)):
                rec = {
                    "event_id": pdf["event_id"].iat[i],
                    "user_id": pdf["user_id"].iat[i],
                    "session_id": pdf["session_id"].iat[i],
                    "event_type": pdf["event_type"].iat[i],
                    "event_timestamp": int(ts_ms.iat[i]),
                    "request_latency_ms": int(pdf["request_latency_ms"].iat[i]),
                    "status": pdf["status"].iat[i],
                    "error_code": None
                    if pd.isna(pdf["error_code"].iat[i])
                    else int(pdf["error_code"].iat[i]),
                    "product_id": None
                    if pd.isna(pdf["product_id"].iat[i])
                    else int(pdf["product_id"].iat[i]),
                }
                values.append(
                    avro_min.frame(schema_id, avro_min.encode(schema, rec))
                )
            yield pd.DataFrame(
                {"key": pdf["user_id"].astype(str), "value": values}
            )

    return events.mapInPandas(enc, schema=_EVENT_WIRE_SCHEMA)


def decode_events_avro_py(
    frames: DataFrame, writer_schemas: dict[int, object] | None = None
) -> DataFrame:
    """Kafka-shaped frames (binary ``value``) -> typed EVENT_SCHEMA
    rows; the Python analog of from_avro(substring(value, 6)).

    ``writer_schemas`` maps frame schema ids -> the Avro schema those
    producers wrote with (a registry snapshot). When a frame's id is
    present, the body is decoded via spec schema resolution against
    the current EVENT_AVRO_SCHEMA reader — so topics carrying frames
    from older producer fleets (dropped/renamed/promoted fields) land
    in today's warehouse shape. Ids not in the map (or no map at all)
    assume the current schema, matching the JVM from_avro behavior."""
    from end2end_data_pipeline_spark.sources import avro_min

    schema = _avro_schema_dict()
    writers = {
        sid: avro_min._schema(ws) for sid, ws in (writer_schemas or {}).items()
    }

    def dec(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for payload in pdf["value"]:
                schema_id, body = avro_min.unframe(bytes(payload))
                writer = writers.get(schema_id)
                if writer is not None:
                    rec = avro_min.decode_resolved(writer, schema, body)
                else:
                    rec = avro_min.decode(schema, body)
                rec["event_timestamp"] = pd.Timestamp(
                    rec["event_timestamp"], unit="ms"
                )
                recs.append(rec)
            out = pd.DataFrame(
                recs,
                columns=[f.name for f in EVENT_SCHEMA.fields],
            )
            out["error_code"] = out["error_code"].astype("Int32")
            out["product_id"] = out["product_id"].astype("Int32")
            yield out

    return frames.mapInPandas(dec, schema=EVENT_SCHEMA)


DLQ_SCHEMA = ", ".join(
    [f"{f.name} {f.dataType.simpleString()}" for f in EVENT_SCHEMA.fields]
    + ["corrupt_payload binary", "corrupt_reason string"]
)


def decode_events_avro_dlq(
    frames: DataFrame, writer_schemas: dict[int, object] | None = None
) -> DataFrame:
    """Decode with dead-letter routing: frames that fail framing or
    Avro decoding land with null event fields and the raw payload +
    reason in ``corrupt_payload``/``corrupt_reason`` instead of
    killing the task (the from_json PERMISSIVE/_corrupt_record idiom,
    applied to the binary serde tier). No row is ever dropped: callers
    split on ``corrupt_payload IS NULL`` and sink the bad side to a
    quarantine table. Works identically on batch and streaming frames."""
    from end2end_data_pipeline_spark.sources import avro_min

    schema = _avro_schema_dict()
    writers = {
        sid: avro_min._schema(ws) for sid, ws in (writer_schemas or {}).items()
    }
    names = [f.name for f in EVENT_SCHEMA.fields]

    def dec(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for payload in pdf["value"]:
                raw = bytes(payload)
                try:
                    schema_id, body = avro_min.unframe(raw)
                    writer = writers.get(schema_id)
                    if writer is not None:
                        rec = avro_min.decode_resolved(writer, schema, body)
                    else:
                        rec = avro_min.decode(schema, body)
                    rec["event_timestamp"] = pd.Timestamp(
                        rec["event_timestamp"], unit="ms"
                    )
                    rec["corrupt_payload"] = None
                    rec["corrupt_reason"] = None
                except (ValueError, KeyError, UnicodeDecodeError) as exc:
                    rec = dict.fromkeys(names)
                    rec["corrupt_payload"] = raw
                    rec["corrupt_reason"] = f"{type(exc).__name__}: {exc}"
                recs.append(rec)
            out = pd.DataFrame(recs, columns=[*names, "corrupt_payload", "corrupt_reason"])
            out["error_code"] = out["error_code"].astype("Int32")
            out["product_id"] = out["product_id"].astype("Int32")
            out["request_latency_ms"] = out["request_latency_ms"].astype("Int32")
            yield out

    return frames.mapInPandas(dec, schema=DLQ_SCHEMA)
