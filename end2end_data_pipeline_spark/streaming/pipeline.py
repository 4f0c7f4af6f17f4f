"""Structured Streaming ingest + minutely analytics — the native
replacement for the reference's Kafka -> Kafka Connect -> ClickHouse ->
minutely Airflow DAG topology (SURVEY.md §2.7, §3).

The reference implements streaming as micro-batch-by-scheduler: a cron
DAG closes a 1-minute tumbling window one minute after the fact and a
row arriving later than that is silently never analyzed (T3 — its
late-data hole). Here the same semantics are one always-on query:

    file/kafka source -> withWatermark -> window(1 min) agg ->
    sink (parquet/memory), checkpointed

with late data handled by the watermark instead of a race, and
exactly-once-per-sink guaranteed by checkpoint + idempotent sink (T7
— the reference is only at-least-once into ClickHouse).

``trigger(availableNow=True)`` gives deterministic drain-the-source
runs for tests and batch parity checks; a production deployment swaps
the trigger for ``processingTime='1 minute'`` (T4) without touching
the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Canonical event schema (SURVEY.md §1.2) — file streams require an
# explicit schema; this is the engine's single source of truth.
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("user_id", StringType(), False),
        StructField("session_id", StringType(), False),
        StructField("event_type", StringType(), False),
        StructField("event_timestamp", TimestampType(), False),
        StructField("request_latency_ms", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("error_code", IntegerType(), True),
        StructField("product_id", IntegerType(), True),
    ]
)

DEFAULT_WATERMARK = "2 minutes"


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream (the Kafka-topic analog; swapping in
    ``format('kafka')`` + ``from_avro`` changes only this function).
    ``maxFilesPerTrigger`` is the backpressure knob (T8 — the
    reference's producer poll/backoff)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def minutely_status_counts(
    events: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """The reference's minutely analysis as an event-time windowed
    aggregation (T1/T2): counts per (minute window, event_type,
    status). Works identically on batch and streaming DataFrames —
    the batch form is the oracle for the streaming form."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("event_timestamp", watermark)
    return (
        src.groupBy(
            F.window("event_timestamp", "1 minute").alias("w"),
            "event_type",
            "status",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("event_minute"),
            "event_type",
            "status",
            "n",
        )
    )


def start_minutely_aggregation(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    watermark: str = DEFAULT_WATERMARK,
    available_now: bool = True,
) -> StreamingQuery:
    """End-to-end ingest->aggregate->sink stream with exactly-once
    sink semantics via checkpointing. Append output mode: a window is
    emitted once, when the watermark passes it — the streaming
    equivalent of the reference's close-the-minute-then-extract."""
    events = read_event_stream(spark, source_path)
    agg = minutely_status_counts(events, watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()


def dedup_event_stream(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """At-least-once -> effectively-once repair (T7): drop duplicate
    event_ids within the watermark horizon. State is bounded by the
    watermark — safe for unbounded streams."""
    return events.withWatermark("event_timestamp", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session-window analytics over the stream (T6): per-user session
    event counts with a gap-based session definition — the analysis the
    reference's data supports but its pipeline never runs."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("event_timestamp", DEFAULT_WATERMARK)
    return (
        src.groupBy(F.session_window("event_timestamp", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def publish_minutely_reports(
    spark: SparkSession,
    source_path: str,
    checkpoint_path: str,
    publish,
    watermark: str = DEFAULT_WATERMARK,
    available_now: bool = True,
) -> StreamingQuery:
    """The reference's report loop — aggregate the closed minute, build
    the JSON report, POST it (``airflow/dags/pipeline.py:205-245``) —
    as ONE streaming query with a ``foreachBatch`` publisher.

    Append mode + watermark means each micro-batch delivers only
    finalized windows; ``publish(report_dict)`` is invoked once per
    closed minute with the reference's exact report shape. The
    callback is the REST/object-store boundary (out of engine scope) —
    tests pass a list-appender, production passes ``requests.post``.
    Exactly-once: foreachBatch replays are keyed by batch id in the
    checkpoint; a publisher needing strict idempotence can dedupe on
    ``file_name``.
    """
    from end2end_data_pipeline_spark.plans.report import status_pivot_report

    events = read_event_stream(spark, source_path)
    agg = minutely_status_counts(events, watermark)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        # one tiny aggregate per closed window; collect is O(#windows x #types)
        for minute_row in (
            batch_df.select("event_minute").distinct().orderBy("event_minute").collect()
        ):
            minute = minute_row["event_minute"]
            window_counts = batch_df.where(F.col("event_minute") == minute)
            # rebuild the pivot shape from the already-aggregated counts
            rows = (
                window_counts.groupBy("event_type")
                .pivot("status", ["ERROR", "SUCCESS"])
                .sum("n")
                .na.fill(0, ["ERROR", "SUCCESS"])
                .orderBy("event_type")
                .collect()
            )
            by_type = {
                r["event_type"]: {"SUCCESS": r["SUCCESS"], "ERROR": r["ERROR"]}
                for r in rows
            }
            publish(
                {
                    "report": {
                        "total_events": sum(
                            v["SUCCESS"] + v["ERROR"] for v in by_type.values()
                        ),
                        "total_errors": sum(v["ERROR"] for v in by_type.values()),
                        "by_event_type": by_type,
                        "file_name": minute.strftime("%Y-%m-%d_%H-%M") + ".json",
                    }
                }
            )

    writer = (
        agg.writeStream.outputMode("append")
        .foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()
