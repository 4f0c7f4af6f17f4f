"""Connector wiring tests up to the degradation boundary (no Kafka
broker or spark-sql-kafka/spark-avro jars in this container), plus
portable-hash property tests backing the oracle-exact hash machinery."""

from __future__ import annotations

import hashlib
import json

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from end2end_data_pipeline_spark.functions import texthash as th
from end2end_data_pipeline_spark.sources.connectors import (
    EVENT_AVRO_SCHEMA,
    ConnectorUnavailable,
    read_kafka_events,
    s3a_conf,
    write_kafka_events,
)
from end2end_data_pipeline_spark.streaming.pipeline import EVENT_SCHEMA


def test_kafka_source_degrades_actionably(spark):
    with pytest.raises(ConnectorUnavailable, match="--packages"):
        read_kafka_events(spark, "localhost:9092")


def test_kafka_sink_degrades_actionably(spark):
    df = spark.createDataFrame([], EVENT_SCHEMA)
    with pytest.raises(ConnectorUnavailable, match="--packages"):
        write_kafka_events(df, "localhost:9092")


def test_avro_schema_matches_struct_schema():
    """The Avro record and the engine StructType must stay in lockstep
    (the reference kept three hand-synced schema copies; we keep two,
    machine-checked)."""
    avro = json.loads(EVENT_AVRO_SCHEMA)
    avro_fields = [f["name"] for f in avro["fields"]]
    assert avro_fields == [f.name for f in EVENT_SCHEMA.fields]
    nullable_avro = {
        f["name"] for f in avro["fields"] if isinstance(f["type"], list)
    }
    nullable_struct = {f.name for f in EVENT_SCHEMA.fields if f.nullable}
    assert nullable_avro == nullable_struct


def test_s3a_conf_shape():
    conf = s3a_conf("http://minio:9000", "ak", "sk")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"


# --- portable hash property tests -----------------------------------

# text strategy limited to printable-ish content without quotes so the
# inline-SQL probe stays valid; the engine only ever hashes tokens
# already split from parquet strings.
_token = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters="'\\"),
    min_size=0,
    max_size=40,
)


@settings(max_examples=50, deadline=None)
@given(_token)
def test_md5h_python_duckdb_agree(s: str):
    """The portable 60-bit hash is identical in python (reference
    implementation for literals) and DuckDB (oracle dialect)."""
    expected = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    literal = "'" + s + "'"
    got = duckdb.execute("SELECT " + th.md5h(literal, th.DUCK)).fetchone()[0]
    assert got == expected


def test_md5h_spark_duckdb_agree(spark):
    """Same property through Spark's dialect, on a sampled batch (one
    JVM round-trip instead of 50)."""
    samples = ["", "hello", "a b c", "Ünïcode", "123", ":", "x" * 100]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = {
        r.t: r.h
        for r in df.selectExpr("t", f"{th.md5h('t', th.SPARK)} AS h").collect()
    }
    for s in samples:
        assert got[s] == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
