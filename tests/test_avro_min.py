"""Pure-stdlib Avro serde (sources/avro_min.py): spec test vectors,
property roundtrips, canonical-form fingerprints, and the Spark
DataFrame encode->decode identity that makes the S4 schema contract
executable without the spark-avro jar."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.sources import avro_min
from end2end_data_pipeline_spark.sources.connectors import (
    EVENT_AVRO_SCHEMA,
    decode_events_avro_py,
    encode_events_avro_py,
)
from end2end_data_pipeline_spark.sources.generator import generate_events
from end2end_data_pipeline_spark.streaming.pipeline import EVENT_SCHEMA

# ------------------------------------------------ spec binary vectors
# Every literal below is copied from the Avro 1.11 specification's
# "Binary encoding" examples — independent ground truth, not
# roundtrip-only self-consistency.


def test_zigzag_int_spec_vectors():
    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for value, expected in vectors.items():
        assert avro_min.encode("int", value) == expected
        assert avro_min.encode("long", value) == expected
        assert avro_min.decode("long", expected) == value


def test_string_spec_vector():
    assert avro_min.encode("string", "foo") == b"\x06foo"
    assert avro_min.decode("string", b"\x06foo") == "foo"


def test_array_spec_vector():
    schema = {"type": "array", "items": "long"}
    assert avro_min.encode(schema, [3, 27]) == b"\x04\x06\x36\x00"
    assert avro_min.decode(schema, b"\x04\x06\x36\x00") == [3, 27]


def test_union_null_string_spec_vectors():
    schema = ["null", "string"]
    assert avro_min.encode(schema, None) == b"\x00"
    assert avro_min.encode(schema, "a") == b"\x02\x02a"
    assert avro_min.decode(schema, b"\x02\x02a") == "a"


def test_record_fields_concatenate_in_order():
    schema = {
        "type": "record",
        "name": "Test",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    assert avro_min.encode(schema, {"a": 27, "b": "foo"}) == b"\x36\x06foo"


def test_decode_rejects_truncation_and_trailing_bytes():
    import pytest

    with pytest.raises(ValueError):
        avro_min.decode("string", b"\x06fo")  # length says 3, body has 2
    with pytest.raises(ValueError):
        avro_min.decode("long", b"\x36\x00")  # trailing garbage


# ------------------------------------------------- property roundtrips

EVENT_STRATEGY = st.fixed_dictionaries(
    {
        "event_id": st.text(max_size=40),
        "user_id": st.text(max_size=40),
        "session_id": st.text(max_size=40),
        "event_type": st.sampled_from(["LOGIN", "VIEW_PRODUCT", "LOGOUT"]),
        "event_timestamp": st.integers(min_value=0, max_value=2**62),
        "request_latency_ms": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "status": st.sampled_from(["SUCCESS", "ERROR"]),
        "error_code": st.one_of(st.none(), st.integers(400, 599)),
        "product_id": st.one_of(st.none(), st.integers(1, 10_000)),
    }
)


@settings(max_examples=200, deadline=None)
@given(EVENT_STRATEGY)
def test_event_record_roundtrip(rec):
    schema = json.loads(EVENT_AVRO_SCHEMA)
    assert avro_min.decode(schema, avro_min.encode(schema, rec)) == rec


NESTED = {
    "type": "record",
    "name": "Nested",
    "fields": [
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": ["null", "long"]}},
        {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        {"name": "blob", "type": "bytes"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
    ],
}


@settings(max_examples=100, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "tags": st.lists(st.text(max_size=10), max_size=5),
            "attrs": st.dictionaries(
                st.text(max_size=8),
                st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
                max_size=5,
            ),
            "kind": st.sampled_from(["A", "B"]),
            "blob": st.binary(max_size=32),
            "score": st.floats(allow_nan=False),
            "flag": st.booleans(),
        }
    )
)
def test_nested_composite_roundtrip(rec):
    assert avro_min.decode(NESTED, avro_min.encode(NESTED, rec)) == rec


# --------------------------------------- canonical form + fingerprint


def test_canonical_form_normalizes_noise():
    """PCF strips docs/defaults/whitespace, resolves namespaces, and
    orders keys — equivalent schemas must render identically."""
    noisy = {
        "namespace": "com.example",
        "doc": "noise",
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "x", "type": "int", "doc": "n", "default": 0},
        ],
    }
    tidy = {
        "type": "record",
        "name": "com.example.E",
        "fields": [{"name": "x", "type": "int"}],
    }
    assert avro_min.canonical_form(noisy) == avro_min.canonical_form(tidy)
    assert avro_min.rabin_fingerprint(noisy) == avro_min.rabin_fingerprint(tidy)


def test_fingerprint_distinguishes_field_rename_and_type_change():
    base = json.loads(EVENT_AVRO_SCHEMA)
    renamed = json.loads(EVENT_AVRO_SCHEMA)
    renamed["fields"][0]["name"] = "evt_id"
    widened = json.loads(EVENT_AVRO_SCHEMA)
    widened["fields"][5]["type"] = "long"
    fps = {avro_min.rabin_fingerprint(s) for s in (base, renamed, widened)}
    assert len(fps) == 3


def test_local_registry_frames_and_resolves():
    reg = avro_min.LocalSchemaRegistry()
    sid = reg.register(EVENT_AVRO_SCHEMA)
    assert reg.register(EVENT_AVRO_SCHEMA) == sid  # idempotent
    rec = {
        "event_id": "e1",
        "user_id": "u1",
        "session_id": "s1",
        "event_type": "LOGIN",
        "event_timestamp": 1_700_000_000_000,
        "request_latency_ms": 12,
        "status": "SUCCESS",
        "error_code": None,
        "product_id": None,
    }
    payload = reg.serialize(sid, rec)
    assert payload[0] == 0 and payload[1:5] == sid.to_bytes(4, "big")
    assert reg.deserialize(payload) == rec
    got_id, body = avro_min.unframe(payload)
    assert got_id == sid
    assert avro_min.decode(reg.schema_for(sid), body) == rec


# --------------------------------------------- Spark DataFrame serde


def test_spark_events_avro_roundtrip(spark):
    """generate -> Confluent-framed Avro frames -> decode == identity;
    the executable proof of the S4 schema contract (degraded path)."""
    events = generate_events(spark, 500, n_users=40, num_partitions=4).select(
        *[f.name for f in EVENT_SCHEMA.fields]
    )
    frames = encode_events_avro_py(events, schema_id=7)
    assert frames.schema.simpleString() == "struct<key:string,value:binary>"
    decoded = decode_events_avro_py(frames)
    assert decoded.schema == EVENT_SCHEMA

    orig = sorted(map(tuple, events.collect()))
    back = sorted(map(tuple, decoded.collect()))
    assert back == orig

    # key contract: Kafka partition key is user_id (per-user ordering)
    keyed = frames.select("key").distinct().count()
    users = events.select("user_id").distinct().count()
    assert keyed == users

    # wire framing matches the JVM reader's substring(value, 6) strip
    one = frames.select("value").first()[0]
    assert one[0] == 0 and int.from_bytes(one[1:5], "big") == 7


def test_spark_avro_frames_survive_parquet_hop(spark, tmp_path):
    """Frames written to the warehouse as binary survive byte-exact —
    the Kafka->warehouse S5 analog's storage leg."""
    events = generate_events(spark, 120, n_users=10, num_partitions=2).select(
        *[f.name for f in EVENT_SCHEMA.fields]
    )
    path = str(tmp_path / "frames")
    encode_events_avro_py(events).write.parquet(path)
    decoded = decode_events_avro_py(spark.read.parquet(path))
    assert decoded.count() == 120
    assert sorted(map(tuple, decoded.collect())) == sorted(
        map(tuple, events.collect())
    )
    # null contract: conditional-null columns decode as real nulls
    nulls = decoded.where(F.col("error_code").isNull()).count()
    assert 0 < nulls < 120


def test_produce_loop_encodes_in_stream(spark, tmp_path):
    """Producer-side analog (S2/S3): a bounded event stream is encoded
    to Confluent-framed Avro INSIDE the streaming query (the reference
    producer's serialize-then-send loop, ``producer/producer.py:100-105``)
    and landed as Kafka-shaped (key, value) frames; decoding the landed
    frames recovers the source events exactly."""
    from end2end_data_pipeline_spark.streaming.pipeline import read_event_stream

    src = str(tmp_path / "events_src")
    frames_dir = str(tmp_path / "frames_out")
    ckpt = str(tmp_path / "ckpt")
    events = generate_events(spark, 300, n_users=20, num_partitions=2).select(
        *[f.name for f in EVENT_SCHEMA.fields]
    )
    events.write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        encode_events_avro_py(stream, schema_id=3)
        .writeStream.format("parquet")
        .option("path", frames_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    landed = spark.read.parquet(frames_dir)
    assert landed.count() == 300
    decoded = decode_events_avro_py(landed)
    assert sorted(map(tuple, decoded.collect())) == sorted(
        map(tuple, events.collect())
    )


# ------------------------------------------------- schema resolution


V1 = {
    "type": "record",
    "name": "Evt",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "latency", "type": "int"},
        {"name": "error_code", "type": ["null", "int"], "default": None},
        {"name": "debug", "type": "string"},
    ],
}
# v2: drops `debug`, promotes latency int->long, adds defaulted
# `region`, widens error_code's union with a string branch.
V2 = {
    "type": "record",
    "name": "Evt",
    "fields": [
        {"name": "id", "type": "string"},
        {"name": "latency", "type": "long"},
        {"name": "error_code", "type": ["null", "string", "int"], "default": None},
        {"name": "region", "type": "string", "default": "unknown"},
    ],
}


def test_schema_resolution_evolves_producer_v1_to_consumer_v2():
    body = avro_min.encode(
        V1, {"id": "e1", "latency": 12, "error_code": 503, "debug": "x"}
    )
    assert avro_min.decode_resolved(V1, V2, body) == {
        "id": "e1",
        "latency": 12,
        "error_code": 503,
        "region": "unknown",
    }


def test_schema_resolution_null_branch_and_missing_default():
    body = avro_min.encode(
        V1, {"id": "e2", "latency": 1, "error_code": None, "debug": ""}
    )
    out = avro_min.decode_resolved(V1, V2, body)
    assert out["error_code"] is None and out["region"] == "unknown"

    import pytest

    no_default = {
        "type": "record",
        "name": "Evt",
        "fields": [{"name": "brand_new", "type": "string"}],
    }
    with pytest.raises(ValueError, match="no default"):
        avro_min.decode_resolved(V1, no_default, body)


def test_schema_resolution_primitive_promotions():
    assert avro_min.decode_resolved("int", "long", avro_min.encode("int", 7)) == 7
    assert avro_min.decode_resolved("int", "double", avro_min.encode("int", 7)) == 7.0
    assert (
        avro_min.decode_resolved("string", "bytes", avro_min.encode("string", "ab"))
        == b"ab"
    )
    assert (
        avro_min.decode_resolved("bytes", "string", avro_min.encode("bytes", b"ab"))
        == "ab"
    )


def test_schema_resolution_same_schema_is_identity():
    schema = json.loads(EVENT_AVRO_SCHEMA)
    rec = {
        "event_id": "e",
        "user_id": "u",
        "session_id": "s",
        "event_type": "LOGIN",
        "event_timestamp": 1_700_000_000_000,
        "request_latency_ms": 9,
        "status": "SUCCESS",
        "error_code": 500,
        "product_id": None,
    }
    body = avro_min.encode(schema, rec)
    assert avro_min.decode_resolved(schema, schema, body) == rec


@settings(max_examples=100, deadline=None)
@given(EVENT_STRATEGY)
def test_schema_resolution_event_v2_roundtrip_properties(rec):
    """Any v1 event resolves under an evolved reader: ts promoted to
    double ms, latency to long, new defaulted pipeline column added."""
    writer = json.loads(EVENT_AVRO_SCHEMA)
    reader = json.loads(EVENT_AVRO_SCHEMA)
    for f in reader["fields"]:
        if f["name"] == "request_latency_ms":
            f["type"] = "long"
    reader["fields"].append(
        {"name": "ingest_source", "type": "string", "default": "kafka"}
    )
    out = avro_min.decode_resolved(writer, reader, avro_min.encode(writer, rec))
    assert out["ingest_source"] == "kafka"
    assert out["request_latency_ms"] == rec["request_latency_ms"]
    assert {k: out[k] for k in rec} == rec


def test_spark_decode_mixed_writer_generations(spark):
    """A topic carrying frames from two producer generations decodes
    into one warehouse shape: v1 frames (no product_id, extra debug
    field) resolve against today's reader — defaults filled, unknown
    fields skipped — while current frames decode untouched."""
    import datetime as dt

    current = json.loads(EVENT_AVRO_SCHEMA)
    v1 = json.loads(EVENT_AVRO_SCHEMA)
    v1["fields"] = [f for f in v1["fields"] if f["name"] != "product_id"]
    v1["fields"].append({"name": "debug", "type": "string"})

    def v1_frame(i):
        rec = {
            "event_id": f"old-{i}",
            "user_id": "u-old",
            "session_id": "s-old",
            "event_type": "SEARCH",
            "event_timestamp": 1_704_110_400_000 + i * 1000,
            "request_latency_ms": 40 + i,
            "status": "SUCCESS",
            "error_code": None,
            "debug": "legacy",
        }
        return avro_min.frame(1, avro_min.encode(v1, rec))

    def v2_frame(i):
        rec = {
            "event_id": f"new-{i}",
            "user_id": "u-new",
            "session_id": "s-new",
            "event_type": "VIEW_PRODUCT",
            "event_timestamp": 1_704_110_400_000 + i * 1000,
            "request_latency_ms": 10 + i,
            "status": "ERROR",
            "error_code": 500,
            "product_id": 7,
        }
        return avro_min.frame(2, avro_min.encode(current, rec))

    frames = spark.createDataFrame(
        [("u-old", v1_frame(i)) for i in range(5)]
        + [("u-new", v2_frame(i)) for i in range(5)],
        "key string, value binary",
    )
    decoded = decode_events_avro_py(frames, writer_schemas={1: v1})
    assert decoded.schema == EVENT_SCHEMA
    rows = {r.event_id: r for r in decoded.collect()}
    assert len(rows) == 10
    assert rows["old-0"].product_id is None  # reader default filled
    assert rows["old-0"].request_latency_ms == 40
    assert "debug" not in decoded.columns  # writer-only field skipped
    assert rows["new-0"].product_id == 7
    assert rows["new-0"].error_code == 500
    assert rows["old-3"].event_timestamp == dt.datetime(2024, 1, 1, 12, 0, 3)


def test_spark_decode_dead_letter_routing(spark):
    """Corrupt payloads (bad magic, truncation, garbage) are routed to
    the quarantine columns instead of killing the task; every input
    row is accounted for on exactly one side of the split."""
    from end2end_data_pipeline_spark.sources.connectors import (
        decode_events_avro_dlq,
    )

    events = generate_events(spark, 60, n_users=8, num_partitions=2).select(
        *[f.name for f in EVENT_SCHEMA.fields]
    )
    good = encode_events_avro_py(events)
    bad = spark.createDataFrame(
        [
            ("k1", b"\x01" + b"\x00" * 8),  # wrong magic byte
            ("k2", b"\x00\x00\x00\x00\x07\x06fo"),  # truncated body
            ("k3", b""),  # empty payload
        ],
        "key string, value binary",
    )
    decoded = decode_events_avro_dlq(good.union(bad))
    ok = decoded.where(F.col("corrupt_payload").isNull())
    dlq = decoded.where(F.col("corrupt_payload").isNotNull())
    assert ok.count() == 60 and dlq.count() == 3
    assert sorted(
        map(tuple, ok.select(*[f.name for f in EVENT_SCHEMA.fields]).collect())
    ) == sorted(map(tuple, events.collect()))
    reasons = [r.corrupt_reason for r in dlq.collect()]
    assert all(r and r.startswith("ValueError") for r in reasons)
    payloads = {bytes(r.corrupt_payload) for r in dlq.collect()}
    assert b"" in payloads and b"\x00\x00\x00\x00\x07\x06fo" in payloads


# --------------------------------------------- compatibility checking


def test_can_read_and_compat_modes():
    v1 = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "text", "type": "string"},
        ],
    }
    add_default = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": "string", "default": "und"},
        ],
    }
    add_required = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": "string"},
        ],
    }
    promote = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "text", "type": "string"},
        ],
    }
    assert avro_min.can_read(v1, add_default) == []
    assert avro_min.can_read(v1, add_required) != []  # no default
    assert avro_min.can_read(v1, promote) == []  # int -> long
    assert avro_min.can_read(promote, v1) != []  # long !-> int

    assert avro_min.check_compatibility(v1, add_default, "FULL") == []
    assert avro_min.check_compatibility(v1, promote, "BACKWARD") == []
    forward = avro_min.check_compatibility(v1, promote, "FORWARD")
    assert forward and forward[0].startswith("FORWARD")
    # widening a union is BACKWARD-safe, FORWARD-unsafe
    widen = dict(v1, fields=[
        {"name": "id", "type": ["null", "int"], "default": None},
        {"name": "text", "type": "string"},
    ])
    assert avro_min.check_compatibility(v1, widen, "BACKWARD") == []
    assert avro_min.check_compatibility(v1, widen, "FORWARD") != []


def test_registry_enforces_compatibility_on_register():
    import pytest

    v1 = {
        "type": "record",
        "name": "Doc",
        "fields": [{"name": "id", "type": "int"}],
    }
    good = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "lang", "type": "string", "default": "und"},
        ],
    }
    bad = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "lang", "type": "string"},
        ],
    }
    reg = avro_min.LocalSchemaRegistry(compatibility="BACKWARD")
    assert reg.register(v1) == 1
    with pytest.raises(ValueError, match="BACKWARD"):
        reg.register(bad)
    assert reg.register(good) == 2
    assert reg.register(v1) == 1  # re-register of an old version is a no-op


# ------------------------------- schema-randomized property coverage

_PRIM_STRATS = {
    "boolean": st.booleans(),
    "int": st.integers(-(2**31), 2**31 - 1),
    "long": st.integers(-(2**63), 2**63 - 1),
    "float": st.floats(allow_nan=False, width=32),
    "double": st.floats(allow_nan=False),
    "bytes": st.binary(max_size=16),
    "string": st.text(max_size=16),
}

_counter = iter(range(10**9))


def _schemas(depth=2):
    prim = st.sampled_from(list(_PRIM_STRATS))
    if depth == 0:
        return prim
    sub = _schemas(depth - 1)
    return st.one_of(
        prim,
        st.builds(lambda t: ["null", t], prim),
        st.builds(lambda s: {"type": "array", "items": s}, sub),
        st.builds(lambda s: {"type": "map", "values": s}, sub),
        st.builds(
            lambda types: {
                "type": "record",
                "name": f"R{next(_counter)}",
                "fields": [
                    {"name": f"f{i}", "type": t} for i, t in enumerate(types)
                ],
            },
            st.lists(sub, min_size=1, max_size=4),
        ),
    )


def _value_for(schema):
    if isinstance(schema, str):
        return _PRIM_STRATS[schema]
    if isinstance(schema, list):
        return st.one_of(st.none(), *[_value_for(b) for b in schema if b != "null"])
    t = schema["type"]
    if t in _PRIM_STRATS:
        return _PRIM_STRATS[t]
    if t == "array":
        return st.lists(_value_for(schema["items"]), max_size=4)
    if t == "map":
        return st.dictionaries(
            st.text(max_size=8), _value_for(schema["values"]), max_size=4
        )
    if t == "record":
        return st.fixed_dictionaries(
            {f["name"]: _value_for(f["type"]) for f in schema["fields"]}
        )
    raise AssertionError(t)


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_random_schema_roundtrip_and_self_resolution(data):
    """For ANY generated (schema, conforming value): encode->decode is
    identity, decode_resolved(schema, schema, .) agrees, and the
    canonical fingerprint is stable across re-parses."""
    schema = data.draw(_schemas())
    value = data.draw(_value_for(schema))
    body = avro_min.encode(schema, value)
    assert avro_min.decode(schema, body) == value
    assert avro_min.decode_resolved(schema, schema, body) == value
    reparsed = json.loads(json.dumps(schema))
    assert avro_min.rabin_fingerprint(reparsed) == avro_min.rabin_fingerprint(
        schema
    )
