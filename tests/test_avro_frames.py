"""Generic DataFrame <-> Avro frames (sources/avro_frames.py):
mechanical schema derivation plus lossless roundtrips over the real
fixture tables (including array<float> embeddings) and a kitchen-sink
nested schema."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from end2end_data_pipeline_spark.sources.avro_frames import (
    avro_schema_of,
    decode_df_avro,
    encode_df_avro,
)


def test_avro_schema_derivation_golden():
    struct = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("scores", T.ArrayType(T.FloatType(), False), True),
            T.StructField(
                "meta",
                T.StructType([T.StructField("k", T.StringType(), True)]),
                True,
            ),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    assert avro_schema_of(struct, name="Doc") == {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"], "default": None},
            {
                "name": "scores",
                "type": ["null", {"type": "array", "items": "float"}],
                "default": None,
            },
            {
                "name": "meta",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "meta_rec",
                        "fields": [
                            {
                                "name": "k",
                                "type": ["null", "string"],
                                "default": None,
                            }
                        ],
                    },
                ],
                "default": None,
            },
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
        ],
    }


def _roundtrip(df):
    frames = encode_df_avro(df, schema_id=9)
    assert frames.schema.simpleString() == "struct<value:binary>"
    back = decode_df_avro(frames, df.schema)
    assert back.schema == df.schema
    assert sorted(map(repr, back.collect())) == sorted(map(repr, df.collect()))


def test_documents_table_roundtrip(spark, sf_dir):
    _roundtrip(spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200))


def test_embeddings_table_roundtrip(spark, sf_dir):
    """array<float> vectors survive bit-exact (Avro float is the same
    IEEE binary32 the parquet column stores)."""
    _roundtrip(spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200))


def test_kitchen_sink_roundtrip(spark):
    struct = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            T.StructField(
                "attrs", T.MapType(T.StringType(), T.LongType(), True), True
            ),
            T.StructField(
                "inner",
                T.StructType(
                    [
                        T.StructField("x", T.IntegerType(), True),
                        T.StructField("y", T.DoubleType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    rows = [
        (
            1,
            True,
            b"\x00\xff",
            dt.date(2024, 2, 29),
            dt.datetime(2024, 1, 1, 12, 0, 0, 123456),
            ["a", None, "c"],
            {"k1": 7, "k2": None},
            {"x": 3, "y": 2.5},
        ),
        (2, None, None, None, None, None, None, None),
        (3, False, b"", dt.date(1970, 1, 1), dt.datetime(1969, 12, 31, 23, 59, 59), [], {}, {"x": None, "y": None}),
    ]
    _roundtrip(spark.createDataFrame(rows, struct))
