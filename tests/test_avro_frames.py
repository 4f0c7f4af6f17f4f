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


# ------------------------------------------------------------- OCF


def test_ocf_roundtrip_codecs_and_blocks():
    from end2end_data_pipeline_spark.sources import avro_min

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    records = [{"i": i, "s": f"row-{i}" * 3} for i in range(2500)]
    for codec in ("null", "deflate"):
        blob = avro_min.write_ocf(schema, records, codec=codec, block_records=1000)
        got_schema, got = avro_min.read_ocf(blob)
        assert got == records
        assert got_schema["name"] == "R"
    null_len = len(avro_min.write_ocf(schema, records, codec="null"))
    defl_len = len(avro_min.write_ocf(schema, records, codec="deflate"))
    assert defl_len < null_len / 2  # repetitive rows must compress

    import pytest

    corrupt = bytearray(avro_min.write_ocf(schema, records[:10]))
    corrupt[-1] ^= 0xFF  # clobber the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        avro_min.read_ocf(bytes(corrupt))


def test_spark_ocf_write_read_roundtrip(spark, sf_dir, tmp_path):
    from end2end_data_pipeline_spark.sources.avro_frames import (
        read_avro_ocf,
        write_avro_ocf,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(300)
        .repartition(3)
    )
    out_dir = str(tmp_path / "ocf")
    manifest = write_avro_ocf(docs, out_dir).collect()
    assert len(manifest) == 3
    assert sum(r.records for r in manifest) == 300

    back = read_avro_ocf(spark, out_dir)
    assert back.schema == docs.schema
    assert sorted(map(repr, back.collect())) == sorted(map(repr, docs.collect()))


def test_spark_ocf_honors_writer_timestamp_millis(spark, tmp_path):
    """Foreign OCFs (e.g. written by Java tooling with timestamp-millis)
    must land with correct instants even though this engine writes
    timestamp-micros."""
    from end2end_data_pipeline_spark.sources import avro_min
    from end2end_data_pipeline_spark.sources.avro_frames import read_avro_ocf

    schema = {
        "type": "record",
        "name": "Evt",
        "fields": [
            {"name": "id", "type": "int"},
            {
                "name": "at",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
        ],
    }
    records = [{"id": 1, "at": 1_704_110_400_500}, {"id": 2, "at": 0}]
    path = tmp_path / "foreign.avro"
    path.write_bytes(avro_min.write_ocf(schema, records))

    back = read_avro_ocf(spark, str(tmp_path))
    rows = {r.id: r.at for r in back.collect()}
    assert rows[1] == dt.datetime(2024, 1, 1, 12, 0, 0, 500000)
    assert rows[2] == dt.datetime(1970, 1, 1)
    assert dict(back.dtypes)["at"] == "timestamp"


def test_spark_ocf_mixed_generations_resolve(spark, tmp_path):
    """A directory holding v1 and v2 files reads into one shape when a
    reader schema is passed; without it, drift fails loudly."""
    import pytest

    from end2end_data_pipeline_spark.sources import avro_min
    from end2end_data_pipeline_spark.sources.avro_frames import read_avro_ocf

    v1 = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "text", "type": "string"},
        ],
    }
    v2 = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": "string", "default": "und"},
        ],
    }
    (tmp_path / "a.avro").write_bytes(
        avro_min.write_ocf(v1, [{"id": 1, "text": "old"}])
    )
    (tmp_path / "b.avro").write_bytes(
        avro_min.write_ocf(v2, [{"id": 2, "text": "new", "lang": "en"}])
    )

    with pytest.raises(Exception, match="reader_schema"):
        read_avro_ocf(spark, str(tmp_path)).collect()

    out = read_avro_ocf(spark, str(tmp_path), reader_schema=v2)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].lang == "und" and rows[1].text == "old"
    assert rows[2].lang == "en"
    assert dict(out.dtypes)["id"] == "bigint"


def test_catalog_ocf_export_import_roundtrip(spark, sf_dir, tmp_path):
    """Warehouse egress/ingress: three catalog tables exported as OCF
    directories read back row-identical with schemas from the file
    headers."""
    from end2end_data_pipeline_spark.sources.avro_frames import (
        export_tables_ocf,
        import_tables_ocf,
    )
    from end2end_data_pipeline_spark.sources.tables import load_table

    out = str(tmp_path / "egress")
    tables = ("region", "nation", "supplier")
    counts = export_tables_ocf(spark, sf_dir, out, tables=tables)
    back = import_tables_ocf(spark, out)
    assert set(back) == set(tables)
    for name in tables:
        src = load_table(spark, sf_dir, name)
        assert counts[name] == src.count()
        assert sorted(map(repr, back[name].collect())) == sorted(
            map(repr, src.collect())
        )


def test_avro_ocf_roundtrip_query_values_and_plan(spark):
    """``avro_ocf_roundtrip`` (the OCF tier's registry-visible parity
    query): per-lang rollup values must match the source table exactly
    — text byte-identical via the re-join, timestamp-micros logical
    type re-derived arithmetically — and the plan reads the OCF files
    and the documents dim once each."""
    import re

    from end2end_data_pipeline_spark.operators.ingest_parity import (
        OCF_DOC_LIMIT,
        avro_ocf_roundtrip,
    )

    df = avro_ocf_roundtrip(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"FileScan binaryFile", plan)) == 1, plan[:1500]

    rows = df.collect()
    assert sum(r["n"] for r in rows) == OCF_DOC_LIMIT
    assert all(r["n_roundtrip_ok"] == r["n"] for r in rows), rows
    # the synthesized timestamps decode to the exact micros arithmetic
    assert all(r["sum_ts_us"] % 1_000_000 == (123_456 * r["n"]) % 1_000_000
               for r in rows)
