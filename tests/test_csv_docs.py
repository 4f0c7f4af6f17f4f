"""CSV front-door contract: malformed records quarantine verbatim,
good rows parse typed, nothing is dropped — the same dead-letter
discipline as the JSONL and tar-shard readers, on Spark's native CSV
source."""

from __future__ import annotations

from pyspark.sql import types as T

from end2end_data_pipeline_spark.sources.csv_docs import (
    read_csv_docs,
    stream_csv_docs,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

GOOD = [
    '1,en,hello world,11',
    '2,fr,"bon, jour",8',          # quoted delimiter
    '3,de,"say ""hi"" now",12',    # doubled embedded quote
]
BAD = [
    "not,enough",
    "4,es,too,many,tokens,9",
    '5,it,"unclosed,6',
]


def _write(tmp_path, lines):
    p = tmp_path / "corpus.csv"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_good_rows_parse_typed_and_quoted(spark, tmp_path):
    good, dead = read_csv_docs(spark, _write(tmp_path, GOOD), SCHEMA)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["text"] == "bon, jour"
    assert rows[3]["text"] == 'say "hi" now'
    assert rows[1]["n_chars"] == 11
    assert dead.count() == 0


def test_malformed_rows_quarantine_verbatim(spark, tmp_path):
    good, dead = read_csv_docs(spark, _write(tmp_path, GOOD + BAD), SCHEMA)
    assert good.count() == len(GOOD)
    quarantined = sorted(r["raw_line"] for r in dead.collect())
    assert quarantined == sorted(BAD)  # preserved byte-for-byte


def test_stream_matches_batch(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    q = (
        stream_csv_docs(spark, str(tmp_path), SCHEMA)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("csv_docs_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("csv_docs_stream_test")
    assert streamed.where("is_corrupt").count() == len(BAD)
    assert streamed.where("NOT is_corrupt").count() == len(GOOD)
    batch_good, _ = read_csv_docs(spark, path, SCHEMA)
    assert sorted(
        map(tuple, streamed.where("NOT is_corrupt")
            .select(*[f.name for f in SCHEMA.fields]).collect())
    ) == sorted(map(tuple, batch_good.collect()))
