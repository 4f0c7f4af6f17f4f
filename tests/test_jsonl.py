"""JSONL ingest: typed good rows, quarantined bad lines, and the
no-silent-drop invariant (good + dead == input lines)."""

from __future__ import annotations

from pyspark.sql import types as T

from end2end_data_pipeline_spark.sources.jsonl import read_jsonl_docs

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    '{"doc_id": 3, "text": "truncated...',  # broken JSON
    "not json at all",
    '{"doc_id": 4, "text": "ok again", "lang": "de"}',
]


def test_split_good_and_dead(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    good, dead = read_jsonl_docs(spark, str(p), SCHEMA)
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {1, 2, 4}
    assert g[2]["text"] == "bonjour" and g[4]["lang"] == "de"
    assert good.columns == ["doc_id", "text", "lang"]
    d = sorted(r["raw_line"] for r in dead.collect())
    assert d == sorted([LINES[2], "not json at all"])
    # nothing silently dropped
    assert good.count() + dead.count() == len(LINES)


def test_all_good_means_empty_dead(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"doc_id": 7, "text": "t", "lang": "en"}\n')
    good, dead = read_jsonl_docs(spark, str(p), SCHEMA)
    assert good.count() == 1 and dead.collect() == []


def test_jsonl_feeds_text_operators(spark, tmp_path):
    """The ingested frame slots straight into the text-analysis family
    (same column contract as the documents fixture)."""
    from pyspark.sql import functions as F

    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    good, _ = read_jsonl_docs(spark, str(p), SCHEMA)
    toks = good.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    ).groupBy("lang").count()
    assert {r["lang"]: r["count"] for r in toks.collect()} == {
        "en": 2,
        "fr": 1,
        "de": 2,
    }


def test_observed_single_pass_routes_both_streams(spark, tmp_path):
    """read_jsonl_docs_observed: ONE partitioned write must land good
    rows and quarantine separately AND yield the total/corrupt
    counters from that same pass (observe above the split), matching
    the two-frame API exactly - the no-silent-drop invariant with
    zero extra scans."""
    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.sources.jsonl import (
        read_jsonl_docs_observed,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    parsed, obs = read_jsonl_docs_observed(spark, str(p), SCHEMA)
    out = str(tmp_path / "routed")
    parsed.write.partitionBy("is_corrupt").parquet(out)  # the one action

    metrics = obs.get
    assert metrics["n_lines"] == len(LINES)

    good_ref, dead_ref = read_jsonl_docs(spark, str(p), SCHEMA)
    # partition keys read back as strings unless cast
    routed = spark.read.parquet(out).withColumn(
        "is_corrupt", F.col("is_corrupt").cast("boolean")
    )
    good = routed.where(~F.col("is_corrupt"))
    dead = routed.where(F.col("is_corrupt"))
    assert metrics["n_corrupt"] == dead.count() == dead_ref.count()
    assert good.count() + dead.count() == metrics["n_lines"]
    assert sorted(
        map(tuple, good.select(*good_ref.columns).collect())
    ) == sorted(map(tuple, good_ref.collect()))
    assert sorted(
        r["_corrupt_record"] for r in dead.select("_corrupt_record").collect()
    ) == sorted(r["raw_line"] for r in dead_ref.collect())


def test_streaming_jsonl_matches_batch_and_is_exactly_once(spark, tmp_path):
    """JSONL files arriving over time: the streamed parse (with
    quarantine flag) must equal the batch API for landed files, and a
    second availableNow run after a new file lands appends only that
    file's lines (file-source checkpoint)."""
    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.sources.jsonl import stream_jsonl_docs

    land = tmp_path / "landing"
    land.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    (land / "wave1.jsonl").write_text("\n".join(LINES) + "\n")

    def run_once():
        q = (
            stream_jsonl_docs(spark, str(land), SCHEMA)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    routed = spark.read.parquet(sink)
    good_ref, dead_ref = read_jsonl_docs(spark, str(land), SCHEMA)
    assert routed.where(F.col("is_corrupt")).count() == dead_ref.count()
    good = routed.where(~F.col("is_corrupt")).select(*good_ref.columns)
    assert sorted(map(tuple, good.collect())) == sorted(
        map(tuple, good_ref.collect())
    )

    n_before = routed.count()
    (land / "wave2.jsonl").write_text('{"doc_id": 99, "text": "late", "lang": "en"}\n')
    run_once()
    after = spark.read.parquet(sink)
    assert after.count() == n_before + 1
    assert after.where(F.col("doc_id") == 99).count() == 1


def test_observed_counters_are_zero_on_empty_input(spark, tmp_path):
    """An all-empty landing must observe (0, 0), not (0, NULL) — the
    no-silent-drop identity has to be checkable with plain ints."""
    from end2end_data_pipeline_spark.sources.jsonl import (
        read_jsonl_docs_observed,
    )

    from pyspark.sql import functions as F

    p = tmp_path / "empty.jsonl"
    p.write_text("")
    parsed, obs = read_jsonl_docs_observed(spark, str(p), SCHEMA)
    out = str(tmp_path / "routed")
    parsed.write.partitionBy("is_corrupt").parquet(out)  # the intended action
    assert obs.get == {"n_lines": 0, "n_corrupt": 0}
    assert spark.read.schema(parsed.schema).parquet(out).count() == 0
