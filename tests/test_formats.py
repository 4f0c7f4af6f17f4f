"""Round-trip tests for the interchange formats: every format must
reproduce the parquet events table row-identically (same ids, same
microsecond timestamps, same JSON props)."""

from __future__ import annotations

import pytest

from end2end_data_pipeline_spark.sources.formats import (
    read_events_csv,
    read_events_jsonl,
    read_events_orc,
    write_events_csv,
    write_events_jsonl,
    write_events_orc,
)
from end2end_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

ROUND_TRIPS = {
    "jsonl": (write_events_jsonl, read_events_jsonl),
    "csv": (write_events_csv, read_events_csv),
    "orc": (write_events_orc, read_events_orc),
}


def _canon(df):
    return [tuple(r) for r in df.orderBy("event_id").collect()]


@pytest.mark.parametrize("fmt", sorted(ROUND_TRIPS))
def test_events_round_trip(spark, tmp_path, fmt):
    write, read = ROUND_TRIPS[fmt]
    events = load_table(spark, SF, "events")
    path = str(tmp_path / f"events_{fmt}")
    write(events, path)
    back = read(spark, path)
    assert back.columns == events.columns
    assert _canon(back) == _canon(events)


def test_text_formats_distributed_layout(spark, tmp_path):
    """Writers must emit one file per partition (distributed write),
    not a single driver-funneled file."""
    events = load_table(spark, SF, "events").repartition(4)
    path = str(tmp_path / "events_multi")
    write_events_jsonl(events, path)
    import glob

    parts = glob.glob(f"{path}/part-*")
    assert len(parts) == 4


def test_schema_evolution_merged_read_nullfills_old_files(spark):
    """The mergeSchema parity fixture: pre-evolution rows surface NULL
    for the late column and every doc appears exactly once."""
    import pyspark.sql.functions as F

    from end2end_data_pipeline_spark.operators.ingest_parity import (
        SEVO_BATCH,
        SEVO_DOC_LIMIT,
        _schema_evolution_fixture,
    )

    fx = _schema_evolution_fixture(spark, SF)
    merged = spark.read.option("mergeSchema", "true").parquet(fx)
    rows = {r["doc_id"]: r for r in merged.collect()}
    n_docs = (
        load_table(spark, SF, "documents")
        .where(F.col("doc_id") < SEVO_DOC_LIMIT)
        .count()
    )
    assert len(rows) == n_docs
    for doc_id, r in rows.items():
        if doc_id < SEVO_BATCH:
            assert r["lang"] is None          # pre-evolution file
        else:
            assert r["lang"] is not None      # evolved file
        assert r["text_len"] > 0
