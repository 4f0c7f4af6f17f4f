"""The reference's whole minute-at-a-time DAG on this engine: extract
→ parquet object → pivot analysis → report → dashboard, including the
no-data minute and backfill idempotence (``airflow/dags/pipeline.py:
103-248`` behavior, in-process)."""

from __future__ import annotations

import datetime as dt

import duckdb

from end2end_data_pipeline_spark.operators.event_analytics import ERROR_K_THRESHOLD
from end2end_data_pipeline_spark.plans.etar import (
    minute_file_name,
    run_backfill,
    run_minute_cycle,
)
from end2end_data_pipeline_spark.plans.report_service import (
    ReportStoreServer,
    get_latest_report,
)
from end2end_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
# a minute known to contain events at sf0.001 is found dynamically —
# fixtures are sparse at this scale
_BUSY_MINUTE_SQL = f"""
    SELECT date_trunc('minute', ts) AS m, count(*) AS n,
           SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT)
                         < {ERROR_K_THRESHOLD}
                THEN 1 ELSE 0 END) AS errs
    FROM read_parquet('{SF}/events.parquet')
    GROUP BY 1 ORDER BY n DESC, m LIMIT 1
"""


def test_minute_cycle_matches_direct_counts(spark, tmp_path):
    m, n, errs = duckdb.sql(_BUSY_MINUTE_SQL).fetchall()[0]
    events = load_table(spark, SF, "events")
    with ReportStoreServer() as srv:
        rep = run_minute_cycle(spark, events, m, str(tmp_path), srv.url)
        assert get_latest_report(srv.url) == rep
    body = rep["report"]
    assert body["total_events"] == n
    assert body["total_errors"] == errs
    assert body["file_name"] == f"{minute_file_name(m)}.json"
    # Tehran localization: UTC+3:30, so the minute field shifts by 30
    assert minute_file_name(dt.datetime(2024, 1, 1, 0, 0)) == "2024-01-01_03-30"


def test_no_data_minute_produces_reference_variant(spark, tmp_path):
    events = load_table(spark, SF, "events")
    empty_minute = dt.datetime(2030, 1, 1, 0, 0)  # beyond the fixture range
    rep = run_minute_cycle(spark, events, empty_minute, str(tmp_path))
    assert rep == {"report": f"No data for {minute_file_name(empty_minute)}."}


def test_backfill_is_idempotent(spark, tmp_path):
    m, _, _ = duckdb.sql(_BUSY_MINUTE_SQL).fetchall()[0]
    events = load_table(spark, SF, "events")
    first = run_backfill(spark, events, m, 3, str(tmp_path))
    second = run_backfill(spark, events, m, 3, str(tmp_path))

    def stable(rep):
        if isinstance(rep["report"], dict):
            return {k: v for k, v in rep["report"].items() if k != "process_time"}
        return rep["report"]

    assert [stable(r) for r in first] == [stable(r) for r in second]
