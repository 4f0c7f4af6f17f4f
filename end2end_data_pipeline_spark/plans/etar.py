"""The reference's ETAR orchestration (Extract-Transform-Analyze-
Report) as ONE engine function.

Reference flow (``airflow/dags/pipeline.py:103-248``), per closed
minute: extract that minute's ``(event_type, status)`` from the
warehouse into a parquet object named by the Tehran-localized minute
(``:130-176``), run the Spark pivot analysis on that file
(``spark.py:17-46``), build the JSON report (no-data variant when the
minute is empty, ``spark.py:71``), and POST it to the dashboard
(``:205-245``). Airflow's scheduler supplies the minute; the DAG is
three tasks plus connection plumbing.

Here the same cycle is ``run_minute_cycle`` — the extract is a
partition-prunable predicate (S8), the object store is any path Spark
can write (local dir here, ``s3a://`` in production via
``sources/connectors.py:s3a_conf``), the analysis is the flagship
pivot, and the push is ``plans/report_service.py``. The production
replacement for the whole polling loop is ONE streaming query
(``streaming/pipeline.py:publish_minutely_reports``) — this batch
cycle exists for parity with the reference's minute-at-a-time
orchestration and for backfills, where each minute is an independent,
idempotent, retryable unit exactly as in the reference DAG.
"""

from __future__ import annotations

import datetime as dt
import os
import zoneinfo
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.operators.event_analytics import ERROR_K_THRESHOLD
from end2end_data_pipeline_spark.plans.report import status_pivot_report
from end2end_data_pipeline_spark.plans.report_service import push_report

TEHRAN = zoneinfo.ZoneInfo("Asia/Tehran")


def minute_file_name(minute_utc: dt.datetime) -> str:
    """The reference's object name: the minute rendered in
    Asia/Tehran, ``yyyy-MM-dd_HH-mm`` (``pipeline.py:130-132``)."""
    local = minute_utc.replace(tzinfo=dt.timezone.utc).astimezone(TEHRAN)
    return local.strftime("%Y-%m-%d_%H-%M")


def extract_minute(events: DataFrame, minute_utc: dt.datetime) -> DataFrame:
    """S8 — the two-column minute extract. The equality predicate on
    the minute makes the scan partition-prunable on a minute-
    partitioned warehouse (``sources/generator.py:write_warehouse``)
    and row-group-skippable on a plain one."""
    lo = minute_utc.replace(second=0, microsecond=0)
    hi = lo + dt.timedelta(minutes=1)
    k = F.get_json_object("props", "$.k").cast("int")
    status = F.when(k < ERROR_K_THRESHOLD, F.lit("ERROR")).otherwise(F.lit("SUCCESS"))
    return (
        events.where(
            (F.col("ts") >= F.lit(lo.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
            & (F.col("ts") < F.lit(hi.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp"))
        )
        .select("event_type", status.alias("status"))
    )


def run_minute_cycle(
    spark: SparkSession,
    events: DataFrame,
    minute_utc: dt.datetime,
    store_dir: str,
    dashboard_url: str | None = None,
) -> dict[str, Any]:
    """One ETAR cycle: extract → parquet object → pivot analysis →
    report → optional dashboard push. Returns the report dict (the
    no-data variant for an empty minute, exactly like the reference).

    Idempotent per minute (overwrite the same object, most-recent-only
    dashboard storage), so a backfill re-runs any minute safely — the
    retry semantics the reference gets from Airflow task retries."""
    name = minute_file_name(minute_utc)
    obj_path = os.path.join(store_dir, f"{name}.parquet")
    extract = extract_minute(events, minute_utc)
    extract.write.mode("overwrite").parquet(obj_path)

    analyzed = spark.read.parquet(obj_path)
    report = status_pivot_report(analyzed, file_name=f"{name}.json")
    if dashboard_url is not None:
        push_report(dashboard_url, report)
    return report


def run_backfill(
    spark: SparkSession,
    events: DataFrame,
    start_utc: dt.datetime,
    n_minutes: int,
    store_dir: str,
    dashboard_url: str | None = None,
) -> list[dict[str, Any]]:
    """Re-run N consecutive minute cycles (the reference's scheduler
    loop replayed as a backfill). Each minute is independent; at
    cluster scale a backfill would instead run ONE query grouped by
    minute — this per-minute loop preserves the reference's object
    layout, where downstream consumers address one parquet object per
    minute."""
    out = []
    for i in range(n_minutes):
        minute = start_utc + dt.timedelta(minutes=i)
        out.append(
            run_minute_cycle(spark, events, minute, store_dir, dashboard_url)
        )
    return out
