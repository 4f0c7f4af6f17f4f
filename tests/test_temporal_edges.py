"""Golden edge-case tests for the temporal join operators, on a
synthetic sf_dir (the operators read `{sf_dir}/events.parquet`)."""

from __future__ import annotations

import datetime as dt

import pytest

from end2end_data_pipeline_spark.operators.temporal import (
    asof_last_view_before_purchase,
    event_pairs_within_window,
)

T0 = dt.datetime(2024, 6, 1, 10, 0, 0)


@pytest.fixture(scope="module")
def tiny_sf_dir(spark, tmp_path_factory):
    """events: u1 view@0s, view@10s, purchase@10s (tie!), purchase@5s;
    u2 purchase@0s (no prior view)."""
    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0 + dt.timedelta(seconds=10), 1, "view", 1.0, "{}"),
        (3, T0 + dt.timedelta(seconds=10), 1, "purchase", 1.0, "{}"),
        (4, T0 + dt.timedelta(seconds=5), 1, "purchase", 1.0, "{}"),
        (5, T0, 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp_path_factory.mktemp("tiny_sf")
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_asof_tie_takes_equal_timestamp_view(spark, tiny_sf_dir):
    got = {
        r.purchase_id: (r.view_id, r.gap_ms)
        for r in asof_last_view_before_purchase(spark, tiny_sf_dir).collect()
    }
    # purchase@10s ties with view@10s -> the >= semantics pick it (gap 0)
    assert got[3] == (2, 0)
    # purchase@5s sees only the @0s view
    assert got[4] == (1, 5000)
    # u2's purchase has no prior view -> nulls
    assert got[5] == (None, None)


def test_range_pairs_tiny(spark, tiny_sf_dir):
    rows = {
        (r.src_type, r.dst_type): (r.n_pairs, r.total_gap_ms)
        for r in event_pairs_within_window(spark, tiny_sf_dir).collect()
    }
    # u1 chains within 15 min: view@0->purchase@5 (5000), view@0->view@10
    # (10000), view@0->purchase@10 (10000), purchase@5->view@10 (5000),
    # purchase@5->purchase@10 (5000); same-ms view@10/purchase@10 pair is
    # excluded by the strict > in ms domain
    assert rows[("view", "purchase")] == (2, 15000)
    assert rows[("view", "view")] == (1, 10000)
    assert rows[("purchase", "view")] == (1, 5000)
    assert rows[("purchase", "purchase")] == (1, 5000)
