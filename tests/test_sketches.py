"""Accuracy gate for sketch-based operators (no DuckDB oracle — sketch
internals are engine-specific, so correctness is a tolerance check
against the exact answer computed in the same plan)."""

from __future__ import annotations

from end2end_data_pipeline_spark.operators.event_analytics import (
    events_approx_cardinality,
)

SF = "/root/testdata/sf0.001"


def test_hll_within_tolerance(spark):
    rows = events_approx_cardinality(spark, SF).collect()
    assert rows, "expected one row per event type"
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        # rsd=0.02 -> 3-sigma ~6%; generous bound that still catches a
        # broken sketch (which is off by orders of magnitude)
        assert rel_err <= 0.10, (r.event_type, r.approx_users, r.exact_users)


def test_hll_deterministic(spark):
    a = events_approx_cardinality(spark, SF).collect()
    b = events_approx_cardinality(spark, SF).collect()
    assert a == b
