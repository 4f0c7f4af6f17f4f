"""Accuracy gate for sketch-based operators. The registered queries
(`events_approx_cardinality` / `events_approx_quantiles`) emit
integer tolerance flags the DuckDB oracle value-checks; these tests
exercise the raw detail surfaces (sketch value next to exact) so a
sketch that drifts INSIDE the flag bound is still observed, and
assert the registered flags are all-green."""

from __future__ import annotations

from end2end_data_pipeline_spark.operators.event_analytics import (
    approx_cardinality_detail,
    approx_quantiles_detail,
    events_approx_cardinality,
    events_approx_quantiles,
)

SF = "/root/testdata/sf0.001"


def test_hll_within_tolerance(spark):
    rows = approx_cardinality_detail(spark, SF).collect()
    assert rows, "expected one row per event type"
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        # rsd=0.02 -> 3-sigma ~6%; generous bound that still catches a
        # broken sketch (which is off by orders of magnitude)
        assert rel_err <= 0.10, (r.event_type, r.approx_users, r.exact_users)


def test_hll_deterministic(spark):
    a = approx_cardinality_detail(spark, SF).collect()
    b = approx_cardinality_detail(spark, SF).collect()
    assert a == b


def test_registered_cardinality_flags_green(spark):
    rows = events_approx_cardinality(spark, SF).collect()
    assert rows and all(r.hll_within_10pct == 1 for r in rows)


def test_approx_quantiles_within_rank_tolerance(spark):
    """approx_percentile's guarantee is on RANK, not value: the sketch
    returns an actual sample whose rank is within 1/accuracy of the
    target, while exact percentile interpolates BETWEEN samples — on a
    small heavy-tailed group the two VALUES legitimately diverge. So
    assert the real contract: the fraction of rows <= each approx
    value must be within 2% of the requested percentile."""
    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.sources.tables import load_table

    detail = approx_quantiles_detail(spark, SF).collect()
    assert len(detail) >= 3
    ev = load_table(spark, SF, "events").select("event_type", "value").cache()
    try:
        for row in detail:
            p = row.pct / 100.0
            n = row.n_values
            at_or_below = ev.where(
                (F.col("event_type") == row.event_type)
                & (F.col("value") <= row.approx_value)
            ).count()
            rank_frac = at_or_below / n
            assert p - 0.02 <= rank_frac <= p + 0.02 + 1.0 / n, (
                row.event_type,
                p,
                row.approx_value,
                rank_frac,
            )
    finally:
        ev.unpersist()


def test_registered_quantile_flags_green(spark):
    rows = events_approx_quantiles(spark, SF).collect()
    assert len(rows) >= 3
    assert all(r.rank_ok == 1 for r in rows)
