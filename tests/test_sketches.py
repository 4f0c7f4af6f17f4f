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


def test_approx_quantiles_within_rank_tolerance(spark):
    """approx_percentile's guarantee is on RANK, not value: the sketch
    returns an actual sample whose rank is within 1/accuracy of the
    target, while exact percentile interpolates BETWEEN samples — on a
    small heavy-tailed group the two VALUES legitimately diverge. So
    assert the real contract: the fraction of rows <= each approx
    value must be within 2% of the requested percentile."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from end2end_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    df = entrymod.queries()["events_approx_quantiles"](spark, sf)
    ev = load_table(spark, sf, "events").select("event_type", "value").cache()
    try:
        for row in df.collect():
            assert len(row.approx_pcts) == 3
            n = row.n_events
            for p, a in zip((0.5, 0.95, 0.99), row.approx_pcts):
                at_or_below = ev.where(
                    (F.col("event_type") == row.event_type)
                    & (F.col("value") <= a)
                ).count()
                rank_frac = at_or_below / n
                assert p - 0.02 <= rank_frac <= p + 0.02 + 1.0 / n, (
                    row.event_type,
                    p,
                    a,
                    rank_frac,
                )
    finally:
        ev.unpersist()
