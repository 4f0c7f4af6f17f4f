"""Generator value-domain invariants, in the reference's test style
(``producer/tests/test_unit.py:18-213`` checks conditional nulls,
ranges, and timestamp units on generated events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end2end_data_pipeline_spark.sources.generator import generate_events

N = 2_000


def test_value_domains(spark):
    df = generate_events(spark, N, n_users=20, seed=7).cache()
    assert df.count() == N

    bad_latency = df.where(
        (F.col("request_latency_ms") < 50) | (F.col("request_latency_ms") > 1500)
    ).count()
    assert bad_latency == 0

    # error_code populated iff status=ERROR, and in [400, 599]
    assert df.where((F.col("status") == "SUCCESS") & F.col("error_code").isNotNull()).count() == 0
    assert df.where((F.col("status") == "ERROR") & F.col("error_code").isNull()).count() == 0
    assert (
        df.where(
            F.col("error_code").isNotNull()
            & ((F.col("error_code") < 400) | (F.col("error_code") > 599))
        ).count()
        == 0
    )

    # product_id populated iff browsing event types
    browsing = F.col("event_type").isin("VIEW_PRODUCT", "ADD_TO_CART")
    assert df.where(browsing & F.col("product_id").isNull()).count() == 0
    assert df.where(~browsing & F.col("product_id").isNotNull()).count() == 0

    # all five enum values occur; statuses both occur
    assert df.select("event_type").distinct().count() == 5
    assert df.select("status").distinct().count() == 2

    # event_minute is the truncated timestamp
    assert (
        df.where(
            F.col("event_minute") != F.date_trunc("minute", "event_timestamp")
        ).count()
        == 0
    )


def test_deterministic_per_seed(spark):
    a = generate_events(spark, 500, seed=11).collect()
    b = generate_events(spark, 500, seed=11).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = generate_events(spark, 500, seed=12).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_sessions_rotate_within_user(spark):
    df = generate_events(spark, 5_000, n_users=5, seed=3)
    per_user = (
        df.groupBy("user_id")
        .agg(F.count_distinct("session_id").alias("n_sessions"))
        .collect()
    )
    # p=0.01 over ~1000 events/user -> multiple sessions per user
    assert all(r["n_sessions"] >= 2 for r in per_user)
