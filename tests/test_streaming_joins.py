"""Streaming join tests: stream-static enrichment and the watermarked
stream-stream view→purchase join, both drained with availableNow and
checked against batch answers."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from end2end_data_pipeline_spark.streaming.joins import (
    enrich_with_dim,
    purchases_after_views,
)
from end2end_data_pipeline_spark.streaming.pipeline import EVENT_SCHEMA

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(i, user, etype, sec, status="SUCCESS"):
    return (
        f"e{i}",
        user,
        "s0",
        etype,
        T0 + dt.timedelta(seconds=sec),
        50,
        status,
        None,
        None,
    )


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        _ev(0, "u1", "VIEW_PRODUCT", 0),
        _ev(1, "u1", "PAYMENT", 60),          # within 15 min of e0
        _ev(2, "u1", "PAYMENT", 30 * 60),     # too late after e0
        _ev(3, "u2", "VIEW_PRODUCT", 0),
        _ev(4, "u3", "PAYMENT", 10),          # no view for u3
        # tail to advance the watermark far past everything above
        _ev(5, "u1", "VIEW_PRODUCT", 3600),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_stream_static_enrichment(spark, tmp_path, funnel_events):
    src = str(tmp_path / "enrich_src")
    funnel_events.write.parquet(src)
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "basic")], "user_id string, tier string"
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        enrich_with_dim(stream, dim, "user_id")
        .select("event_id", "user_id", "tier")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.tier for r in spark.table("enriched").collect()}
    assert got["e0"] == "gold"
    assert got["e3"] == "basic"
    assert got["e4"] is None  # left join keeps unmatched stream rows


def test_stream_stream_view_purchase_join(spark, tmp_path, funnel_events):
    src = str(tmp_path / "ss_src")
    funnel_events.write.parquet(src)

    def views_purchases(df):
        return (
            df.where(F.col("event_type") == "VIEW_PRODUCT"),
            df.where(F.col("event_type") == "PAYMENT"),
        )

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    v, p = views_purchases(stream)
    q = (
        purchases_after_views(v, p)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.table("ss_join").collect()))

    bv, bp = views_purchases(spark.read.schema(EVENT_SCHEMA).parquet(src))
    batch = sorted(map(tuple, purchases_after_views(bv, bp).collect()))
    assert streamed == batch
    # exactly one qualifying pair: u1 view e0 -> payment e1 within 15 min
    assert streamed == [("u1", "e1", "e0", 60000)]


def test_stream_stream_left_outer_abandonment(spark, tmp_path):
    """Unmatched views emit with NULL purchase only after the watermark
    proves no purchase can still arrive; a second drain with a later
    tail event advances the watermark and flushes the outer row."""
    from end2end_data_pipeline_spark.streaming.joins import views_without_purchase

    src = str(tmp_path / "outer_src")
    ckpt = str(tmp_path / "outer_ckpt")
    out = str(tmp_path / "outer_out")
    first = [
        _ev(0, "u1", "VIEW_PRODUCT", 0),
        _ev(1, "u1", "PAYMENT", 60),       # converts e0
        _ev(3, "u2", "VIEW_PRODUCT", 0),   # never converts
    ]
    spark.createDataFrame(first, EVENT_SCHEMA).write.mode("append").parquet(src)

    def drain():
        # file sink: the one sink that supports restart from the same
        # checkpoint (memory sink does not recover)
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        v = stream.where(F.col("event_type") == "VIEW_PRODUCT")
        p = stream.where(F.col("event_type") == "PAYMENT")
        q = (
            views_without_purchase(v, p)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {tuple(r) for r in spark.read.parquet(out).collect()}

    got1 = drain()
    # the match can emit as soon as both sides meet
    assert ("u1", "e0", "e1", 1) in got1
    assert not any(r[1] == "e3" for r in got1)  # outer row held back

    # tail event pushes the watermark far past e3's join window
    # Two subtleties drive the choreography below: (1) the GLOBAL
    # watermark is the MIN over both join inputs' watermark nodes, so
    # the tail must advance BOTH event types — a view-only tail leaves
    # the purchase branch's watermark (and therefore eviction) frozen;
    # (2) the watermark advances at the END of the batch that reads a
    # tail, and outer emission happens in the NEXT batch.
    tail = [_ev(9, "u9", "VIEW_PRODUCT", 7200), _ev(8, "u8", "PAYMENT", 7200)]
    spark.createDataFrame(tail, EVENT_SCHEMA).write.mode("append").parquet(src)
    drain()
    tail2 = [_ev(10, "u9", "VIEW_PRODUCT", 7260), _ev(11, "u8", "PAYMENT", 7260)]
    spark.createDataFrame(tail2, EVENT_SCHEMA).write.mode("append").parquet(src)
    got3 = drain()
    assert ("u2", "e3", None, 0) in got3


def test_abandoned_views_replay_matches_batch(spark):
    """The registered outer-join replay's rollup must equal an
    independently-derived batch LEFT JOIN, and its counts must satisfy
    the outer-join identities (every sink row is a match or a verdict;
    every view converts or abandons, never both)."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    [r] = (
        entrymod.queries()["abandoned_views_stream_replay"](spark, sf)
        .collect()
    )
    assert r["n_rows"] == r["n_matched_pairs"] + r["n_abandoned_views"]
    assert r["n_views"] == r["n_converted_views"] + r["n_abandoned_views"]
    assert r["abandoned_share"] == r["n_abandoned_views"] / r["n_views"]

    ev = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    j = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 15 MINUTE")),
        "left",
    )
    [b] = j.agg(
        F.count("*").alias("n_rows"),
        F.count("purchase_id").alias("n_matched_pairs"),
        F.sum(F.col("purchase_id").isNull().cast("int")).alias(
            "n_abandoned_views"
        ),
        F.countDistinct("view_id").alias("n_views"),
    ).collect()
    for k in ("n_rows", "n_matched_pairs", "n_abandoned_views", "n_views"):
        assert r[k] == b[k], k
