"""Stateful streaming (applyInPandasWithState) error-streak detector:
golden-fixture checks and stream-vs-batch parity against the
gaps-and-islands window query (``event_error_streaks``)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from end2end_data_pipeline_spark.streaming.pipeline import EVENT_SCHEMA
from end2end_data_pipeline_spark.streaming.stateful import error_streak_alerts

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(i: int, user: str, status: str):
    return (
        f"e{i:03d}",
        user,
        "s0",
        "SEARCH",
        T0 + dt.timedelta(seconds=i),
        50,
        status,
        500 if status == "ERROR" else None,
        None,
    )


@pytest.fixture(scope="module")
def streak_events(spark):
    """u1: E E E E (one alert at the 3rd), u2: E E S E E E (alert at
    the 6th event — reset in the middle), u3: all SUCCESS (no alert)."""
    rows = (
        [_mk(i, "u1", "ERROR") for i in range(4)]
        + [_mk(10 + i, "u2", s) for i, s in enumerate(["ERROR", "ERROR", "SUCCESS", "ERROR", "ERROR", "ERROR"])]
        + [_mk(20 + i, "u3", "SUCCESS") for i in range(3)]
    )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _batch_streaks(df, threshold=3):
    """Batch gaps-and-islands equivalent on the reference schema."""
    from pyspark.sql.window import Window

    w_run = (
        Window.partitionBy("user_id")
        .orderBy("event_timestamp", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = df.withColumn(
        "grp", F.count(F.when(F.col("status") != "ERROR", 1)).over(w_run)
    ).where(F.col("status") == "ERROR")
    w_pos = Window.partitionBy("user_id", "grp").orderBy(
        "event_timestamp", "event_id"
    )
    return (
        marked.withColumn("streak", F.row_number().over(w_pos))
        .where(F.col("streak") == threshold)
        .select("user_id", F.col("event_timestamp").alias("alert_ts"), "streak")
    )


def test_stateful_stream_golden(spark, tmp_path, streak_events):
    src = str(tmp_path / "src")
    streak_events.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    alerts = error_streak_alerts(stream)
    q = (
        alerts.writeStream.format("memory")
        .queryName("streaks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.alert_ts, r.streak)
        for r in spark.table("streaks").collect()
    }
    assert got == {
        ("u1", T0 + dt.timedelta(seconds=2), 3),
        ("u2", T0 + dt.timedelta(seconds=15), 3),
    }


def test_stateful_stream_matches_batch(spark, tmp_path, streak_events):
    src = str(tmp_path / "src2")
    streak_events.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        error_streak_alerts(stream)
        .writeStream.format("memory")
        .queryName("streaks2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.table("streaks2").collect()))
    batch = sorted(map(tuple, _batch_streaks(streak_events).collect()))
    assert streamed == batch


def test_state_survives_across_batches(spark, tmp_path):
    """A streak split across two micro-batches still alerts: 2 errors
    in batch 1, the 3rd in batch 2 — the state store carries streak=2
    over the batch boundary."""
    src = tmp_path / "src3"
    src.mkdir()
    b1 = spark.createDataFrame(
        [_mk(0, "u9", "ERROR"), _mk(1, "u9", "ERROR")], EVENT_SCHEMA
    )
    b2 = spark.createDataFrame([_mk(2, "u9", "ERROR")], EVENT_SCHEMA)
    b1.write.parquet(str(src / "b1"))
    b2.write.parquet(str(src / "b2"))

    ckpt = str(tmp_path / "ckpt3")
    sink_name = "streaks3"
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        error_streak_alerts(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(sink_name).collect()
    assert [(r.user_id, r.streak) for r in rows] == [("u9", 3)]


# --- first-seen detection -------------------------------------------


def test_first_seen_stream_matches_batch(spark, tmp_path, streak_events):
    """Stream first-seen == batch groupBy-min on the same fixture."""
    from end2end_data_pipeline_spark.streaming.stateful import first_seen_users

    src = str(tmp_path / "fs_src")
    streak_events.write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        first_seen_users(stream)
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.first_ts)
        for r in spark.sql("SELECT * FROM first_seen").collect()
    }
    expect = {
        (r.user_id, r.first_ts)
        for r in streak_events.groupBy("user_id")
        .agg(F.min("event_timestamp").alias("first_ts"))
        .collect()
    }
    assert got == expect


def test_first_seen_multibatch_out_of_order_semantics(spark, tmp_path):
    """AT-FIRST-BATCH contract (r5 ADVICE): the emitted first_ts is the
    minimum within the FIRST micro-batch a user appears in. An earlier
    event for that user arriving in a LATER micro-batch does NOT revise
    the emitted row (the state flag suppresses re-emission), so on
    out-of-order sources the streaming answer can legitimately disagree
    with the batch groupBy-min basis — deployments that need exact
    minima must pair a watermark with a trigger that closes a user's
    events into one batch. This test pins that documented divergence."""
    from end2end_data_pipeline_spark.streaming.stateful import first_seen_users

    src = tmp_path / "fs3_src"
    src.mkdir()
    late = _mk(100, "u7", "SUCCESS")   # ts = base + 100s
    early = _mk(50, "u7", "SUCCESS")   # ts = base + 50s (earlier!)
    spark.createDataFrame([late], EVENT_SCHEMA).write.parquet(str(src / "b1"))
    spark.createDataFrame([early], EVENT_SCHEMA).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        first_seen_users(stream)
        .writeStream.format("memory")
        .queryName("first_seen_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fs3_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("first_seen_ooo").collect()
    # exactly one emission, carrying batch-1's (later) timestamp — NOT
    # the global minimum from the out-of-order batch 2
    assert [(r.user_id, r.first_ts) for r in rows] == [("u7", late[4])]


def test_first_seen_suppresses_across_restarts(spark, tmp_path, streak_events):
    """A second availableNow run over the same checkpoint emits only
    genuinely new users — the state store is the dedup authority."""
    from end2end_data_pipeline_spark.streaming.stateful import first_seen_users

    src = str(tmp_path / "fs2_src")
    sink = str(tmp_path / "fs2_sink")
    ckpt = str(tmp_path / "fs2_ckpt")
    streak_events.write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            first_seen_users(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(sink).collect()
    assert {r.user_id for r in first} == {"u1", "u2", "u3"}

    # new file: one known user (later events) + one new user
    extra = spark.createDataFrame(
        [_mk(90, "u1", "SUCCESS"), _mk(91, "u9", "SUCCESS")], EVENT_SCHEMA
    )
    extra.write.mode("append").parquet(src)
    run_once()
    after = spark.read.parquet(sink).collect()
    assert len(after) == len(first) + 1
    new_rows = {r.user_id for r in after} - {r.user_id for r in first}
    assert new_rows == {"u9"}


def test_streak_state_recovers_across_query_restart(spark, tmp_path):
    """Stop the query with a live streak=2, then restart a NEW query
    from the same checkpoint after the 3rd error lands: the state
    store must reload the carried streak and alert — the crash/deploy
    recovery property of the custom stateful operator."""
    src = tmp_path / "src_restart"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_restart")
    # memory sink forbids checkpoint recovery; a file sink is the
    # fault-tolerant shape this test exists to exercise
    sink = str(tmp_path / "sink_restart")

    def run():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            error_streak_alerts(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).collect()

    spark.createDataFrame(
        [_mk(0, "u7", "ERROR"), _mk(1, "u7", "ERROR")], EVENT_SCHEMA
    ).write.parquet(str(src / "b1"))
    assert run() == []  # streak=2 held in state, no alert

    spark.createDataFrame([_mk(2, "u7", "ERROR")], EVENT_SCHEMA).write.parquet(
        str(src / "b2")
    )
    assert [(r.user_id, r.streak) for r in run()] == [("u7", 3)]


# --- out-of-order-tolerant variant (transformWithStateInPandas) -----
#
# The transformWithState Python worker needs protobuf, absent from
# this container, so the Spark runtime path is gated (see the
# degradation test). The processor's buffer/flush/streak logic is
# pure Python over the state handles — unit-tested here with fakes.


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeListState:
    def __init__(self):
        self._items = []

    def get(self):
        return iter(list(self._items))

    def appendList(self, items):
        self._items.extend(items)

    def clear(self):
        self._items = []


class _FakeHandle:
    def __init__(self):
        self.timers = []
        self._states = {}

    def getValueState(self, name, schema):
        return self._states.setdefault(name, _FakeValueState())

    def getListState(self, name, schema):
        return self._states.setdefault(name, _FakeListState())

    def registerTimer(self, ms):
        self.timers.append(ms)


class _FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


def _proc(threshold=3):
    from end2end_data_pipeline_spark.streaming.stateful import (
        _BufferedStreakProcessor,
    )

    p = _BufferedStreakProcessor(threshold)
    p.init(_FakeHandle())
    return p


def _pdf(rows):
    import pandas as pd

    return pd.DataFrame(rows, columns=["event_timestamp", "is_error"])


MIN = 60_000  # ms


def _collect(gen):
    return [
        (r.user_id, r.alert_ts, int(r.streak))
        for df in gen
        for r in df.itertuples()
    ]


def test_ooo_processor_repairs_cross_batch_disorder():
    """First and THIRD error arrive in batch 1, the middle error in
    batch 2; the watermark flush re-sorts the span so the streak
    counts 0 -> 1 -> 2 in event-time order and alerts once."""
    import pandas as pd

    p = _proc()
    t = lambda m: pd.Timestamp(m * MIN, unit="ms")  # noqa: E731
    assert (
        list(p.handleInputRows(("u1",), iter([_pdf([(t(0), True), (t(2), True)])]), None))
        == []
    )
    list(p.handleInputRows(("u1",), iter([_pdf([(t(1), True)])]), None))
    assert p.handle.timers == [2 * MIN, 1 * MIN]

    alerts = _collect(
        p.handleExpiredTimer(("u1",), _FakeTimerValues(20 * MIN), None)
    )
    assert alerts == [("u1", t(2), 3)]
    assert p.streak.get() == (3,)


def test_ooo_processor_partial_flush_keeps_pending_tail():
    """Only the watermark-complete prefix flushes; the tail stays
    buffered with a re-registered timer and completes the streak on
    the next expiry — no event is processed before it is final."""
    import pandas as pd

    p = _proc()
    t = lambda m: pd.Timestamp(m * MIN, unit="ms")  # noqa: E731
    list(
        p.handleInputRows(
            ("u2",),
            iter([_pdf([(t(0), True), (t(1), True), (t(5), True)])]),
            None,
        )
    )
    # watermark only reaches t(1): streak=2 held, t(5) pending
    assert (
        _collect(p.handleExpiredTimer(("u2",), _FakeTimerValues(1 * MIN), None))
        == []
    )
    assert p.streak.get() == (2,)
    assert p.handle.timers[-1] == 5 * MIN
    alerts = _collect(
        p.handleExpiredTimer(("u2",), _FakeTimerValues(6 * MIN), None)
    )
    assert alerts == [("u2", t(5), 3)]


def test_ooo_processor_success_resets_across_flushes():
    import pandas as pd

    p = _proc()
    t = lambda m: pd.Timestamp(m * MIN, unit="ms")  # noqa: E731
    list(
        p.handleInputRows(
            ("u3",),
            iter(
                [
                    _pdf(
                        [
                            (t(0), True),
                            (t(1), True),
                            (t(2), False),  # reset mid-span
                            (t(3), True),
                            (t(4), True),
                            (t(5), True),
                        ]
                    )
                ]
            ),
            None,
        )
    )
    alerts = _collect(
        p.handleExpiredTimer(("u3",), _FakeTimerValues(10 * MIN), None)
    )
    assert alerts == [("u3", t(5), 3)]


def test_ooo_spark_path_degrades_actionably(spark, tmp_path):
    """Without protobuf the Spark wiring must fail with the actionable
    ConnectorUnavailable, not a worker crash mid-query."""
    import pytest

    from end2end_data_pipeline_spark.sources.connectors import (
        ConnectorUnavailable,
    )
    from end2end_data_pipeline_spark.streaming.stateful import (
        error_streak_alerts_ooo,
    )

    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present: the runtime path would start")
    except ImportError:
        pass
    src = str(tmp_path / "gate_src")
    spark.createDataFrame([_mk(0, "u1", "ERROR")], EVENT_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    with pytest.raises(ConnectorUnavailable, match="protobuf"):
        error_streak_alerts_ooo(stream)


def test_ooo_first_seen_revises_candidate_before_watermark():
    """An earlier event arriving in a LATER batch (inside the delay)
    revises the held candidate; emission happens exactly once, with
    the true minimum, only after the watermark passes it."""
    import pandas as pd

    from end2end_data_pipeline_spark.streaming.stateful import (
        _BufferedFirstSeenProcessor,
    )

    p = _BufferedFirstSeenProcessor()
    p.init(_FakeHandle())
    t = lambda m: pd.Timestamp(m * MIN, unit="ms")  # noqa: E731

    def feed(minutes):
        return list(
            p.handleInputRows(
                ("u1",),
                iter([pd.DataFrame({"event_timestamp": [t(m) for m in minutes]})]),
                None,
            )
        )

    assert feed([10, 12]) == []          # candidate = 10
    assert feed([7]) == []               # earlier event revises -> 7
    assert p.handle.timers == [10 * MIN, 7 * MIN]

    # watermark below the candidate: nothing emits (superseded timer)
    assert list(p.handleExpiredTimer(("u1",), _FakeTimerValues(5 * MIN), None) or []) == []
    out = [
        (r.user_id, r.first_ts)
        for df in p.handleExpiredTimer(("u1",), _FakeTimerValues(8 * MIN), None)
        for r in df.itertuples()
    ]
    assert out == [("u1", t(7))]
    # further timers and later events are no-ops after emission
    assert list(p.handleExpiredTimer(("u1",), _FakeTimerValues(30 * MIN), None) or []) == []
    assert feed([3]) == []  # would be late beyond watermark in practice
    assert p.state.get() == (7 * MIN, 1)


def test_ooo_first_seen_degrades_actionably(spark, tmp_path):
    import pytest

    from end2end_data_pipeline_spark.sources.connectors import (
        ConnectorUnavailable,
    )
    from end2end_data_pipeline_spark.streaming.stateful import first_seen_users_ooo

    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present: the runtime path would start")
    except ImportError:
        pass
    src = str(tmp_path / "fs_gate_src")
    spark.createDataFrame([_mk(0, "u1", "ERROR")], EVENT_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    with pytest.raises(ConnectorUnavailable, match="protobuf"):
        first_seen_users_ooo(stream)
