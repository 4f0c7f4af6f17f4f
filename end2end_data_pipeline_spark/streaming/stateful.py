"""Custom stateful streaming operator: per-user consecutive-error
streak detection via ``applyInPandasWithState`` (SURVEY.md §2.7;
the 'anomaly detection' the reference's README claims for its
success/error-rate report — ``README.md:16`` — made into a real
per-entity stateful alert).

Semantics: maintain one integer per user — the current run of
consecutive error events in event-time order — and emit an alert row
the moment a run reaches ``threshold``. Batch equivalent (oracle-
checkable gaps-and-islands window query): ``event_error_streaks`` in
``operators/event_analytics.py``; ``tests/test_stateful_streaming.py``
asserts stream==batch on a golden fixture.

Scale posture:
- state is ONE int per user key, shuffled once on user_id and stored
  in the state store — bounded by |users|, not |events|;
- the Python hop is Arrow-batched per group (``applyInPandasWithState``),
  not row-at-a-time;
- each group's micro-batch rows are materialized and sorted ONCE in
  the worker (multi-chunk groups included — Arrow chunk order after
  the shuffle is arbitrary, so per-chunk sorting would be wrong).
  Across micro-batches Spark delivers whole watermark-closed groups,
  but strict event-time ordering between batches is the deployment's
  job (pair with ``withWatermark`` + a small trigger so a user's
  events land in one batch, or use ``error_streak_alerts_ooo`` below
  (transformWithState timers) for out-of-order repair). The availableNow test path is exactly
  ordered.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = "user_id string, alert_ts timestamp, streak int"
STATE_SCHEMA = "streak int"
DEFAULT_THRESHOLD = 3


def _track_streaks(
    threshold: int, ts_col: str, error_col: str, tiebreak_col: str | None = None
):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        (streak,) = state.get if state.exists else (0,)
        alerts: list[tuple[Any, Any, int]] = []
        # A large group arrives as MULTIPLE Arrow chunks whose relative
        # order is arbitrary after the shuffle — sorting each chunk
        # independently would process rows out of event-time order.
        # Materialize the whole group (its rows are already this
        # operator's working set; state stays one int) and sort once.
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols)
            for ts, is_err in zip(pdf[ts_col], pdf[error_col]):
                if is_err:
                    streak += 1
                    if streak == threshold:
                        alerts.append((user_id, ts, streak))
                else:
                    streak = 0
        state.update((streak,))
        yield pd.DataFrame(alerts, columns=["user_id", "alert_ts", "streak"])

    return fn


def error_streak_alerts(
    events: DataFrame,
    threshold: int = DEFAULT_THRESHOLD,
    ts_col: str = "event_timestamp",
    error_predicate: str = "status = 'ERROR'",
    watermark: str = "2 minutes",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Alert stream: one row per (user, streak) the instant the run of
    consecutive errors reaches ``threshold``. Works on any event shape:
    ``error_predicate`` is a SQL boolean over the input columns;
    ``tiebreak_col`` (e.g. an event id) pins the processing order of
    same-timestamp events so stream and batch agree even on ties."""
    src = events
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    keyed = src.selectExpr(
        "user_id",
        ts_col,
        f"({error_predicate}) AS is_error",
        *([tiebreak_col] if tiebreak_col else []),
    ).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _track_streaks(threshold, ts_col, "is_error", tiebreak_col),
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- first-seen (new-entity) detection ------------------------------

FIRST_SEEN_SCHEMA = "user_id string, first_ts timestamp"
SEEN_STATE_SCHEMA = "seen int"


def _track_first_seen(ts_col: str):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            # already announced in an earlier micro-batch: drain and emit
            # nothing (the state store, not the output sink, is the
            # dedup authority across restarts)
            for _ in batches:
                pass
            yield pd.DataFrame([], columns=["user_id", "first_ts"])
            return
        first_ts = None
        for pdf in batches:
            if len(pdf):
                m = pdf[ts_col].min()
                first_ts = m if first_ts is None else min(first_ts, m)
        if first_ts is None:
            yield pd.DataFrame([], columns=["user_id", "first_ts"])
            return
        state.update((1,))
        yield pd.DataFrame([(user_id, first_ts)], columns=["user_id", "first_ts"])

    return fn


def first_seen_users(
    events: DataFrame,
    ts_col: str = "event_timestamp",
    watermark: str = "2 minutes",
) -> DataFrame:
    """New-entity detection: exactly one row per user, emitted in the
    first micro-batch that user appears in, carrying their earliest
    event time seen in that batch — the streaming feeder for cohort
    tables (``user_retention_cohorts`` builds the same first-seen basis
    in batch via groupBy-min).

    AT-FIRST-BATCH contract: the emitted first_ts is the minimum
    within the first micro-batch the user appears in. An earlier event
    arriving in a LATER micro-batch does not revise the emitted row
    (the state flag suppresses re-emission), so on out-of-order
    sources this can disagree with the batch basis — pinned by
    ``tests/test_stateful_streaming.py::
    test_first_seen_multibatch_out_of_order_semantics``. Deployments
    needing exact minima under disorder should pair the watermark with
    a trigger that closes a user's events into one batch (or move to
    ``transformWithState`` timers and emit on watermark expiry).

    Scale posture: state is ONE flag per user key (bounded by |users|),
    shuffled once on user_id; the Python hop is Arrow-batched per
    group. Within a micro-batch only the group min is taken, so chunk
    order is irrelevant; across batches the state flag suppresses
    re-emission, surviving restarts through the checkpointed state
    store."""
    src = events
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    keyed = src.select("user_id", ts_col).groupBy("user_id")
    return keyed.applyInPandasWithState(
        _track_first_seen(ts_col),
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- out-of-order-tolerant streak detection (transformWithState) ----
#
# The applyInPandasWithState operator above requires a user's events
# to arrive in event-time order across micro-batches (documented
# limitation in its module docstring). This variant closes that gap
# with Spark 4's transformWithStateInPandas: rows buffer in a
# ListState keyed by user, an EVENT-TIME TIMER fires once the
# watermark passes the buffered span, and only then does the streak
# logic run — over the watermark-complete, event-time-sorted prefix.
# Disorder within the watermark delay is repaired; rows later than
# the watermark are dropped by the engine (standard semantics).
# State per user stays bounded by the watermark window, not history.


class _BufferedStreakProcessor:
    """StatefulProcessor: buffer -> watermark flush -> ordered streaks."""

    def __init__(self, threshold: int) -> None:
        self.threshold = threshold

    def init(self, handle) -> None:
        self.handle = handle
        self.streak = handle.getValueState("streak", "streak int")
        self.buffer = handle.getListState("buffer", "ts_ms long, is_err boolean")

    def handleInputRows(self, key, rows, timerValues):
        items: list[tuple[int, bool]] = []
        for pdf in rows:
            ts_ms = (
                pd.to_datetime(pdf["event_timestamp"])
                .astype("datetime64[ms]")
                .astype("int64")
            )
            items.extend(
                (int(t), bool(e)) for t, e in zip(ts_ms, pdf["is_error"])
            )
        if items:
            self.buffer.appendList(items)
            # fire once the watermark reaches the newest buffered event
            self.handle.registerTimer(max(t for t, _ in items))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        wm = timerValues.getCurrentWatermarkInMs()
        buffered = sorted((int(r[0]), bool(r[1])) for r in self.buffer.get())
        ready = [x for x in buffered if x[0] <= wm]
        pending = [x for x in buffered if x[0] > wm]
        (streak,) = self.streak.get() if self.streak.exists() else (0,)
        alerts: list[tuple[str, Any, int]] = []
        for ts_ms, is_err in ready:
            if is_err:
                streak += 1
                if streak == self.threshold:
                    alerts.append(
                        (user_id, pd.Timestamp(ts_ms, unit="ms"), streak)
                    )
            else:
                streak = 0
        self.streak.update((streak,))
        self.buffer.clear()
        if pending:
            self.buffer.appendList(pending)
            self.handle.registerTimer(max(t for t, _ in pending))
        if alerts:
            yield pd.DataFrame(alerts, columns=["user_id", "alert_ts", "streak"])

    def handleInitialState(self, key, initialState, timerValues) -> None:
        raise NotImplementedError("no initial state for streak alerts")

    def close(self) -> None:
        pass


def error_streak_alerts_ooo(
    events: DataFrame,
    threshold: int = DEFAULT_THRESHOLD,
    ts_col: str = "event_timestamp",
    error_predicate: str = "status = 'ERROR'",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Out-of-order-tolerant form of :func:`error_streak_alerts`:
    identical alert contract, but cross-batch disorder inside the
    watermark delay no longer corrupts the streak count. Streaming
    input only (the batch oracle stays ``event_error_streaks``).

    Runtime gate: Spark's transformWithState Python worker speaks a
    protobuf protocol to the JVM state server, so the ``protobuf``
    package must exist in the executor Python environment. Absent
    (this container), the call degrades with an actionable error and
    the processor LOGIC stays covered by direct unit tests with fake
    state (``tests/test_stateful_streaming.py``)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        from end2end_data_pipeline_spark.sources.connectors import (
            ConnectorUnavailable,
        )

        raise ConnectorUnavailable(
            "error_streak_alerts_ooo needs the protobuf package "
            "(transformWithStateInPandas state protocol; pip install "
            "protobuf on executors); for in-order feeds use "
            "error_streak_alerts, which has no such dependency"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "BufferedStreakProcessor",
        (_BufferedStreakProcessor, StatefulProcessor),
        {},
    )
    src = events.withWatermark(ts_col, watermark)
    keyed = src.selectExpr(
        "user_id", f"{ts_col} AS event_timestamp", f"({error_predicate}) AS is_error"
    ).groupBy("user_id")
    return keyed.transformWithStateInPandas(
        proc_cls(threshold),
        outputStructType=ALERT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


class _BufferedFirstSeenProcessor:
    """StatefulProcessor: exact first-seen under disorder — hold the
    candidate minimum until the watermark passes it, then emit once.
    Unlike the AT-FIRST-BATCH contract of ``first_seen_users``, an
    earlier event arriving in a later micro-batch (inside the
    watermark delay) DOES revise the candidate before emission."""

    def init(self, handle) -> None:
        self.handle = handle
        # (candidate_ts_ms, emitted 0/1)
        self.state = handle.getValueState("first_seen", "ts_ms long, emitted int")

    def handleInputRows(self, key, rows, timerValues):
        batch_min = None
        for pdf in rows:
            if len(pdf):
                m = int(
                    pd.to_datetime(pdf["event_timestamp"])
                    .astype("datetime64[ms]")
                    .astype("int64")
                    .min()
                )
                batch_min = m if batch_min is None else min(batch_min, m)
        if batch_min is None:
            return iter(())
        if self.state.exists():
            ts_ms, emitted = self.state.get()
            if emitted or batch_min >= ts_ms:
                return iter(())
        self.state.update((batch_min, 0))
        self.handle.registerTimer(batch_min)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if not self.state.exists():
            return
        ts_ms, emitted = self.state.get()
        if emitted or timerValues.getCurrentWatermarkInMs() < ts_ms:
            return  # superseded timer or candidate not yet final
        self.state.update((ts_ms, 1))
        yield pd.DataFrame(
            [(user_id, pd.Timestamp(ts_ms, unit="ms"))],
            columns=["user_id", "first_ts"],
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        raise NotImplementedError("no initial state for first-seen")

    def close(self) -> None:
        pass


def first_seen_users_ooo(
    events: DataFrame,
    ts_col: str = "event_timestamp",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Exact-minimum first-seen under out-of-order arrival (the
    revision the AT-FIRST-BATCH contract documents as impossible for
    the applyInPandasWithState form): the candidate minimum is held in
    state and emitted only when the watermark passes it. Same protobuf
    runtime gate as :func:`error_streak_alerts_ooo`."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        from end2end_data_pipeline_spark.sources.connectors import (
            ConnectorUnavailable,
        )

        raise ConnectorUnavailable(
            "first_seen_users_ooo needs the protobuf package "
            "(transformWithStateInPandas state protocol); for "
            "at-first-batch semantics use first_seen_users"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "BufferedFirstSeenProcessor",
        (_BufferedFirstSeenProcessor, StatefulProcessor),
        {},
    )
    src = events.withWatermark(ts_col, watermark)
    keyed = src.selectExpr(
        "user_id", f"{ts_col} AS event_timestamp"
    ).groupBy("user_id")
    return keyed.transformWithStateInPandas(
        proc_cls(),
        outputStructType=FIRST_SEEN_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
