"""Streaming joins: stream-static enrichment and watermarked
stream-stream joins — the streaming twins of the batch dimension join
and the temporal pair join (``operators/temporal.py``).

The reference never joins (SURVEY.md §2.5); its enrichment equivalent
is Kafka Connect's SMT layer. In Spark both shapes are first-class:

- stream-static: the static side is re-read per micro-batch (picks up
  dim updates) and broadcast when small — no state, no watermark
  needed;
- stream-stream: both sides buffer in the state store; the watermark
  plus the time-bound join condition bound the buffered range, so
  state stays O(window), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "2 minutes"


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static equi-join (enrichment). ``dim`` is a batch
    DataFrame; Spark re-plans it every micro-batch. Broadcast is the
    right physical choice for any dimension that fits an executor."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on, "left")


def purchases_after_views(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "15 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """Watermarked stream-stream inner join: purchase events matched to
    same-user view events that happened in the preceding ``within``
    interval — the streaming form of the batch bucketed range join
    (``event_pairs_within_window``).

    State bound: views buffer for (watermark + within); purchases for
    (watermark). The time-bound condition is what lets Spark evict —
    an unbounded-condition stream-stream join would hold state
    forever.
    """
    v = views.withWatermark(ts_col, watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col(ts_col).alias("view_ts"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            f"""
            v_user = p_user AND
            purchase_ts > view_ts AND
            purchase_ts <= view_ts + INTERVAL {within}
            """
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        (F.unix_millis("purchase_ts") - F.unix_millis("view_ts")).alias("gap_ms"),
    )


def views_without_purchase(
    views: DataFrame,
    purchases: DataFrame,
    within: str = "15 minutes",
    watermark: str = DEFAULT_WATERMARK,
    ts_col: str = "event_timestamp",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every view, matched
    to a purchase in the following ``within`` interval when one exists,
    emitted with a NULL purchase once the watermark proves none can
    still arrive — the streaming abandonment feed (the complement of
    ``purchases_after_views``).

    Outer semantics are watermark-driven: an unmatched view is held in
    state until event time passes view_ts + within + watermark, THEN
    emitted with nulls. Until that point it is neither matched nor
    abandoned — late-purchase safety, not a bug. State bound matches
    the inner join's.
    """
    v = views.withWatermark(ts_col, watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col(ts_col).alias("view_ts"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    return v.join(
        p,
        F.expr(
            f"""
            v_user = p_user AND
            purchase_ts > view_ts AND
            purchase_ts <= view_ts + INTERVAL {within}
            """
        ),
        "left_outer",
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.when(F.col("purchase_id").isNull(), 0).otherwise(1).alias("converted"),
    )
