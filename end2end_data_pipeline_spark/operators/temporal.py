"""Temporal join operators the reference's single-table world never
had but a 100 TB event warehouse needs: as-of join, time-range
self-join, and dimension range (non-equi) join.

Spark has no ASOF JOIN or native range join, so these are the classic
scale-correct compositions:

- **as-of** = union both sides + one window pass (`last(..., ignorenulls)`)
  — a single shuffle on the join key, no row explosion, no inequality
  join. This is the standard big-data as-of shape (one sort-merge per
  key instead of a per-row backward scan).
- **time-range self-join** = bucket event-time to the window width and
  equi-join on (key, bucket) ∪ (key, bucket+1), then apply the exact
  range predicate. Turns an O(n²) inequality join into a shuffle-bounded
  equi-join; candidate blowup is ≤2× rows.
- **dimension range join** = broadcast the (tiny) interval dim and let
  BroadcastNestedLoopJoin evaluate the band predicate — correct choice
  when one side is O(10) rows, any scale on the other.

Reference parity: the reference has no joins at all (SURVEY.md §2.5);
these extend its event table (`producer/user_event_schema.avsc`) analog
with the funnel/attribution queries its data shape implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import load_table

RANGE_MS = 900_000  # 15-minute pairing window


@query(
    "asof_last_view_before_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, max(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ms,
           v.view_id,
           epoch_ms(p.ts) - epoch_ms(v.ts) AS gap_ms
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_id
    """,
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the latest view at-or-
    before it by the same user. Implemented as union + one windowed
    ``last(ignorenulls)`` pass — one shuffle on user_id, zero row
    explosion (the shape that survives 100 TB; a per-row inequality
    join would not). Views are pre-deduped per (user, ts) so ties are
    deterministic in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
        .select(
            "user_id",
            "ts",
            "view_id",
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("view_id"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("purchase_id"),
    )
    # kind sorts views before purchases at equal ts => ASOF's `>=`
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).select(
        "*",
        F.last("view_id", ignorenulls=True).over(w).alias("last_view_id"),
        F.last(
            F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_view_ts"),
    )
    return (
        merged.where(F.col("kind") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.unix_millis("ts").alias("purchase_ms"),
            F.col("last_view_id").alias("view_id"),
            (F.unix_millis("ts") - F.unix_millis("last_view_ts")).alias("gap_ms"),
        )
        .orderBy("purchase_id")
    )


@query(
    "event_pairs_within_window",
    oracle=f"""
    SELECT a.event_type AS src_type, b.event_type AS dst_type,
           count(*) AS n_pairs,
           CAST(SUM(epoch_ms(b.ts) - epoch_ms(a.ts)) AS BIGINT) AS total_gap_ms
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_ms(b.ts) > epoch_ms(a.ts)
     AND epoch_ms(b.ts) <= epoch_ms(a.ts) + {RANGE_MS}
    GROUP BY src_type, dst_type ORDER BY src_type, dst_type
    """,
)
def event_pairs_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range self-join (event pairs by the same user ≤15 min
    apart), bucketed: equi-join on (user_id, time_bucket) with the left
    side exploded to {bucket, bucket+1}, exact band predicate applied
    after. The oracle is the naive inequality join — identical result,
    quadratically worse plan. All time math in exact epoch-ms integers.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
    )
    ev = ev.withColumn("bucket", F.floor(F.col("ts_ms") / RANGE_MS))
    left = ev.select(
        F.col("user_id").alias("a_user"),
        F.col("event_type").alias("src_type"),
        F.col("ts_ms").alias("a_ms"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("cand"),
    )
    right = ev.select(
        F.col("user_id").alias("b_user"),
        F.col("event_type").alias("dst_type"),
        F.col("ts_ms").alias("b_ms"),
        F.col("bucket").alias("b_bucket"),
    )
    pairs = left.join(
        right,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("cand") == F.col("b_bucket"))
        & (F.col("b_ms") > F.col("a_ms"))
        & (F.col("b_ms") <= F.col("a_ms") + RANGE_MS),
    )
    return (
        pairs.groupBy("src_type", "dst_type")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("b_ms") - F.col("a_ms")).alias("total_gap_ms"),
        )
        .orderBy("src_type", "dst_type")
    )


TIERS = [
    ("T1_low", 0.0, 50.0),
    ("T2_mid", 50.0, 100.0),
    ("T3_high", 100.0, 250.0),
    ("T4_top", 250.0, None),
]


@query(
    "value_tier_range_join",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('T1_low', 0.0, 50.0), ('T2_mid', 50.0, 100.0),
             ('T3_high', 100.0, 250.0), ('T4_top', 250.0, NULL)
    )
    SELECT t.tier, count(*) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events e JOIN tiers t
      ON e.value >= t.lo AND (t.hi IS NULL OR e.value < t.hi)
    GROUP BY t.tier ORDER BY t.tier
    """,
)
def value_tier_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (non-equi) join of a fact table against a tiny interval
    dimension. The dim is broadcast explicitly — a
    BroadcastNestedLoopJoin over 4 rows is O(4) comparisons per event
    and never shuffles the fact side, which is the only acceptable
    non-equi plan at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(TIERS, "tier string, lo double, hi double")
    joined = ev.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo"))
        & (F.col("hi").isNull() | (F.col("value") < F.col("hi"))),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("tier")
    )


GAP_BUCKET_MS = 60_000


@query(
    "event_interarrival_histogram",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ) AS gap_ms
      FROM events
    )
    SELECT CAST((gap_ms // {GAP_BUCKET_MS}) AS BIGINT) AS gap_minutes,
           count(*) AS n_gaps
    FROM gaps WHERE gap_ms IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def event_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time histogram (minute buckets): lag over
    (user_id, event-time) then an integer-bucket rollup — the session-
    gap diagnostic behind choosing a sessionization timeout. One
    shuffle on user_id for the lag, one tiny rollup; the event-time
    sort happens within each user partition, never globally."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_millis("ts"), F.col("event_id")
    )
    gaps = ev.select(
        (F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)).alias(
            "gap_ms"
        )
    ).where(F.col("gap_ms").isNotNull())
    return (
        gaps.select(
            F.floor(F.col("gap_ms") / GAP_BUCKET_MS)
            .cast("bigint")
            .alias("gap_minutes")
        )
        .groupBy("gap_minutes")
        .agg(F.count("*").alias("n_gaps"))
        .orderBy("gap_minutes")
    )
