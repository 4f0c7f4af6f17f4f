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


# --- linear multi-touch attribution --------------------------------------

ATTR_WINDOW_S = 1800  # lookback seconds before each purchase
ATTR_SCALE = 1_000_000  # millicredit scale: integer credit per touch

_ATTR_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS em
      FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ), counted AS (
      -- COALESCE: SUM over an EMPTY range frame is NULL in both
      -- engines, and a purchase with no preceding event at all must
      -- count as zero touches, not null ones
      SELECT user_id, em,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) OVER w, 0)
               AS BIGINT) AS nv,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                                    THEN 1 ELSE 0 END) OVER w, 0)
               AS BIGINT) AS nc
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY em
                   RANGE BETWEEN {ATTR_WINDOW_S * 1_000_000} PRECEDING
                             AND 1 PRECEDING)
      QUALIFY event_type = 'purchase'
    ), credited AS (
      SELECT nv, nc, nv + nc AS n,
             CASE WHEN nv + nc > 0 THEN {ATTR_SCALE} // (nv + nc)
                  ELSE 0 END AS mc
      FROM counted
    ), chan AS (
      SELECT 'view' AS channel, nv AS touches, nv * mc AS credits,
             CASE WHEN nv > 0 THEN 1 ELSE 0 END AS touched
      FROM credited
      UNION ALL
      SELECT 'click', nc, nc * mc, CASE WHEN nc > 0 THEN 1 ELSE 0 END
      FROM credited
      UNION ALL
      SELECT 'unattributed', 0, {ATTR_SCALE},
             CASE WHEN n = 0 THEN 1 ELSE 0 END
      FROM credited WHERE n = 0
    )
    SELECT channel,
           CAST(SUM(touched) AS BIGINT) AS n_purchases_touched,
           CAST(SUM(touches) AS BIGINT) AS n_touches,
           CAST(SUM(credits) AS BIGINT) AS millicredits
    FROM chan GROUP BY channel ORDER BY channel
    """


@query("purchase_linear_attribution", oracle=_ATTR_ORACLE)
def purchase_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click in the
    {WIN}-second lookback before a purchase by the same user shares
    that purchase's credit equally — the multi-touch answer to
    ``asof_last_view_before_purchase``'s last-touch model. Credit is
    an exact INTEGER number of millicredits (floor({SCALE}/n) per
    touch): floating 1/n shares would accumulate in engine-dependent
    order and never hash-match, while integer credit sums exactly and
    under-counts each purchase by at most n-1 millicredits (the
    documented floor remainder). Purchases with no preceding touch
    land in an explicit 'unattributed' channel with full credit, so
    credit conservation is auditable.

    Scale: NO inequality join — per-channel touch counts come from
    conditional sums over a RANGE window frame on the microsecond
    timestamp (one shuffle on user_id, the as-of precedent), so there
    is zero row explosion however bursty the traffic; channels then
    explode from each purchase row (3 structs) into one bounded
    rollup."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view", "click")
    )
    em = F.expr("unix_micros(ts)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("em")
        .rangeBetween(-ATTR_WINDOW_S * 1_000_000, -1)
    )
    # coalesce: SUM over an EMPTY range frame is NULL — a purchase
    # with no preceding event at all must count zero touches
    counted = (
        ev.select("user_id", "event_type", em.alias("em"))
        .select(
            "event_type",
            F.coalesce(
                F.sum((F.col("event_type") == "view").cast("int")).over(w),
                F.lit(0),
            )
            .cast("bigint")
            .alias("nv"),
            F.coalesce(
                F.sum((F.col("event_type") == "click").cast("int")).over(w),
                F.lit(0),
            )
            .cast("bigint")
            .alias("nc"),
        )
        .where(F.col("event_type") == "purchase")
    )
    credited = counted.select(
        "nv",
        "nc",
        (F.col("nv") + F.col("nc")).alias("n"),
        F.when(
            F.col("nv") + F.col("nc") > 0,
            F.expr(f"{ATTR_SCALE} div (nv + nc)"),
        )
        .otherwise(F.lit(0))
        .alias("mc"),
    )
    chan = credited.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view").alias("channel"),
                    F.col("nv").alias("touches"),
                    (F.col("nv") * F.col("mc")).alias("credits"),
                    (F.col("nv") > 0).cast("int").alias("touched"),
                ),
                F.struct(
                    F.lit("click").alias("channel"),
                    F.col("nc").alias("touches"),
                    (F.col("nc") * F.col("mc")).alias("credits"),
                    (F.col("nc") > 0).cast("int").alias("touched"),
                ),
                F.struct(
                    F.lit("unattributed").alias("channel"),
                    F.lit(0).cast("bigint").alias("touches"),
                    F.when(F.col("n") == 0, F.lit(ATTR_SCALE))
                    .otherwise(F.lit(0))
                    .cast("bigint")
                    .alias("credits"),
                    (F.col("n") == 0).cast("int").alias("touched"),
                ),
            )
        ).alias("c")
    ).where(~((F.col("c.channel") == "unattributed") & (F.col("c.touched") == 0)))
    return (
        chan.groupBy(F.col("c.channel").alias("channel"))
        .agg(
            F.sum("c.touched").cast("bigint").alias("n_purchases_touched"),
            F.sum("c.touches").cast("bigint").alias("n_touches"),
            F.sum("c.credits").cast("bigint").alias("millicredits"),
        )
        .orderBy("channel")
    )


purchase_linear_attribution.__doc__ = (
    (purchase_linear_attribution.__doc__ or "")
    .replace("{WIN}", str(ATTR_WINDOW_S))
    .replace("{SCALE}", str(ATTR_SCALE))
)


_ATTR_COMPARE_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS em
      FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ), scanned AS (
      -- COALESCE only the SUMs (empty-frame SUM is NULL in both
      -- engines); the MIN/MAX NULLs are meaningful (no touch of that
      -- type in the window) and feed the CASE ladders directly
      SELECT user_id, em,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                    THEN 1 ELSE 0 END) OVER w, 0)
               AS BIGINT) AS nv,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                                    THEN 1 ELSE 0 END) OVER w, 0)
               AS BIGINT) AS nc,
             MIN(CASE WHEN event_type = 'view' THEN em END) OVER w AS fv,
             MIN(CASE WHEN event_type = 'click' THEN em END) OVER w AS fc,
             MAX(CASE WHEN event_type = 'view' THEN em END) OVER w AS lv,
             MAX(CASE WHEN event_type = 'click' THEN em END) OVER w AS lc
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY em
                   RANGE BETWEEN {ATTR_WINDOW_S * 1_000_000} PRECEDING
                             AND 1 PRECEDING)
      QUALIFY event_type = 'purchase'
    ), modeled AS (
      SELECT nv, nc, nv + nc AS n,
             CASE WHEN nv + nc > 0 THEN {ATTR_SCALE} // (nv + nc)
                  ELSE 0 END AS mc,
             CASE WHEN fv IS NULL AND fc IS NULL THEN 'unattributed'
                  WHEN fv IS NULL THEN 'click'
                  WHEN fc IS NULL THEN 'view'
                  WHEN fc <= fv THEN 'click' ELSE 'view' END AS first_ch,
             CASE WHEN lv IS NULL AND lc IS NULL THEN 'unattributed'
                  WHEN lv IS NULL THEN 'click'
                  WHEN lc IS NULL THEN 'view'
                  WHEN lc >= lv THEN 'click' ELSE 'view' END AS last_ch
      FROM scanned
    ), rows_out AS (
      SELECT 'first_touch' AS model, first_ch AS channel,
             CAST({ATTR_SCALE} AS BIGINT) AS credits FROM modeled
      UNION ALL
      SELECT 'last_touch', last_ch, CAST({ATTR_SCALE} AS BIGINT)
      FROM modeled
      UNION ALL
      SELECT 'linear', 'view', CAST(nv * mc AS BIGINT)
      FROM modeled WHERE nv > 0
      UNION ALL
      SELECT 'linear', 'click', CAST(nc * mc AS BIGINT)
      FROM modeled WHERE nc > 0
      UNION ALL
      SELECT 'linear', 'unattributed', CAST({ATTR_SCALE} AS BIGINT)
      FROM modeled WHERE n = 0
    )
    SELECT model, channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(credits) AS BIGINT) AS millicredits
    FROM rows_out GROUP BY model, channel ORDER BY model, channel
    """


@query("purchase_attribution_model_compare", oracle=_ATTR_COMPARE_ORACLE)
def purchase_attribution_model_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch vs last-touch vs linear attribution from ONE
    window pass — the model-sensitivity table a marketing team reads
    before trusting any channel ROI number. Per purchase, the same
    {WIN}-second lookback frame yields the touch counts (linear
    credit, integer millicredits as in ``purchase_linear_attribution``)
    plus the first/last touch CHANNEL via per-type MIN/MAX of the
    touch timestamp — a simultaneous view+click microsecond resolves
    to 'click' by a fixed rule, so both engines elect identically.
    Purchases with an empty lookback land in 'unattributed' under
    every model, keeping total credit conserved per model.

    Scale: identical shape to the linear op — one user_id shuffle,
    six aggregates over the SAME range frame (one window scan),
    zero row explosion, O(models x channels) output."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view", "click")
    )
    em = F.expr("unix_micros(ts)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("em")
        .rangeBetween(-ATTR_WINDOW_S * 1_000_000, -1)
    )
    is_view = F.col("event_type") == "view"
    is_click = F.col("event_type") == "click"
    scanned = (
        ev.select("user_id", "event_type", em.alias("em"))
        .select(
            "event_type",
            F.coalesce(F.sum(is_view.cast("int")).over(w), F.lit(0))
            .cast("bigint")
            .alias("nv"),
            F.coalesce(F.sum(is_click.cast("int")).over(w), F.lit(0))
            .cast("bigint")
            .alias("nc"),
            F.min(F.when(is_view, F.col("em"))).over(w).alias("fv"),
            F.min(F.when(is_click, F.col("em"))).over(w).alias("fc"),
            F.max(F.when(is_view, F.col("em"))).over(w).alias("lv"),
            F.max(F.when(is_click, F.col("em"))).over(w).alias("lc"),
        )
        .where(F.col("event_type") == "purchase")
    )

    def _elect(view_em: str, click_em: str) -> F.Column:
        return (
            F.when(
                F.col(view_em).isNull() & F.col(click_em).isNull(),
                F.lit("unattributed"),
            )
            .when(F.col(view_em).isNull(), F.lit("click"))
            .when(F.col(click_em).isNull(), F.lit("view"))
        )

    modeled = scanned.select(
        "nv",
        "nc",
        (F.col("nv") + F.col("nc")).alias("n"),
        F.when(
            F.col("nv") + F.col("nc") > 0,
            F.expr(f"{ATTR_SCALE} div (nv + nc)"),
        )
        .otherwise(F.lit(0))
        .alias("mc"),
        _elect("fv", "fc")
        .when(F.col("fc") <= F.col("fv"), F.lit("click"))
        .otherwise(F.lit("view"))
        .alias("first_ch"),
        _elect("lv", "lc")
        .when(F.col("lc") >= F.col("lv"), F.lit("click"))
        .otherwise(F.lit("view"))
        .alias("last_ch"),
    )
    scale = F.lit(ATTR_SCALE).cast("bigint")
    rows_out = modeled.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("first_ch").alias("channel"),
                    scale.alias("credits"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("last_ch").alias("channel"),
                    scale.alias("credits"),
                ),
                F.struct(
                    F.lit("linear").alias("model"),
                    F.lit("view").alias("channel"),
                    F.when(F.col("nv") > 0, F.col("nv") * F.col("mc"))
                    .cast("bigint")
                    .alias("credits"),
                ),
                F.struct(
                    F.lit("linear").alias("model"),
                    F.lit("click").alias("channel"),
                    F.when(F.col("nc") > 0, F.col("nc") * F.col("mc"))
                    .cast("bigint")
                    .alias("credits"),
                ),
                F.struct(
                    F.lit("linear").alias("model"),
                    F.lit("unattributed").alias("channel"),
                    F.when(F.col("n") == 0, scale).cast("bigint").alias("credits"),
                ),
            )
        ).alias("r")
    ).where(F.col("r.credits").isNotNull())
    return (
        rows_out.groupBy(
            F.col("r.model").alias("model"), F.col("r.channel").alias("channel")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum("r.credits").cast("bigint").alias("millicredits"),
        )
        .orderBy("model", "channel")
    )


purchase_attribution_model_compare.__doc__ = (
    purchase_attribution_model_compare.__doc__ or ""
).replace("{WIN}", str(ATTR_WINDOW_S))
