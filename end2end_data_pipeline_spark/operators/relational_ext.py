"""Extended relational coverage: parameterized SQL (P5), epoch-ms
round-trips (F4), string munging (F5), scalar subqueries, set ops,
exact-median, arg-max, and the salted-aggregation skew pattern
(SURVEY.md §7 Phase 5).

The salted aggregation is semantically identical to a plain group-by —
its point is the two-phase shuffle shape that survives hot keys at
100 TB (pre-aggregate on (key, salt), then re-aggregate on key; the
first shuffle spreads a hot key over N reducers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import (
    load_table,
    register_views,
    session_cached,
    sf_tag,
)

N_SALTS = 8


@query(
    "param_sql_minute_extract",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-11 00:00:00'
    GROUP BY event_type ORDER BY event_type
    """,
)
def param_sql_minute_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — the reference's injection-safe parameterized extract
    (``airflow/dags/pipeline.py:135,140-143``) as Spark parameterized
    SQL (named args, Spark >= 3.4)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, count(*) AS n
        FROM events
        WHERE ts >= :start AND ts < :end
        GROUP BY event_type ORDER BY event_type
        """,
        args={"start": "2024-01-10 00:00:00", "end": "2024-01-11 00:00:00"},
    )


@query(
    "epoch_ms_roundtrip",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           strftime(date_trunc('minute', ts), '%Y-%m-%d_%H-%M') AS minute_name
    FROM events
    WHERE event_id % 97 = 0
    ORDER BY event_id
    """,
)
def epoch_ms_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — epoch-ms extraction (the producer's ``int(time.time()*1000)``
    and the connector's TimestampConverter SMT) plus the reference's
    minute-file naming format (F3)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 97 == 0)
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd_HH-mm").alias(
            "minute_name"
        ),
    ).orderBy("event_id")


@query(
    "string_munging_props",
    oracle="""
    SELECT upper(event_type) AS type_upper,
           substring(event_type, 1, 3) AS type_prefix,
           regexp_replace(props, '[^0-9]', '', 'g') AS digits,
           concat(event_type, '#', CAST(user_id AS VARCHAR)) AS tagged,
           count(*) AS n
    FROM events
    WHERE event_id % 101 = 0
    GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
    """,
)
def string_munging_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — the reference's path/name munging chains (rsplit/replace/
    split) as regexp_replace / substring / concat expressions."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 101 == 0)
    return (
        ev.groupBy(
            F.upper("event_type").alias("type_upper"),
            F.substring("event_type", 1, 3).alias("type_prefix"),
            F.regexp_replace("props", "[^0-9]", "").alias("digits"),
            F.concat(
                F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")
            ).alias("tagged"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("type_upper", "type_prefix", "digits", "tagged")
    )


@query(
    "customers_above_avg_balance",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM customer
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * (SELECT count(*) FROM customer)
          > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer)
    ORDER BY c_custkey
    """,
)
def customers_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery against a global aggregate. The 'above average'
    predicate is cross-multiplied into exact integer arithmetic
    (cents * n > total_cents) so no engine ever divides — FP-free."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * (SELECT count(*) FROM customer)
              > (SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) FROM customer)
        ORDER BY c_custkey
        """
    )


@query(
    "customer_only_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    ORDER BY nationkey
    """,
)
def customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT): nations hosting a high-balance
    customer but no high-balance supplier. The balance predicate keeps
    the difference non-empty on the fixture (every nation has both
    customers and suppliers, so the unfiltered EXCEPT is vacuously
    empty and proves nothing)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 9000
    ).select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") > 9000
    ).select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@query(
    "shared_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def shared_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: nations hosting both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


@query(
    "salted_user_event_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id
    HAVING count(*) >= 5
    ORDER BY user_id
    """,
)
def salted_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: pre-aggregate on
    (user_id, salt) — spreading any hot user over N_SALTS reducers —
    then re-aggregate on user_id. Semantically identical to a plain
    group-by (the oracle), which is exactly the point."""
    ev = load_table(spark, sf_dir, "events")
    salted = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
        .groupBy("user_id", "salt")
        .agg(F.count("*").alias("partial_n"))
    )
    return (
        salted.groupBy("user_id")
        .agg(F.sum("partial_n").alias("n_events"))
        .where(F.col("n_events") >= 5)
        .orderBy("user_id")
    )


@query(
    "status_extreme_orders",
    # Tie-break: two orders in a status group can share the same
    # rounded price, and bare arg_max/max_by would then return an
    # engine-nondeterministic orderkey. Both sides order by
    # (cents, orderkey): Spark via struct ordering, DuckDB via a
    # zero-padded fixed-width string key (lexicographic == numeric
    # for nonnegative ints).
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey,
                   lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 14, '0')
                   || lpad(CAST(o_orderkey AS VARCHAR), 14, '0'))
               AS max_price_orderkey,
           arg_min(o_orderkey,
                   lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 14, '0')
                   || lpad(CAST(o_orderkey AS VARCHAR), 14, '0'))
               AS min_price_orderkey,
           MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS max_cents
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def status_extreme_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) aggregates on the integer-cents domain,
    with a total-order (cents, orderkey) tie-break."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    key = F.struct(cents.alias("cents"), F.col("o_orderkey"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", key).alias("max_price_orderkey"),
            F.min_by("o_orderkey", key).alias("min_price_orderkey"),
            F.max(cents).alias("max_cents"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "lineitem_quantity_quartiles",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def lineitem_quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) quartiles per group. Quartile positions on
    an integer-valued domain interpolate at exact binary fractions
    ((n-1)*q is a multiple of 1/4), so Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` agree bit-for-bit — no rounding shim.
    At scale the exact percentile is a full sort per group; swap to
    ``approx_percentile`` (t-digest, mergeable, one pass) when the
    group payload no longer fits an executor."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.expr("percentile(l_quantity, 0.25D)").alias("q25"),
            F.expr("percentile(l_quantity, 0.5D)").alias("q50"),
            F.expr("percentile(l_quantity, 0.75D)").alias("q75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "order_priority_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def order_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^k margin combinations; complements the
    ROLLUP in ``order_status_rollup``). One shuffle: Spark expands the
    grouping sets map-side and aggregates them together."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "total_cents"
            ),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total_cents",
        )
        .orderBy("status", "priority")
    )


@query(
    "orders_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY status, priority
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent 1-D margins in one
    pass) — the general form underlying ROLLUP/CUBE, via Spark SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY status, priority
        """
    )


@query(
    "sql_region_summary",
    oracle="""
    SELECT r_name,
           count(DISTINCT n_nationkey) AS n_nations,
           count(*) AS n_customers
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def sql_region_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL entry point (the engine's spark.sql surface over
    registered views) — same text runs on both engines."""
    register_views(spark, sf_dir, "region", "nation", "customer")
    return spark.sql(
        """
        SELECT r_name,
               count(DISTINCT n_nationkey) AS n_nations,
               count(*) AS n_customers
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        GROUP BY r_name ORDER BY r_name
        """
    )


@query(
    "orders_moving_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             datediff('day', DATE '1995-01-01',
                      CAST(date_trunc('day', o_orderdate) AS DATE)) AS day_idx,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           rev_cents,
           CAST(SUM(rev_cents) OVER (ORDER BY day_idx
                                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS rev_7d_cents,
           ntile(4) OVER (ORDER BY rev_cents, d) AS rev_quartile
    FROM daily
    ORDER BY day LIMIT 200
    """,
)
def orders_moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame moving window: 7-day trailing revenue over daily
    totals (a true value-range frame — days with no orders widen the
    window correctly, unlike a ROWS frame) plus an ntile quartile.
    Both engines order by an integer day index, so frame boundaries
    are engine-exact."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "rev_cents"
            )
        )
        .withColumn("day_idx", F.datediff(F.col("d"), F.lit("1995-01-01")))
    )
    w7 = Window.orderBy("day_idx").rangeBetween(-6, 0)
    wq = Window.orderBy("rev_cents", "d")
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "rev_cents",
            F.sum("rev_cents").over(w7).alias("rev_7d_cents"),
            F.ntile(4).over(wq).alias("rev_quartile"),
        )
        .orderBy("day")
        .limit(200)
    )


@query(
    "lineitem_charge_unpivot",
    oracle="""
    WITH charges AS (
      SELECT l_returnflag, 'base' AS charge_type,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount',
             CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax',
             CAST(ROUND(l_extendedprice * l_tax * 100) AS BIGINT)
      FROM lineitem
    )
    SELECT l_returnflag, charge_type,
           count(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM charges
    GROUP BY l_returnflag, charge_type
    ORDER BY l_returnflag, charge_type
    """,
)
def lineitem_charge_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the pivot's inverse): three charge components per
    lineitem widen into (charge_type, cents) rows via the native
    ``unpivot`` operator — a map-side transform (no shuffle until the
    aggregate), unlike the oracle's 3-scan UNION ALL formulation which
    reads the table three times. Same result, 3x less IO."""
    li = load_table(spark, sf_dir, "lineitem")
    charges = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("base"),
        F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("bigint")
        .alias("discount"),
        F.round(F.col("l_extendedprice") * F.col("l_tax") * 100)
        .cast("bigint")
        .alias("tax"),
    ).unpivot(
        ids=["l_returnflag"],
        values=["base", "discount", "tax"],
        variableColumnName="charge_type",
        valueColumnName="cents",
    )
    return (
        charges.groupBy("l_returnflag", "charge_type")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("total_cents"))
        .orderBy("l_returnflag", "charge_type")
    )


@query(
    "order_value_distribution",
    # percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are double
    # divisions of exact integers — IEEE correctly-rounded the same in
    # both engines, so the hashes match bit-for-bit.
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(10) OVER w AS INT) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY ROUND(o_totalprice * 100), o_orderkey)
    ORDER BY o_orderkey
    """,
)
def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-rank family over orders: percent_rank / cume_dist /
    ntile per status partition with a total-order tie-break. One
    shuffle on the partition key; each partition ranks independently
    (at 100 TB the per-status partitions are the unit of parallelism —
    a single giant status would call for range-partitioned global
    sorting instead)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.round(F.col("o_totalprice") * 100), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            cents.alias("cents"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(10).over(w).cast("int").alias("decile"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "customer_order_bookends",
    # first_value/last_value demand an explicit frame: the default
    # RANGE ... CURRENT ROW makes last_value mean "current row" — the
    # classic window-frame trap, pinned here to the full partition.
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def customer_order_bookends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-pinned positional window functions: each order annotated
    with its customer's first / second / last order over the FULL
    partition frame (UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING) — with
    the default frame, last_value degenerates to the current row. One
    shuffle on o_custkey; total-order (date, orderkey) within."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
            F.count("*").over(w).cast("bigint").alias("n_orders"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "lineitem_profile",
    oracle="""
    SELECT 'l_quantity' AS col, count(*) AS n_rows,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS VARCHAR) AS min_v,
           CAST(MAX(l_quantity) AS VARCHAR) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*),
           CAST(count(*) - count(l_returnflag) AS BIGINT),
           count(DISTINCT l_returnflag),
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', count(*),
           CAST(count(*) - count(l_linenumber) AS BIGINT),
           count(DISTINCT l_linenumber),
           CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR)
    FROM lineitem
    ORDER BY col
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling operator (the quality report a pipeline runs on
    ingest): per-column row/null/distinct counts and min/max, stringly
    typed so heterogeneous columns stack in one result. Spark computes
    ALL columns in a single scan (one wide aggregate, then an explode
    of per-column structs) — the oracle's UNION ALL formulation scans
    once per column, fine for DuckDB, wrong at 100 TB.

    Scale: one pass, count_distinct expands per column into a partial
    two-phase aggregate; min/max/count are trivial partials."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_returnflag", "l_linenumber"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__null"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    struct_arr = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__null").alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(struct_arr).alias("p"))
        .select("p.col", "p.n_rows", "p.n_null", "p.n_distinct", "p.min_v", "p.max_v")
        .orderBy("col")
    )


RFM_TILES = 5


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), tiled AS (
      SELECT o_custkey, frequency, monetary_cents,
             ntile({RFM_TILES}) OVER (ORDER BY last_order DESC, o_custkey)
               AS r_tile,
             ntile({RFM_TILES}) OVER (ORDER BY frequency DESC, o_custkey)
               AS f_tile,
             ntile({RFM_TILES}) OVER (ORDER BY monetary_cents DESC, o_custkey)
               AS m_tile
      FROM rfm
    )
    SELECT CAST(r_tile AS INT) AS r_tile,
           CAST(f_tile AS INT) AS f_tile,
           CAST(m_tile AS INT) AS m_tile,
           count(*) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM tiled
    GROUP BY r_tile, f_tile, m_tile
    ORDER BY r_tile, f_tile, m_tile
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation:
    quintile each customer on last order date, order count, and exact
    lifetime spend, then roll up the {RFM_TILES}^3 segment grid — the
    classic marketing-analytics cube. Money is summed in exact integer
    cents (round(price*100)) so both engines agree bit-for-bit; ntile
    runs over a TOTAL order (metric + custkey tie-break), which makes
    tile assignment deterministic.

    Scale: one shuffle keyed on o_custkey with map-side partials; the
    three global ntile windows sort the per-customer table (O(customers),
    not O(orders)) — at 100 TB swap the global sort for percentile-
    bucketed tiles if customers outgrow a single window partition
    (documented trade; the 125-cell rollup itself is trivial)."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    tiled = rfm.select(
        "o_custkey",
        "frequency",
        "monetary_cents",
        F.ntile(RFM_TILES)
        .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
        .alias("r_tile"),
        F.ntile(RFM_TILES)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f_tile"),
        F.ntile(RFM_TILES)
        .over(Window.orderBy(F.col("monetary_cents").desc(), "o_custkey"))
        .alias("m_tile"),
    )
    return (
        tiled.groupBy(
            F.col("r_tile").cast("int").alias("r_tile"),
            F.col("f_tile").cast("int").alias("f_tile"),
            F.col("m_tile").cast("int").alias("m_tile"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
        )
        .orderBy("r_tile", "f_tile", "m_tile")
    )


@query(
    "customer_rfm_segments_bucketed",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             datediff('day', DATE '1970-01-01', MAX(o_orderdate))
               AS last_order_days,
             count(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ), bounds AS (
      SELECT quantile_cont(last_order_days, 0.2) AS r1,
             quantile_cont(last_order_days, 0.4) AS r2,
             quantile_cont(last_order_days, 0.6) AS r3,
             quantile_cont(last_order_days, 0.8) AS r4,
             quantile_cont(frequency, 0.2) AS f1,
             quantile_cont(frequency, 0.4) AS f2,
             quantile_cont(frequency, 0.6) AS f3,
             quantile_cont(frequency, 0.8) AS f4,
             quantile_cont(monetary_cents, 0.2) AS m1,
             quantile_cont(monetary_cents, 0.4) AS m2,
             quantile_cont(monetary_cents, 0.6) AS m3,
             quantile_cont(monetary_cents, 0.8) AS m4
      FROM rfm
    ), tiled AS (
      SELECT o_custkey, monetary_cents,
             1 + CAST(last_order_days > r1 AS INT)
               + CAST(last_order_days > r2 AS INT)
               + CAST(last_order_days > r3 AS INT)
               + CAST(last_order_days > r4 AS INT) AS r_bucket,
             1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
               + CAST(frequency > f3 AS INT) + CAST(frequency > f4 AS INT)
               AS f_bucket,
             1 + CAST(monetary_cents > m1 AS INT)
               + CAST(monetary_cents > m2 AS INT)
               + CAST(monetary_cents > m3 AS INT)
               + CAST(monetary_cents > m4 AS INT) AS m_bucket
      FROM rfm CROSS JOIN bounds
    )
    SELECT CAST(r_bucket AS INT) AS r_bucket,
           CAST(f_bucket AS INT) AS f_bucket,
           CAST(m_bucket AS INT) AS m_bucket,
           count(*) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM tiled
    GROUP BY r_bucket, f_bucket, m_bucket
    ORDER BY r_bucket, f_bucket, m_bucket
    """,
)
def customer_rfm_segments_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB-safe RFM variant: instead of three global ntile
    sorts over all customers (a single-partition window at scale),
    compute the four quintile BOUNDARIES per metric once (one tiny
    all-to-one aggregate) and assign buckets by comparison — a
    per-row expression the scan evaluates, no global sort anywhere.
    Boundary ties go to the lower bucket (strict >), so bucket
    population can deviate from exact ntile on tied metrics — the
    standard, documented trade of the scalable form. Same exact
    integer-cent money math as customer_rfm_segments.

    Scale: one o_custkey-keyed shuffle; the boundary row (12 doubles)
    cross-joins back as a 1-row broadcast (the scalar-subquery attach
    pattern, waived BNLJ)."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .alias("last_order_days"),
        F.count("*").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    bounds = rfm.agg(
        *[
            F.expr(f"percentile({m}, {p})").alias(f"{a}{i}")
            for m, a in (
                ("last_order_days", "r"),
                ("frequency", "f"),
                ("monetary_cents", "m"),
            )
            for i, p in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
        ]
    )
    def bucket(metric: str, a: str):
        e = F.lit(1)
        for i in (1, 2, 3, 4):
            e = e + (F.col(metric) > F.col(f"{a}{i}")).cast("int")
        return e

    tiled = rfm.join(F.broadcast(bounds)).select(
        "o_custkey",
        "monetary_cents",
        bucket("last_order_days", "r").alias("r_bucket"),
        bucket("frequency", "f").alias("f_bucket"),
        bucket("monetary_cents", "m").alias("m_bucket"),
    )
    return (
        tiled.groupBy(
            F.col("r_bucket").cast("int").alias("r_bucket"),
            F.col("f_bucket").cast("int").alias("f_bucket"),
            F.col("m_bucket").cast("int").alias("m_bucket"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


@query(
    "orders_seasonality_dow",
    # ISO day-of-week: DuckDB isodow == Spark weekday+1 (1=Mon..7=Sun).
    # mean_cents and the seasonality index are identical-shaped double
    # expressions over exact integers, so both engines emit
    # bit-identical doubles regardless of aggregation order. Operands
    # are cast to DOUBLE BEFORE the products: cents*n_total in BIGINT
    # overflows int64 at large scale, where DuckDB raises but
    # non-ANSI Spark wraps silently — the double-first shape keeps the
    # engines in lockstep at any scale (IEEE mul/div are correctly
    # rounded, same tree shape on both sides).
    oracle="""
    WITH dows AS (
      SELECT CAST(isodow(o_orderdate) AS INT) AS dow,
             count(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT dow, n_orders, cents,
             CAST(SUM(n_orders) OVER () AS BIGINT) AS n_total,
             CAST(SUM(cents) OVER () AS BIGINT) AS total_cents
      FROM dows
    )
    SELECT dow, n_orders, cents,
           CAST(cents AS DOUBLE) / n_orders AS mean_cents,
           (CAST(cents AS DOUBLE) * CAST(n_total AS DOUBLE))
               / (CAST(n_orders AS DOUBLE) * CAST(total_cents AS DOUBLE))
               AS seasonality_index
    FROM tot ORDER BY dow
    """,
)
def orders_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality decomposition of order revenue: per ISO
    weekday, order count, exact-cents revenue, mean ticket, and the
    seasonality index (that dow's revenue share over its order share —
    1.0 = flat week). The weekly-cycle diagnostic every ops dashboard
    starts from (reference analog: the minutely cadence of
    ``airflow/dags/pipeline.py`` rolled up a level).

    Scale: one partial-aggregated shuffle to 7 rows; the window totals
    run over those 7 rows only. Index and mean are identical-shaped
    double expressions over exact integer aggregates (cast-first, so
    no int64 product overflow at any scale)."""
    o = load_table(spark, sf_dir, "orders")
    dows = o.groupBy(
        (F.weekday("o_orderdate") + 1).cast("int").alias("dow")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.partitionBy()
    tot = dows.select(
        "dow",
        "n_orders",
        "cents",
        F.sum("n_orders").over(w).cast("bigint").alias("n_total"),
        F.sum("cents").over(w).cast("bigint").alias("total_cents"),
    )
    return tot.select(
        "dow",
        "n_orders",
        "cents",
        (F.col("cents").cast("double") / F.col("n_orders")).alias("mean_cents"),
        (
            (F.col("cents").cast("double") * F.col("n_total").cast("double"))
            / (F.col("n_orders").cast("double") * F.col("total_cents").cast("double"))
        ).alias("seasonality_index"),
    ).orderBy("dow")


WINSOR_LO = 0.01
WINSOR_HI = 0.99


@query(
    "lineitem_quantity_winsorized",
    # Exact p01/p99 via the rank identity (value at row_number
    # ceil(p*n) of the per-brand ascending sort) — tie-breaks don't
    # matter because equal values are interchangeable at a rank
    # boundary. Clamped sums stay BIGINT end to end.
    oracle=f"""
    WITH pq AS (
      SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS q,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY p_brand ORDER BY q, l_orderkey, l_linenumber
             ) AS rn,
             count(*) OVER (PARTITION BY p_brand) AS n
      FROM pq
    ), bounds AS (
      SELECT p_brand,
             MAX(CASE WHEN rn = GREATEST(CAST(ceil({WINSOR_LO} * n) AS BIGINT), 1)
                      THEN q END) AS p01,
             MAX(CASE WHEN rn = CAST(ceil({WINSOR_HI} * n) AS BIGINT)
                      THEN q END) AS p99
      FROM ranked GROUP BY p_brand
    )
    SELECT r.p_brand AS brand, count(*) AS n_lines,
           CAST(b.p01 AS BIGINT) AS p01, CAST(b.p99 AS BIGINT) AS p99,
           CAST(SUM(r.q) AS BIGINT) AS sum_qty,
           CAST(SUM(LEAST(GREATEST(r.q, b.p01), b.p99)) AS BIGINT)
               AS sum_qty_winsorized
    FROM ranked r JOIN bounds b ON r.p_brand = b.p_brand
    GROUP BY r.p_brand, b.p01, b.p99 ORDER BY brand
    """,
)
def lineitem_quantity_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized quantity stats per part brand: exact p01/p99 order
    statistics (rank identity), then sums of raw vs clamped
    quantities — the outlier-robust demand profile that keeps one
    fat-finger order from skewing a brand's forecast.

    Scale: computed from the per-(brand, q) HISTOGRAM CDF (the
    event_value_deciles device): quantity has a bounded domain, the
    p01/p99 rank targets fall inside a value block's contiguous rank
    range [cum-cnt+1, cum] regardless of the (l_orderkey,
    l_linenumber) tie-break, and every output aggregate (counts, raw
    and clamped sums) is a per-value linear form — so the fact join
    folds through ONE map-side-combined aggregate to O(brands x
    distinct-q) rows and the sort window runs over that spine, never
    over the fact rows. The r13 form sorted every lineitem row inside
    |brands| window partitions (single-partition-per-brand at
    100 TB)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("bigint").alias("q")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pq = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    hist = pq.groupBy("p_brand", "q").agg(F.count("*").alias("cnt"))
    wo = Window.partitionBy("p_brand").orderBy("q")
    cdf = hist.select(
        "p_brand",
        "q",
        "cnt",
        F.sum("cnt")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("p_brand")).alias("n"),
    )
    lo_rank = F.greatest(F.ceil(WINSOR_LO * F.col("n")).cast("bigint"), F.lit(1))
    hi_rank = F.ceil(WINSOR_HI * F.col("n")).cast("bigint")
    in_block = lambda r: (r >= F.col("cum") - F.col("cnt") + 1) & (r <= F.col("cum"))
    bounds = cdf.groupBy("p_brand").agg(
        F.max(F.when(in_block(lo_rank), F.col("q"))).alias("p01"),
        F.max(F.when(in_block(hi_rank), F.col("q"))).alias("p99"),
    )
    return (
        hist.join(F.broadcast(bounds), "p_brand")
        .groupBy(F.col("p_brand").alias("brand"), "p01", "p99")
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.sum(F.col("q") * F.col("cnt")).cast("bigint").alias("sum_qty"),
            F.sum(
                F.least(F.greatest(F.col("q"), F.col("p01")), F.col("p99"))
                * F.col("cnt")
            )
            .cast("bigint")
            .alias("sum_qty_winsorized"),
        )
        .select(
            "brand",
            "n_lines",
            F.col("p01").cast("bigint").alias("p01"),
            F.col("p99").cast("bigint").alias("p99"),
            "sum_qty",
            "sum_qty_winsorized",
        )
        .orderBy("brand")
    )


def exact_percentiles_two_pass(
    df: DataFrame,
    key: str,
    value: str,
    ps: tuple[float, ...],
    order: tuple[str, ...] = (),
    accuracy: int = 1000,
) -> DataFrame:
    """Exact per-key percentiles WITHOUT a full per-key sort — the
    100 TB form of the rank identity used by
    ``lineitem_quantity_winsorized``.

    Pass 1 (cheap, map-side): ``approx_percentile`` brackets each
    requested percentile with [p - 1/accuracy, p + 1/accuracy]
    candidate bounds, plus an exact per-key row count.
    Pass 2 (narrow): only rows INSIDE a bracket are ranked — the sort
    touches O(n/accuracy) rows per key instead of n — and the exact
    target rank (ceil(p*n), floored at 1) is located by adding the
    exact count of rows below the bracket. Rows outside every bracket
    are never shuffled to the rank stage.

    Returns one row per (key, p) with the exact percentile value —
    bit-identical to the full-sort rank identity (asserted in
    ``tests/test_r7_operators.py::test_two_pass_percentiles_match_exact``).
    Tie-safety: bracket bounds come from approx_percentile's observed
    values, and the below-bracket count uses strict <, so duplicated
    boundary values land inside the bracket and the rank stays exact.
    """
    import math as _math

    eps = 1.0 / accuracy
    lo_ps = [max(p - eps, 0.0) for p in ps]
    hi_ps = [min(p + eps, 1.0) for p in ps]
    stats = df.groupBy(key).agg(
        F.count("*").alias("_n"),
        F.percentile_approx(value, list(lo_ps), accuracy).alias("_blo"),
        F.percentile_approx(value, list(hi_ps), accuracy).alias("_bhi"),
    )
    out = None
    for i, p in enumerate(ps):
        b = stats.select(
            key,
            "_n",
            F.element_at("_blo", i + 1).alias("_lo"),
            F.element_at("_bhi", i + 1).alias("_hi"),
        )
        j = df.select(key, value, *order).join(F.broadcast(b), key)
        below = (
            j.where(F.col(value) < F.col("_lo"))
            .groupBy(key)
            .agg(F.count("*").alias("_below"))
        )
        inside = j.where(
            (F.col(value) >= F.col("_lo")) & (F.col(value) <= F.col("_hi"))
        )
        w = Window.partitionBy(key).orderBy(value, *order)
        ranked = inside.withColumn("_rk", F.row_number().over(w)).join(
            F.broadcast(below), key, "left"
        )
        target = F.greatest(F.ceil(F.lit(p) * F.col("_n")), F.lit(1))
        hit = ranked.where(
            F.col("_rk") + F.coalesce(F.col("_below"), F.lit(0)) == target
        ).select(
            key,
            F.lit(p).alias("p"),
            F.col(value).alias("percentile_value"),
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def _ge2_expr(n, a, s):
    """GE(2) from exact integer aggregates, cast-first so no int64
    product can overflow: (n*a - s^2) / (2*s^2). Both engines build
    the IDENTICAL double expression tree over the same exact
    integers, so the result is bit-stable (each IEEE op is correctly
    rounded) — the no-ln() rule's rational-index pattern."""
    n_d, a_d, s_d = (F.col(c).cast("double") for c in (n, a, s))
    return (n_d * a_d - s_d * s_d) / (F.lit(2.0) * s_d * s_d)


_GE2_SQL = (
    "(CAST({n} AS DOUBLE)*CAST({a} AS DOUBLE) "
    "- CAST({s} AS DOUBLE)*CAST({s} AS DOUBLE)) "
    "/ (CAST(2 AS DOUBLE)*CAST({s} AS DOUBLE)*CAST({s} AS DOUBLE))"
)




@query(
    "order_value_ge2_index",
    oracle=f"""
    WITH y AS (
      SELECT n_name, CAST(ROUND(o_totalprice) AS BIGINT) AS d
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ), g AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(SUM(d) AS BIGINT) AS s_g,
             SUM(d*d) AS ssq_g
      FROM y GROUP BY n_name
    ), t AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             SUM(ssq_g) AS ssq,
             SUM(n_g * CAST(s_g // n_g AS HUGEINT) * (s_g // n_g)) AS b
      FROM g
    )
    SELECT n_name AS component, n_g AS n_orders, s_g AS dollars,
           {_GE2_SQL.format(n="n_g", a="ssq_g", s="s_g")} AS ge2
    FROM g
    UNION ALL
    SELECT '_total', n, s, {_GE2_SQL.format(n="n", a="ssq", s="s")} FROM t
    UNION ALL
    SELECT '_between', n, s, {_GE2_SQL.format(n="n", a="b", s="s")} FROM t
    UNION ALL
    SELECT '_within', n, s,
           ({_GE2_SQL.format(n="n", a="ssq", s="s")})
         - ({_GE2_SQL.format(n="n", a="b", s="s")})
    FROM t
    ORDER BY component
    """,
)
def order_value_ge2_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality decomposition of order values within/between customer
    nations via the GE(2) generalized-entropy index (half the squared
    coefficient of variation) — the decomposable inequality measure
    that, unlike Theil, needs no ln() and therefore hash-matches
    across engines (COVERAGE.md r8 queue; the GE(2)/HHI substitution
    from the oracle-hash rules).

    Exactness: values are whole ROUNDED DOLLARS, not cents — GE(2) is
    scale-invariant and d² must fit int64 per row (Σcents² overflowed
    at sf0.01 under an int64 accumulator; Spark 4 ANSI raised, which
    is how the dollar unit was chosen). The SQUARED accumulators (Σy²
    and the between-groups Σ n_g·⌊S_g/n_g⌋²) are exact DECIMAL(38,0)
    on the Spark side and HUGEINT (int128) on DuckDB's (ADVICE r8:
    an int64 accumulator silently wraps past ~3×10^7 orders under
    non-ANSI Spark while DuckDB raises — now both engines are exact
    to ~10^38, far past any real corpus); n and Σy stay BIGINT. The
    floored integer group mean makes BOTH engines drop identical
    sub-dollar remainders instead of an order-dependent float sum
    over groups. Each GE(2) is then ONE identical-shaped cast-first
    double expression over exact integers; within = total − between.

    Scale: one fact shuffle (the nation rollup — partial-aggregated
    to 25 groups), customer→nation broadcast onto orders; everything
    after the rollup is O(nations)."""
    dollars = F.round(F.col("o_totalprice")).cast("bigint")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_nation = c.join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "n_name")
    y = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", dollars.alias("d"))
        .join(
            F.broadcast(cust_nation),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    # The four output branches (per-nation + total/between/within)
    # all derive from this O(nations) rollup; without the cache
    # each union branch re-scans orders+customer+nation (12
    # FileScans observed). coalesce(1) first — cached builds run
    # outside AQE partition coalescing (PERF_NOTES r7), and 25
    # rows need one partition. ssq_g accumulates in DECIMAL(38,0)
    # (d² itself fits int64; the SUM must not have to).
    g = session_cached(
        spark,
        f"ge2_rollup_{sf_tag(os.path.abspath(sf_dir))}",
        y.groupBy("n_name")
        .agg(
            F.count("*").alias("n_g"),
            F.sum("d").alias("s_g"),
            F.sum(F.col("d").cast("decimal(19,0)") * F.col("d")).alias(
                "ssq_g"
            ),
        )
        .coalesce(1),
    )
    per_nation = g.select(
        F.col("n_name").alias("component"),
        F.col("n_g").alias("n_orders"),
        F.col("s_g").alias("dollars"),
        _ge2_expr("n_g", "ssq_g", "s_g").alias("ge2"),
    )
    t = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("ssq_g").cast("decimal(38,0)").alias("ssq"),
        F.sum(
            F.expr(
                "CAST(n_g AS DECIMAL(19,0)) * (s_g div n_g) * (s_g div n_g)"
            )
        )
        .cast("decimal(38,0)")
        .alias("b"),
    )
    total = t.select(
        F.lit("_total").alias("component"),
        F.col("n").alias("n_orders"),
        F.col("s").alias("dollars"),
        _ge2_expr("n", "ssq", "s").alias("ge2"),
    )
    between = t.select(
        F.lit("_between").alias("component"),
        F.col("n").alias("n_orders"),
        F.col("s").alias("dollars"),
        _ge2_expr("n", "b", "s").alias("ge2"),
    )
    within = t.select(
        F.lit("_within").alias("component"),
        F.col("n").alias("n_orders"),
        F.col("s").alias("dollars"),
        (_ge2_expr("n", "ssq", "s") - _ge2_expr("n", "b", "s")).alias("ge2"),
    )
    return (
        per_nation.unionByName(total)
        .unionByName(between)
        .unionByName(within)
        .orderBy("component")
    )


BFS_SEED_NATION = 0
BFS_MAX_HOPS = 3

# ONE SQL text runs verbatim on BOTH engines (Spark 4's recursive CTE
# and DuckDB's agree on WITH RECURSIVE + UNION ALL semantics): BFS hop
# distance from nation 0 over the co-supply graph (two nations are
# adjacent when suppliers from both appear in the same order). The
# per-level DISTINCT plus the depth guard bounds the recursion at
# O(|nations| x BFS_MAX_HOPS) rows — no path enumeration.
_BFS_VIEW_IDS = __import__("itertools").count()

_BFS_SQL = f"""
    WITH RECURSIVE supnation AS (
      SELECT DISTINCT l.l_orderkey, s.s_nationkey
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ), edges AS (
      SELECT DISTINCT a.s_nationkey AS src, b.s_nationkey AS dst
      FROM supnation a JOIN supnation b
        ON a.l_orderkey = b.l_orderkey
       AND a.s_nationkey <> b.s_nationkey
    ), hops(nation, dist) AS (
      SELECT CAST({BFS_SEED_NATION} AS BIGINT), 0
      UNION ALL
      SELECT DISTINCT e.dst, h.dist + 1
      FROM hops h JOIN edges e ON e.src = h.nation
      WHERE h.dist < {BFS_MAX_HOPS}
    )
    SELECT nation, CAST(MIN(dist) AS INTEGER) AS hops
    FROM hops GROUP BY nation ORDER BY nation
"""


@query("nation_cosupply_bfs_recursive", oracle=_BFS_SQL)
def nation_cosupply_bfs_recursive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recursive CTE (new SQL surface in Spark 4): breadth-first hop
    distance from nation {SEED} over the co-supply graph, the same
    WITH RECURSIVE text executing on both engines. Complements the
    DataFrame-loop iterative graph family (``dedup_clusters``
    fixpoint, ``nation_trade_pagerank``) with the declarative
    recursion form — the planner, not the driver, runs the loop.

    Scale: each recursion level is one distributed join of the O(25)
    frontier against the edge list; the per-level DISTINCT plus the
    {HOPS}-hop guard caps total recursion rows at O(|nations| x
    hops). The edge derivation is the expensive part (order-keyed
    self-join, same shape as ``part_copurchase_lift``) — and Spark 4's
    UnionLoop INLINES non-recursive CTEs into the loop body, so the
    verbatim one-text form re-derived the edges at EVERY level (r13
    plan capture: scans+joins under UnionLoop; 4 levels = 4 edge
    derivations). The Spark side therefore materializes the O(|nations|^2)
    edge list once (``localCheckpoint``, computed fresh per invocation)
    and recurses over the materialized view; the recursion text and the
    DuckDB oracle are byte-identical to the one-text form, so the
    result is unchanged."""
    from end2end_data_pipeline_spark.sources.tables import (
        frame_memo_tag,
        session_checkpointed,
    )

    register_views(spark, sf_dir, "lineitem", "supplier")
    # DISK_ONLY level (r14 consistency audit — tables.py note); blocks
    # live on executors, so at cluster scale a lost executor fails the
    # query instead of recomputing — acceptable for this O(|nations|^2)
    # frame, and a reliable checkpoint dir is a drop-in swap. Memoized
    # per (session, sf_dir) like the co-purchase pair list: the r13
    # form re-derived the edges eagerly on EVERY invocation, so each
    # bench repeat paid the corpus-scale order-keyed self-join again
    # (the recursion itself is O(|nations| x hops)).
    edges = session_checkpointed(
        spark,
        frame_memo_tag(sf_dir, "cosupply_edges"),
        spark.sql(
            """
        WITH supnation AS (
          SELECT DISTINCT l.l_orderkey, s.s_nationkey
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        )
        SELECT DISTINCT a.s_nationkey AS src, b.s_nationkey AS dst
        FROM supnation a JOIN supnation b
          ON a.l_orderkey = b.l_orderkey
         AND a.s_nationkey <> b.s_nationkey
        """
        # O(|nations|^2) rows (<= 625 on TPC-H's fixed 25 nations), so
        # one partition — the checkpoint otherwise pins the build's
        # 32-way layout and every recursion level pays 32 fixed-cost
        # tasks per join (guide §2.2)
        ).coalesce(1),
    )
    # per-invocation view name (r13 advice): a fixed session-global
    # name lets two concurrent builds in one session bind one
    # invocation's recursion to the other's edge list
    view = f"cosupply_edges_ckpt_{next(_BFS_VIEW_IDS)}"
    edges.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE hops(nation, dist) AS (
          SELECT CAST({BFS_SEED_NATION} AS BIGINT), 0
          UNION ALL
          SELECT DISTINCT e.dst, h.dist + 1
          FROM hops h JOIN {view} e ON e.src = h.nation
          WHERE h.dist < {BFS_MAX_HOPS}
        )
        SELECT nation, CAST(MIN(dist) AS INTEGER) AS hops
        FROM hops GROUP BY nation ORDER BY nation
        """
    )


nation_cosupply_bfs_recursive.__doc__ = (
    nation_cosupply_bfs_recursive.__doc__.replace(
        "{SEED}", str(BFS_SEED_NATION)
    ).replace("{HOPS}", str(BFS_MAX_HOPS))
)


# ONE SQL text for both engines: correlated LATERAL subquery with a
# per-group ORDER BY ... LIMIT — the "top-k per group" form the
# planner turns into a partitioned top-k instead of a full sort.
_LATERAL_SQL = """
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


@query("nation_top2_customers_lateral", oracle=_LATERAL_SQL)
def nation_top2_customers_lateral(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated LATERAL subquery (SQL-surface twin of the window
    row_number top-k in ``top_orders_per_customer``): the two
    highest-balance customers per nation, the same text executing on
    both engines. LATERAL is the form analysts reach for when the
    per-group logic is richer than one window can express (joins,
    limits, aggregates inside the correlated body).

    Scale: Spark decorrelates the lateral into a ranked join — no
    per-row re-execution; the rank prunes to k rows per group before
    the final sort. Raw column values pass through untouched, so no
    float arithmetic crosses the hash boundary."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


# --- largest-remainder proration -------------------------------------

PRORATE_EVERY = 211  # deterministic order subset keeping output small


def _proration_sql(dialect: str) -> str:
    """Integer proration in one SQL text per dialect (only the integer-
    division spelling differs). All arithmetic is BIGINT: the widest
    product is total_cents (≤ ~5.5e7 — TPC-H prices do not grow with
    SF) × line weight (≤ ~1.1e7) ≈ 6e14 ≪ 2^63."""
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH li AS (
      SELECT l_orderkey AS k, l_linenumber AS ln,
             CAST(round(l_extendedprice*100) AS BIGINT) AS w
      FROM lineitem WHERE l_orderkey % {PRORATE_EVERY} = 0),
    o AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice*100) AS BIGINT) AS total
      FROM orders WHERE o_orderkey % {PRORATE_EVERY} = 0),
    j AS (
      SELECT li.k, li.ln, li.w, o.total,
             SUM(li.w) OVER (PARTITION BY li.k) AS wsum
      FROM li JOIN o ON li.k = o.k),
    base AS (
      SELECT k, ln, w, total,
             (total * w) {idiv} NULLIF(wsum, 0) AS base_cents,
             (total * w) % NULLIF(wsum, 0) AS rem
      FROM j),
    ranked AS (
      SELECT k, ln, w, total, base_cents,
             SUM(base_cents) OVER (PARTITION BY k) AS base_sum,
             ROW_NUMBER() OVER (
               PARTITION BY k ORDER BY rem DESC, ln) AS rk
      FROM base)
    SELECT k AS l_orderkey, ln AS l_linenumber, w AS w_cents,
           total AS total_cents,
           CAST(base_cents + CASE WHEN rk <= total - base_sum
                THEN 1 ELSE 0 END AS BIGINT) AS alloc_cents
    FROM ranked ORDER BY l_orderkey, l_linenumber
    """


@query("order_allocation_proration", oracle=_proration_sql("duck"))
def order_allocation_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) proration: allocate each order's
    total (in cents) across its lineitems proportional to extended
    price, exactly — floor shares first, then one extra cent to the
    lines with the largest fractional remainders (ties broken by line
    number) until the order total is met to the cent. The allocation
    kernel every revenue/cost attribution pipeline needs; floating-
    point proration leaks cents, this never does —
    ``tests/test_reconcile.py`` asserts per-order conservation.

    Scale: one key-partitioned join + two windows over the SAME
    partition key (orderkey), so Catalyst reuses a single shuffle for
    the join and both windows; arithmetic stays in whole-stage codegen.
    The %-{EVERY} subset is fixture sizing only — the plan is
    subset-free."""
    register_views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(_proration_sql("spark"))


order_allocation_proration.__doc__ = order_allocation_proration.__doc__.replace(
    "{EVERY}", str(PRORATE_EVERY)
)


# --- share-of-parent hierarchical rollup ------------------------------

# ONE SQL text for both engines; every SUM is pinned to BIGINT, which
# is a no-op for Spark and folds DuckDB's HUGEINT widening back down
# (totals stay < 2^63 even at SF 1000 — ~1.5e9 orders × ~5e7 cents
# ≈ 7.5e16).
_SHARE_SQL = """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name)
    SELECT region, nation, cents,
           CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT)
             AS region_cents,
           CAST(cents AS DOUBLE)
             / CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT)
             AS share_of_region,
           CAST(CAST(SUM(cents) OVER (PARTITION BY region) AS BIGINT)
               AS DOUBLE)
             / CAST(SUM(cents) OVER () AS BIGINT)
             AS region_share_of_global
    FROM rev ORDER BY region, nation
    """


@query("region_nation_revenue_share", oracle=_SHARE_SQL)
def region_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent hierarchical rollup: each nation's exact-cents
    share of its region's revenue and each region's share of global —
    the percent-of-parent drilldown every BI layer renders over a
    geo hierarchy. Ratios divide exact integer sums, so the doubles
    are bit-identical across engines regardless of aggregation order.

    Scale: the fact table reduces FIRST (partial-agg on the join keys
    after two broadcast dim hops — nation/region are fixed-cardinality
    broadcasts, customer prunes to the key column); both window passes
    run over the O(|nations|) rollup, never over facts."""
    register_views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(_SHARE_SQL)


# --- cohort lifetime-value curve --------------------------------------

_LTV_ORACLE = """
    WITH o AS (
      SELECT o_custkey,
             (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS midx,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), first_m AS (
      SELECT o_custkey, min(midx) AS cidx FROM o GROUP BY o_custkey
    ), cells AS (
      SELECT f.cidx, (o.midx - f.cidx) AS age,
             CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
             CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
      FROM o JOIN first_m f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ), sized AS (
      -- every cohort member orders in month 0, so the age-0 active
      -- count IS the cohort size (no separate first_m aggregation)
      SELECT cidx, n_active AS cohort_size FROM cells WHERE age = 0
    )
    SELECT CAST(cells.cidx // 12 AS BIGINT) || '-' ||
             lpad(CAST(cells.cidx % 12 + 1 AS VARCHAR), 2, '0')
               AS cohort_month,
           CAST(age AS BIGINT) AS age_months, n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size, revenue_cents,
           CAST(SUM(revenue_cents) OVER (PARTITION BY cells.cidx ORDER BY age)
                AS BIGINT) AS cum_revenue_cents,
           CAST(SUM(revenue_cents) OVER (PARTITION BY cells.cidx ORDER BY age)
                AS DOUBLE) / s.cohort_size / 100 AS ltv_per_customer
    FROM cells JOIN sized s ON cells.cidx = s.cidx
    ORDER BY cohort_month, age_months
    """


@query("orders_cohort_ltv", oracle=_LTV_ORACLE)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by FIRST-order
    month, then per (cohort, months-since-first) the active count,
    period revenue, running cumulative revenue, and LTV per cohort
    member (exact integer cents; the per-customer dollars are the one
    boundary division) — the acquisition-payback table every
    subscription/commerce dashboard leads with, the revenue-weighted
    complement of ``user_retention_cohorts``'s activity matrix. The
    month key is the integer year*12+(month-1) index on both engines
    (zero-based so year = idx//12 and month = idx%12+1 with no
    December wrap case); the
    display label is derived from the index alone (modular arithmetic,
    no date formatting), so the string is trivially engine-identical.

    Scale: one shuffle of orders on ``o_custkey`` serves BOTH the
    first-order min and the cohort join (same key, exchange reused);
    the (cohort x age) grid is O(months²) — bounded by the CALENDAR,
    not the data — so the cumulative window and the cohort-size join
    run over a frame that never grows with scale."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "midx"
        ),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first_m = o.groupBy("o_custkey").agg(F.min("midx").alias("cidx"))
    cells = (
        o.join(first_m, "o_custkey")
        .groupBy("cidx", (F.col("midx") - F.col("cidx")).alias("age"))
        .agg(
            F.count_distinct("o_custkey").cast("bigint").alias("n_active"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .coalesce(1)
    )
    import os

    # session_cached: the cohort-size branch re-derives from the same
    # grid (without it the o ⋈ first_m subtree plans twice);
    # O(months²) rows, bounded by the calendar
    cells = session_cached(
        spark, f"ltv_cells_{sf_tag(os.path.abspath(sf_dir))}", cells
    )
    sized = cells.where(F.col("age") == 0).select(
        "cidx", F.col("n_active").alias("cohort_size")
    )
    wcum = Window.partitionBy("cidx").orderBy("age")
    cum = F.sum("revenue_cents").over(wcum).cast("bigint")
    label = F.concat(
        F.floor(F.col("cidx") / 12).cast("bigint").cast("string"),
        F.lit("-"),
        F.lpad((F.col("cidx") % 12 + 1).cast("string"), 2, "0"),
    )
    return (
        cells.join(F.broadcast(sized), "cidx")
        .select(
            label.alias("cohort_month"),
            F.col("age").cast("bigint").alias("age_months"),
            "n_active",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            "revenue_cents",
            cum.alias("cum_revenue_cents"),
            (cum.cast("double") / F.col("cohort_size") / 100).alias(
                "ltv_per_customer"
            ),
        )
        .orderBy("cohort_month", "age_months")
    )


# --- relational division ----------------------------------------------

_DIVISION_ORACLE = """
    WITH joined AS (
      SELECT l_suppkey AS suppkey, n.n_regionkey AS regionkey,
             o_custkey AS custkey,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n ON c_nationkey = n.n_nationkey
    ), agg AS (
      SELECT suppkey AS s_suppkey,
             CAST(count(DISTINCT regionkey) AS BIGINT) AS n_regions,
             CAST(count(DISTINCT custkey) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents
      FROM joined GROUP BY 1
    )
    SELECT s_suppkey, n_regions, n_customers, revenue_cents
    FROM agg
    WHERE n_regions = (SELECT CAST(count(*) AS BIGINT) FROM region)
    ORDER BY s_suppkey
    """


@query("suppliers_serving_all_regions", oracle=_DIVISION_ORACLE)
def suppliers_serving_all_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION — the classic "for all" query shape (÷, the
    one relational-algebra operator SQL has no keyword for): suppliers
    whose shipments have reached customers in EVERY region, with their
    global customer reach and revenue. Implemented as the
    scale-correct count-matching form (distinct (supplier, region)
    rollup, count == |divisor|) rather than the textbook double-NOT-
    EXISTS, which plans as a nested correlated anti-join per supplier.

    Scale: ONE fact pass and NO Expand — the r13 form's two
    count-distincts expanded every fact row 3x into the supplier
    aggregation; the two-level form pre-aggregates on (supplier,
    customer) with map-side combine (distinct customers become plain
    counted rows) and folds region reach through a bit_or mask
    (bit_count(bit_or(1<<regionkey)) == count distinct EXACTLY while
    regionkey < 64 — region is the fixed 5-row TPC-H dimension, see
    BROADCAST_DIMS; a >64-key deployment flips this back to
    count_distinct). The divisor cardinality attaches as a broadcast
    1-row scalar. Measured r14: min 1.55 -> 1.28 s, values identical.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("n_regionkey").alias("regionkey"),
            F.col("o_custkey").alias("custkey"),
            cents.alias("cents"),
        )
    )
    per_sc = joined.groupBy("suppkey", "custkey").agg(
        F.sum("cents").alias("cents_c"),
        F.expr("bit_or(shiftleft(1L, regionkey))").alias("rmask"),
    )
    agg = per_sc.groupBy(F.col("suppkey").alias("s_suppkey")).agg(
        F.expr("CAST(bit_count(bit_or(rmask)) AS BIGINT)").alias("n_regions"),
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("cents_c").cast("bigint").alias("revenue_cents"),
    )
    total = r.agg(F.count("*").cast("bigint").alias("total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .where(F.col("n_regions") == F.col("total"))
        .select("s_suppkey", "n_regions", "n_customers", "revenue_cents")
        .orderBy("s_suppkey")
    )


# --- Gini coefficient of revenue concentration ------------------------------

_GINI_ORACLE = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT)
               AS i
      FROM spend
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           (CAST(2 AS DOUBLE)
            * CAST(SUM(CAST(i AS DECIMAL(19,0)) * cents) AS DOUBLE))
             / (CAST(count(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
             - (CAST(count(*) AS DOUBLE) + 1) / CAST(count(*) AS DOUBLE)
             AS gini
    FROM ranked
    """


@query("customer_revenue_gini", oracle=_GINI_ORACLE)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the standard one-number inequality summary next to
    ``customer_pareto_share``'s 80/20 slice: 0 is perfectly even
    spend, 1 is a single whale. Computed by the rank formula
    G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over spend sorted ascending (ties
    broken by customer key, so the ranking is a total order both
    engines share); the rank-weighted sum accumulates in
    DECIMAL(38,0) internally since rank times cents squares the row
    count (the ge2 overflow rule) and crosses the output boundary
    only inside the one fixed-shape double Gini expression.

    Scale: one fact rollup to per-customer spend (map-side combined),
    then a window over the customer-bounded frame and a single-row
    exact aggregate. The global sort is over CUSTOMERS, not orders —
    dim-bounded at any fact volume."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents")
        )
    )
    wr = Window.orderBy("cents", "o_custkey")
    ranked = spend.select(
        "cents", F.row_number().over(wr).cast("bigint").alias("i")
    )
    gini = (
        "(CAST(2 AS DOUBLE)"
        " * CAST(SUM(CAST(i AS DECIMAL(19,0)) * cents) AS DOUBLE))"
        " / (CAST(count(*) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))"
        " - (CAST(count(*) AS DOUBLE) + 1) / CAST(count(*) AS DOUBLE)"
    )
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.expr(gini).alias("gini"),
    )
