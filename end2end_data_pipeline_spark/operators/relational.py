"""Relational analytics over the TPC-H-ish star schema.

The reference is single-table (SURVEY.md §2.5 — no joins, no window
functions), but its warehouse layer (ClickHouse) supports the full
relational surface; this module supplies it Spark-first: broadcast hash
joins for dimensions, sort-merge for fact-fact, semi/anti joins, window
functions, rollup, conditional aggregation.

Determinism rules (driver value-hash):
- money sums → exact integer cents: ``CAST(ROUND(x*100) AS BIGINT)``
  per row (deterministic IEEE expression), then exact integer SUM;
- averages/rates → divisions of exact integers (bit-identical);
- dates → formatted strings at the output boundary;
- every top-N has a total-order tie-break.

Scale notes:
- dimension joins (region/nation/supplier) are explicit
  ``F.broadcast`` — at 100 TB the fact side never shuffles for these;
- fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  AQE handles skew;
- aggregations pre-aggregate BEFORE joins where semantics allow
  (group-then-join beats join-then-group on shuffle volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from end2end_data_pipeline_spark.registry import query
from end2end_data_pipeline_spark.sources.tables import load_table


def _cents(col: F.Column) -> F.Column:
    """Deterministic double→integer-cents conversion (see module doc)."""
    return F.round(col * 100).cast("bigint")


@query(
    "lineitem_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS sum_disc_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 )
               AS BIGINT)) AS BIGINT) AS sum_charge_cents,
           count(*) AS count_order,
           SUM(CAST(l_quantity AS BIGINT)) / CAST(count(*) AS DOUBLE) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (scan → partial agg → final agg;
    the filter and the two needed columns push into the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp")
    )
    qty = F.sum(F.col("l_quantity").cast("bigint"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty.alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
            (qty / F.count("*").cast("double")).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "projection_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-02-01 00:00:00'
      AND l_discount > 0.08
    """,
)
def projection_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2 — the reference's 2-column minute extract generalized: both
    the range predicate and the 3-column projection reach the parquet
    scan (PushedFilters + ReadSchema in the explain output)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-02-01").cast("timestamp"))
        & (F.col("l_discount") > 0.08)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("quantity"),
    )


@query(
    "region_customer_rollup",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
)
def region_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join chain: customer ⋈ nation ⋈ region.
    nation/region are broadcast — the customer side never shuffles for
    the join, only for the final group-by."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("acctbal_cents"),
        )
        .orderBy("r_name", "n_name")
    )


@query(
    "top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents,
           strftime(any_value(o_orderdate), '%Y-%m-%d') AS orderdate,
           any_value(o_orderpriority) AS o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey
    ORDER BY revenue_cents DESC, l_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping-priority: broadcast the filtered
    customer dim into orders FIRST (shrinks the orders side ~5x, a
    map-side hash join with no shuffle), THEN run the fact-fact
    sort-merge join on orderkey — CBO is off, so Catalyst keeps the
    written join order and the cheap reduction must come first.
    Top-10 with a total-order tie-break on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    building_orders = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return (
        li.join(building_orders, li.l_orderkey == building_orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.date_format(F.any_value("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
            F.any_value("o_orderpriority").alias("o_orderpriority"),
        )
        .orderBy(F.col("revenue_cents").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "nation_supplier_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue_cents DESC, n_name
    """,
)
def nation_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavored revenue by supplier nation — two broadcast
    joins; the lineitem scan aggregates after a map-side-only join
    pipeline (zero shuffles before the group-by)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy(F.col("revenue_cents").desc(), "n_name")
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                              AND o_orderdate <  TIMESTAMP '1998-01-01')
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (the NOT-IN/NOT-EXISTS decorrelation Catalyst
    performs automatically when written as an anti join): customers
    with no 1997 order — the window keeps the result non-empty on the
    fixture (every customer has SOME order, so the unwindowed anti
    join would be vacuously 0 rows and prove nothing)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "segment_active_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_active
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def segment_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join + group-by: customers that placed at least one
    order, counted per market segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_active"))
        .orderBy("c_mktsegment")
    )


@query(
    "priority_discounted_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_discount > 0.05
    )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def priority_discounted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style semi join from orders into lineitem,
    grouped by priority."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "top_orders_per_customer",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey, totalprice_cents, rn
    FROM ranked WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N per key: row_number over (custkey, price desc) with
    deterministic tie-break; one shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
            "rn",
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_cents,
           CAST(ROUND(o_totalprice * 100) AS BIGINT)
             - lag(CAST(ROUND(o_totalprice * 100) AS BIGINT), 1, 0) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS delta_cents
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum + lag windows over each customer's order history —
    both frames share one shuffle/sort on (o_custkey, o_orderdate)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = _cents(F.col("o_totalprice"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(cents)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("running_cents"),
            (cents - F.lag(cents, 1, 0).over(w)).alias("delta_cents"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "orders_monthly_trend",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
           count(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / CAST(count(*) AS DOUBLE)
               AS avg_cents
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def orders_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3 date functions feeding a time-grain rollup; average as an
    exact-integer ratio."""
    o = load_table(spark, sf_dir, "orders")
    total = F.sum(_cents(F.col("o_totalprice")))
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "order_month"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            total.alias("total_cents"),
            (total / F.count("*").cast("double")).alias("avg_cents"),
        )
        .orderBy("order_month")
    )


@query(
    "part_brand_stats",
    oracle="""
    SELECT upper(p_brand) AS brand,
           split_part(p_type, ' ', 1) AS type_head,
           count(*) AS n_parts,
           MIN(p_size) AS min_size, MAX(p_size) AS max_size
    FROM part GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 string functions (upper, split/first-token) feeding grouping."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.upper("p_brand").alias("brand"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("brand", "type_head")
    )


@query(
    "acctbal_tiers",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           count(*) AS n,
           MIN(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS min_cents,
           MAX(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS max_cents
    FROM customer GROUP BY 1 ORDER BY 1
    """,
)
def acctbal_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 conditional derivation: CASE WHEN tiering + per-tier extrema."""
    c = load_table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        c.groupBy(tier.alias("tier"))
        .agg(
            F.count("*").alias("n"),
            F.min(_cents(F.col("c_acctbal"))).alias("min_cents"),
            F.max(_cents(F.col("c_acctbal"))).alias("max_cents"),
        )
        .orderBy("tier")
    )


@query(
    "all_party_nations",
    oracle="""
    SELECT n_nationkey, n_name, party_kind FROM (
        SELECT DISTINCT c_nationkey AS key, 'customer' AS party_kind FROM customer
        UNION
        SELECT DISTINCT s_nationkey AS key, 'supplier' AS party_kind FROM supplier
    ) parties JOIN nation ON key = n_nationkey
    ORDER BY n_nationkey, party_kind
    """,
)
def all_party_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (UNION DISTINCT) + dimension join."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    parties = (
        c.select(F.col("c_nationkey").alias("key"), F.lit("customer").alias("party_kind"))
        .union(
            s.select(
                F.col("s_nationkey").alias("key"), F.lit("supplier").alias("party_kind")
            )
        )
        .distinct()
    )
    return (
        parties.join(n, parties.key == n.n_nationkey)
        .select("n_nationkey", "n_name", "party_kind")
        .orderBy("n_nationkey", "party_kind")
    )


@query(
    "high_volume_parts",
    oracle="""
    SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 700
    ORDER BY total_qty DESC, l_partkey
    """,
)
def high_volume_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .where(F.col("total_qty") > 700)
        .orderBy(F.col("total_qty").desc(), "l_partkey")
    )


@query(
    "order_status_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def order_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total), null group labels
    coalesced to 'ALL' for cross-engine stability."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
        .orderBy("status", "priority")
    )


@query(
    "segment_distinct_buyers",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT o_custkey) AS n_buyers,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def segment_distinct_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain count in one aggregation
    (Spark expands to a two-phase distinct aggregate)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count_distinct(F.col("o_custkey")).alias("n_buyers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "top_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3 — global sort + limit (Spark turns this into TakeOrdered:
    per-partition top-10 then a driver-side merge of 10×partitions rows,
    no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
            "o_orderstatus",
        )
        .limit(10)
    )


@query(
    "brand_revenue",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(part) revenue rollup by brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
        .orderBy("p_brand")
    )


@query(
    "orders_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM orders GROUP BY 1
    )
    SELECT order_month, total_cents,
           CAST(lag(total_cents) OVER (ORDER BY order_month) AS BIGINT)
             AS prev_cents,
           (total_cents - lag(total_cents) OVER (ORDER BY order_month))
             / CAST(lag(total_cents) OVER (ORDER BY order_month) AS DOUBLE)
             AS mom_growth
    FROM monthly ORDER BY order_month
    """,
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the monthly rollup (exact
    integer cents) with a lag window and one growth division — NULL on
    the first month, as the oracle's lag semantics dictate.

    Scale: the window runs over the O(|months|) rollup, not the fact
    table — a single-partition sort of a tiny aggregate is the correct
    plan at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "order_month"
        )
    ).agg(F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"))
    w = Window.orderBy("order_month")
    prev = F.lag("total_cents").over(w)
    return monthly.select(
        "order_month",
        "total_cents",
        prev.cast("bigint").alias("prev_cents"),
        ((F.col("total_cents") - prev) / prev.cast("double")).alias(
            "mom_growth"
        ),
    ).orderBy("order_month")
