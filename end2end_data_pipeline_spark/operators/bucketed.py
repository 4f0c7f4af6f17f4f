"""Bucketed-table execution path, exercised end-to-end (SCALE.md's #1
"what we'd add first on a real cluster", driver-checkable edition).

``sources/bucketing.py`` can write orders/lineitem co-bucketed on the
order key; this module REGISTERS a query that runs the TPC-H Q3 shape
over those bucketed tables, so the shuffle-elimination claim is proven
three ways:

- correctness: same DuckDB oracle as ``q3_shipping_priority`` — the
  bucketed layout must not change a single value;
- plan: ``tests/test_bucketing.py`` asserts the executed plan joins
  the two facts with ZERO Exchange on the join keys (broadcast
  disabled, so it is the bucket co-location doing the work, not a
  small-table shortcut);
- lifecycle: the bucketed tables are materialized here, through the
  same write path a production job would run.

The bucketed copy is materialized once per (SparkSession, sf_dir)
into the system temp dir and cached in the session catalog; repeat
calls reuse it. At 100 TB this one-time write is the amortized
investment that removes BOTH shuffle sides from every subsequent
equi-join on the order key (the orders⋈lineitem family here runs in
several registered queries) — the bucket count would be sized at
~(table_bytes / 1 GB), not the test-scale 8.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end2end_data_pipeline_spark.operators import tpch_like  # noqa: F401
from end2end_data_pipeline_spark.registry import ORACLE, query
from end2end_data_pipeline_spark.sources.bucketing import (
    cobucket_orders_lineitem,
)
from end2end_data_pipeline_spark.sources.tables import (
    load_table,
    session_cached,
    sf_tag,
)

# (applicationId, abs sf_dir) -> (orders_table, lineitem_table)
_BUCKETED: dict[tuple[str, str], tuple[str, str]] = {}


def bucketed_orders_lineitem(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Catalog names of the co-bucketed orders/lineitem copies for
    ``sf_dir``, materializing them on first use in this session."""
    sf_abs = os.path.abspath(sf_dir)
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_abs)
    cached = _BUCKETED.get(key)
    if cached and all(spark.catalog.tableExists(t) for t in cached):
        return cached
    tag = sf_tag(sf_abs)
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_bucketed", app_id, tag
    )
    names = cobucket_orders_lineitem(
        spark, sf_dir, out, prefix=f"bkt_{tag}"
    )
    _BUCKETED[key] = names
    return names


@query(
    "q3_shipping_priority_bucketed",
    # IDENTICAL oracle to the plain-parquet twin: bucketing is a
    # physical layout choice and must be value-invisible.
    oracle=ORACLE["q3_shipping_priority"],
)
def q3_shipping_priority_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q3 over co-bucketed orders/lineitem: same logical plan as
    ``q3_shipping_priority`` (tpch_like.py), but the fact-fact join
    reads matching buckets pairwise instead of shuffling both sides —
    and because the group keys include the bucket key, the aggregation
    re-uses the same partitioning too (no exchange anywhere between
    scan and top-N). ``tests/test_bucketing.py::
    test_bucketed_q3_twin_runs_without_join_exchange`` asserts that
    plan shape mechanically."""
    o_name, l_name = bucketed_orders_lineitem(spark, sf_dir)
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = spark.table(o_name).where(F.col("o_orderdate") < "1997-01-01")
    li = spark.table(l_name).where(F.col("l_shipdate") > "1997-01-01")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    building_orders = o.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        li.join(building_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(cents).alias("revenue_cents"))
        .select("o_orderkey", "revenue_cents", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_cents").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q12_shipmode_priority_bucketed",
    # IDENTICAL oracle to the plain twin, same invariant as q3's.
    oracle=ORACLE["q12_shipmode_priority"],
)
def q12_shipmode_priority_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 over the SAME co-bucketed tables as the q3 twin —
    proving the bucketed bootstrap amortizes across the whole
    orderkey-join family, not one query: the fact-fact join is again
    exchange-free (the aggregation's l_returnflag grouping still
    shuffles, correctly — its key is not the bucket key; that
    shuffle moves O(groups) partial aggregates, not facts).
    ``tests/test_bucketing.py`` asserts the join-side plan shape."""
    o_name, l_name = bucketed_orders_lineitem(spark, sf_dir)
    o = spark.table(o_name).select("o_orderkey", "o_orderpriority")
    li = spark.table(l_name).where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.sum(cents).alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q4_order_priority_bucketed",
    # IDENTICAL oracle to the plain twin, same invariant as q3's.
    oracle=ORACLE["q4_order_priority"],
)
def q4_order_priority_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (correlated EXISTS as LEFT SEMI) over the same
    co-bucketed tables: the semi join's equi key is the bucket key, so
    neither fact shuffles — the extra non-equi condition
    (``l_shipdate > o_orderdate``) rides on the bucket-pairwise
    sort-merge. At 100 TB the EXISTS probe is the expensive side of
    Q4; bucketing removes both exchanges from it.
    ``tests/test_bucketing.py`` asserts the plan shape."""
    o_name, l_name = bucketed_orders_lineitem(spark, sf_dir)
    o = spark.table(o_name).where(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = spark.table(l_name).select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q18_large_orders_bucketed",
    # IDENTICAL oracle to the plain twin, same invariant as q3's.
    oracle=ORACLE["q18_large_orders"],
)
def q18_large_orders_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 over the bucketed tables — the strongest member of
    the family: the HAVING pre-aggregate groups BY THE BUCKET KEY
    (``l_orderkey``), so even the aggregation is exchange-free (bucket
    scan partitioning satisfies the group-by distribution), and the
    orders⋈big join then reuses the same partitioning. Between the two
    fact scans and the final top-N there is no orderkey exchange
    anywhere — at 100 TB the whole large-order detection runs at scan
    locality. Only the customer key join remains (broadcast-eligible
    dim at any realistic scale)."""
    o_name, l_name = bucketed_orders_lineitem(spark, sf_dir)
    big = (
        spark.table(l_name)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 210)
        .select("l_orderkey")
    )
    o = spark.table(o_name)
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "totalprice_cents"
            ),
        )
        .orderBy(F.col("totalprice_cents").desc(), "o_orderkey")
        .limit(50)
    )


# (applicationId, abs sf_dir) -> suppkey-bucketed lineitem table name
_BUCKETED_SUPP: dict[tuple[str, str], str] = {}


def bucketed_lineitem_by_suppkey(spark: SparkSession, sf_dir: str) -> str:
    """Catalog name of a lineitem copy bucketed on ``l_suppkey`` —
    the OTHER high-traffic lineitem key: revenue-per-supplier shapes
    (Q15 and friends) group on it, so bucketing by the aggregation
    key makes those rollups exchange-free the same way the orderkey
    family de-shuffles its joins. One more one-time write, amortized
    across every suppkey-keyed consumer in the session."""
    sf_abs = os.path.abspath(sf_dir)
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_abs)
    cached = _BUCKETED_SUPP.get(key)
    if cached and spark.catalog.tableExists(cached):
        return cached
    tag = sf_tag(sf_abs)
    name = f"bkt_{tag}_lineitem_supp"
    out = os.path.join(
        tempfile.gettempdir(), "spark_graft_bucketed", app_id, tag, name
    )
    from end2end_data_pipeline_spark.sources.bucketing import write_bucketed

    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        name,
        "l_suppkey",
        sort_col="l_suppkey",
        path=out,
    )
    _BUCKETED_SUPP[key] = name
    return name


@query(
    "q8_market_share_bucketed",
    # IDENTICAL oracle to the plain twin, same invariant as q3's.
    oracle=ORACLE["q8_market_share"],
)
def q8_market_share_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 over the co-bucketed facts: the only fact-fact edge in
    the eight-way join is orders ⋈ lineitem on the order key, and both
    sides' broadcast pre-reductions (part filter on lineitem, AMERICA
    customers + date on orders) PRESERVE the bucket scan's hash
    distribution — a broadcast hash join keeps the streamed side's
    partitioning — so the surviving join runs bucket-pairwise with
    zero exchanges. Everything else was already broadcast in the plain
    twin; bucketing removes the last shuffle of fact rows (the final
    per-year rollup moves O(years) partials).
    ``tests/test_bucketing.py`` asserts the plan shape."""
    o_name, l_name = bucketed_orders_lineitem(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    li = spark.table(l_name).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    america_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("am_nk"))
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(america_nations), F.col("c_nationkey") == F.col("am_nk")
    ).select("c_custkey")
    o = spark.table(o_name).where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(F.lit(0))
    )
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            nation_cents.alias("nation_cents"),
            F.sum(cents).alias("total_cents"),
            (nation_cents / F.sum(cents).cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q15_top_supplier_bucketed",
    # IDENTICAL oracle to the plain twin, same invariant as q3's.
    oracle=ORACLE["q15_top_supplier"],
)
def q15_top_supplier_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 over lineitem bucketed on its AGGREGATION key: the
    plain twin's only shuffle is the revenue rollup by ``l_suppkey``;
    with the suppkey-bucketed copy that group-by is satisfied by the
    scan partitioning (the q18 trick applied to an agg-only query),
    the max-revenue scalar and the supplier dim both broadcast, and
    the whole query runs without exchanging a single fact row.
    ``tests/test_bucketing.py`` asserts the agg-side plan shape."""
    l_name = bucketed_lineitem_by_suppkey(spark, sf_dir)
    li = spark.table(l_name).where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    # The plain twin's two consumers of `revenue` share one scan via
    # exchange reuse; here the agg is exchange-free, so without a
    # cache the max-scalar branch would re-scan lineitem. Cache the
    # O(suppliers) rollup instead — one bucket-local scan total.
    # coalesce(1): cached builds sit outside AQE coalescing and the
    # rollup is dim-sized. session_cached so repeat runs reuse ONE
    # InMemoryRelation per (app, sf_dir) (ADVICE r8).
    revenue = session_cached(
        spark,
        f"q15_rollup_{sf_tag(os.path.abspath(sf_dir))}",
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents).alias("total_revenue_cents"))
        .coalesce(1),
    )
    top = revenue.agg(F.max("total_revenue_cents").alias("max_cents"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(
            F.broadcast(top),
            F.col("total_revenue_cents") == F.col("max_cents"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )
