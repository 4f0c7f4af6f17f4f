"""Physical-plan shape assertions — the SCALE.md promises as tests.

These don't check answers (the oracle gate does); they check that the
plan Catalyst produces is the plan the engine was designed around:
filters reach the scan, dimension joins broadcast, band joins use the
tiny-side BNLJ, and no query ever drops to row-at-a-time Python.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # at least the shipdate range must reach the reader
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_dim_join_broadcasts(spark):
    plan = _plan(spark, "nation_supplier_revenue")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_band_join_is_broadcast_nested_loop(spark):
    plan = _plan(spark, "value_tier_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_anti_and_semi_joins(spark):
    anti = _plan(spark, "customers_without_orders")
    semi = _plan(spark, "q4_order_priority")
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_asof_join_has_single_user_shuffle_and_no_join(spark):
    plan = _plan(spark, "asof_last_view_before_purchase")
    # the as-of is union + window: no join operator anywhere
    assert "Join" not in plan
    assert "Window" in plan


def test_no_row_at_a_time_python_anywhere(executed_plans):
    """EVERY registered query must stay off the row-at-a-time Python
    path (BatchEvalPython); Python is allowed only as Arrow-batched
    mapInPandas (the multimodal boundary). Reads the session-shared
    plan build (r14) — Python-node presence is sf-independent, and a
    query that fails to BUILD is the plan-audit gate's finding."""
    plans, _errors = executed_plans
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_contamination_probe_broadcasts_eval_side(spark):
    """The train side must probe a BROADCAST eval-shingle inventory —
    if this degrades to a shuffle join, the 100 TB train corpus
    reshuffles on shingle hash."""
    plan = _plan(spark, "eval_contamination")
    assert "BroadcastHashJoin" in plan


def test_multimodal_uses_arrow_batches(spark):
    plan = _plan(spark, "multimodal_decode_features")
    # mapInPandas shows as MapInPandas/ArrowEvalPython — NOT BatchEvalPython
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan or "ArrowEval" in plan


def test_cf_pair_generation_plans_once(spark):
    """The r9 review fix held: symmetrization must not duplicate the
    quadratic pair-generation subtree (self-union planned the capped
    self-join + aggregate twice; the explode form plans it once)."""
    plan = _plan(spark, "part_itemitem_cosine_topk")
    # exactly one self-join of the capped incidence survives in the
    # physical plan (one SMJ/SHJ on the customer key), plus the two
    # degree equi-joins and the broadcast attach — never two pair gens
    n_generate = plan.count("Generate explode")
    assert n_generate == 1, f"expected 1 explode, saw {n_generate}"


def test_shortest_path_frontier_is_broadcast_only(spark):
    """Each Bellman-Ford round must enter the plan as a broadcast of
    the tiny frontier against the cached edge list — an accumulated
    shuffle chain is the 3x-slower shape the operator was rebuilt
    away from."""
    plan = _plan(spark, "nation_supply_latency_paths")
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_single_corpus_scan(spark):
    """Corpus statistics fold out of the session-cached per-doc
    profile: exactly one parquet scan of documents."""
    df = entrymod.queries()["docs_bm25_search"](spark, SF)
    fmt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", fmt)
    assert len(scans) == 1, f"expected 1 scan, saw {len(scans)}"


def test_udaf_stays_on_arrow_path(spark):
    plan = _plan(spark, "nation_median_spend_udaf")
    # Spark 4.1 names the grouped-agg Arrow node ArrowAggregatePython
    # (older releases: AggregateInPandas) — either is the Arrow path
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_gdpr_cascade_scans_each_table_once_per_branch(spark):
    """The cascade audit is 6 single-column parquet scans — customer
    three times (the total-count row plus the keyset predicate in the
    orders-flag and deleted-orders branches), orders twice (flag +
    deleted-keys), lineitem once — and the erasure keyset is a pushed
    md5 predicate, never a collected list. Pinned EXACTLY so the
    first extra-scan regression (e.g. the keyset branch losing reuse)
    trips the probe."""
    df = entrymod.queries()["gdpr_delete_cascade_audit"](spark, SF)
    fmt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", fmt)
    assert len(scans) == 6, f"scan count changed: {len(scans)}"
    assert "BatchEvalPython" not in fmt


def test_mase_single_fact_scan_then_days_window(spark):
    """The MASE backtest collapses orders to O(#days) in one pass:
    one parquet scan of the fact table feeding the daily rollup (the
    bounds pass scans once more for min/max), then a single ordered
    window over the calendar spine."""
    df = entrymod.queries()["orders_seasonal_naive_mase"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    fmt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    scans = re.findall(r"\(\d+\) Scan parquet", fmt)
    assert len(scans) <= 2, f"scan blowup: {len(scans)}"
    assert "Window" in plan
