"""Fiscal-calendar and reconciliation invariants beyond the hash
oracle: Python replays, 4-4-5 period-structure laws, and audit
conservation."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import date

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.reporting_ext import FISCAL_EPOCH

SF = "/root/testdata/sf0.001"


def _fiscal(d: date) -> tuple[int, int]:
    days = (d - date.fromisoformat(FISCAL_EPOCH)).days
    week = days // 7
    fy = week // 52 + 1
    wiy = week % 52
    q, wq = divmod(wiy, 13)
    period = q * 3 + (0 if wq < 4 else 1 if wq < 8 else 2) + 1
    return fy, period


def test_fiscal_rollup_matches_python(spark):
    rows = entrymod.queries()["orders_fiscal_445_rollup"](spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr("CAST(o_orderdate AS DATE) AS d", "o_totalprice")
        .collect()
    )
    counts: Counter = Counter()
    cents = defaultdict(int)
    for r in orders:
        key = _fiscal(r["d"])
        counts[key] += 1
        cents[key] += round(r["o_totalprice"] * 100)
    got = {
        (r["fiscal_year"], r["fiscal_period"]): (r["n_orders"], r["rev_cents"])
        for r in rows
    }
    assert got == {k: (counts[k], cents[k]) for k in counts}
    # structural laws: periods live in 1..12, years are contiguous
    assert all(1 <= p <= 12 for _, p in got)
    years = sorted({y for y, _ in got})
    assert years == list(range(years[0], years[-1] + 1))


def test_reconciliation_partitions_orders(spark):
    rows = entrymod.queries()["orders_total_reconciliation"](
        spark, SF
    ).collect()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    # the band histogram partitions the order table exactly
    assert sum(r["n_orders"] for r in rows) == n_orders
    # the NULL band is exactly the childless-order count
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    childless = o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left_anti"
    ).count()
    null_rows = [r for r in rows if r["pct_band"] is None]
    assert (null_rows[0]["n_orders"] if null_rows else 0) == childless
    # n_exact never exceeds the band population, and exact rows can
    # only sit in band 100
    for r in rows:
        assert 0 <= r["n_exact"] <= r["n_orders"]
        if r["n_exact"] > 0:
            assert r["pct_band"] == 100


def test_brand_return_rates_matches_python(spark):
    from collections import defaultdict

    from end2end_data_pipeline_spark.operators.quality import (
        RETURN_MIN_LINES,
    )

    rows = entrymod.queries()["brand_return_rates"](spark, SF).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey", "l_returnflag")
        .collect()
    )
    parts = {
        r["p_partkey"]: r["p_brand"]
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        e = agg[parts[r["l_partkey"]]]
        e[0] += 1
        e[1] += r["l_returnflag"] == "R"
    expect = {
        b: (n, k) for b, (n, k) in agg.items() if n >= RETURN_MIN_LINES
    }
    got = {r["brand"]: (r["n_lines"], r["n_returned"]) for r in rows}
    assert got == expect
    for r in rows:
        assert abs(r["return_rate"] - r["n_returned"] / r["n_lines"]) < 1e-12
    # ranked worst-first
    rates = [r["return_rate"] for r in rows]
    assert rates == sorted(rates, reverse=True)


def test_waterfall_reconciles(spark):
    rows = entrymod.queries()["revenue_mom_waterfall"](spark, SF).collect()
    assert rows
    from collections import defaultdict

    by_month = defaultdict(list)
    for r in rows:
        by_month[r["month_idx"]].append(r)
    months = sorted(by_month)
    # per-month: segment deltas sum exactly to the carried total
    for m, rs in by_month.items():
        assert sum(r["delta_cents"] for r in rs) == rs[0]["total_delta_cents"]
        for r in rs:
            assert r["delta_cents"] == r["cents"] - r["prev_cents"]
    # chain consistency: prev_cents equals the prior month's cents for
    # every (segment, month) pair present in both
    cells = {(r["month_idx"], r["segment"]): r["cents"] for r in rows}
    for r in rows:
        key = (r["month_idx"] - 1, r["segment"])
        if key in cells:
            assert r["prev_cents"] == cells[key]
    assert months == list(range(months[0], months[-1] + 1))
