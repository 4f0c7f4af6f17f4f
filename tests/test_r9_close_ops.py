"""Invariants of the round-9 closing operators beyond the hash oracle:
SCD2 intervals must tile, UDTF runs must be maximal, shares must sum
to one."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_tile_and_single_current(spark):
    rows = entrymod.queries()["scd2_customer_tier_history"](
        spark, SF
    ).collect()
    assert rows, "fixture subset empty"
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r["o_custkey"]].append(r)
    for cust, ivs in by_cust.items():
        # output is ordered by eff_from already; intervals must tile
        # (each close where the next opens), tier must CHANGE at every
        # boundary, and exactly the last interval is open/current
        for a, b in zip(ivs, ivs[1:]):
            assert a["eff_to"] == b["eff_from"], (cust, a, b)
            assert a["tier"] != b["tier"], (cust, a, b)
            assert a["is_current"] == 0
        assert ivs[-1]["is_current"] == 1
        assert ivs[-1]["eff_to"] == "9999-12"


def test_udtf_runs_are_maximal(spark):
    rows = entrymod.queries()["udtf_token_runs"](spark, SF).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    text_of = {r["doc_id"]: r["text"] for r in docs}
    for r in rows[:200]:
        toks = text_of[r["doc_id"]].split(" ")
        s, n = r["start_pos"] - 1, r["run_len"]
        run = toks[s : s + n]
        assert n >= 2 and len(set(run)) == 1 == len({r["token"]} | set(run))
        # maximal: neither neighbor extends the run
        assert s == 0 or toks[s - 1] != r["token"]
        assert s + n == len(toks) or toks[s + n] != r["token"]


def test_revenue_shares_sum_to_one(spark):
    rows = entrymod.queries()["region_nation_revenue_share"](
        spark, SF
    ).collect()
    assert rows
    per_region = defaultdict(float)
    region_global = {}
    for r in rows:
        per_region[r["region"]] += r["share_of_region"]
        region_global[r["region"]] = r["region_share_of_global"]
    for region, tot in per_region.items():
        assert abs(tot - 1.0) < 1e-9, (region, tot)
    assert abs(sum(region_global.values()) - 1.0) < 1e-9


def test_scd2_pit_join_covers_every_subset_order(spark):
    """Interval tiling means each subset order matches EXACTLY one
    validity interval — the join neither drops nor duplicates."""
    from end2end_data_pipeline_spark.operators.quality import SCD2_SUBSET

    joined = entrymod.queries()["scd2_point_in_time_join"](spark, SF)
    n_orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .where(f"o_custkey % {SCD2_SUBSET} = 0")
        .count()
    )
    assert joined.count() == n_orders > 0
    assert joined.select("o_orderkey").distinct().count() == n_orders


def test_ewma_renormalizes_partial_history(spark):
    rows = entrymod.queries()["orders_daily_ewma16"](spark, SF).collect()
    assert rows
    full_den = sum(2 ** k for k in range(16))  # 65535 once history fills
    assert rows[0]["ewma_den"] == 2 ** 15  # first day: only its own weight
    assert rows[-1]["ewma_den"] == full_den
    for r in rows:
        assert abs(r["ewma"] - r["ewma_num"] / r["ewma_den"]) < 1e-12
