"""Invariants of the reporting/serving-tier operators beyond the hash
oracle: the sweep-line must conserve sessions, bitmaps must agree with
their popcounts, CMS must never undercount, the skyline must be an
antichain, and pagination must neither lose nor duplicate rows."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_concurrency_sweep_conserves_sessions(spark):
    rows = entrymod.queries()["session_concurrency_timeline"](spark, SF).collect()
    assert rows
    running = 0
    opened = 0
    for r in rows:
        running += r["delta_sessions"]
        assert running == r["concurrent"]
        assert r["concurrent"] >= 0
        opened += max(r["delta_sessions"], 0)
    # every opened session eventually closes
    assert running == 0
    # openings equal the sessionization query's total session count
    sess = entrymod.queries()["event_sessionization"](spark, SF).collect()
    n_sessions = sum(r["n_sessions"] for r in sess)
    # +deltas can net against -deltas within a minute, so compare
    # against the positive delta mass only when no minute mixes signs;
    # the robust invariant is the net-zero close plus total >= count
    assert opened <= n_sessions
    assert max(r["concurrent"] for r in rows) <= n_sessions


def test_activity_bitmap_matches_popcount(spark):
    rows = entrymod.queries()["user_activity_bitmap"](spark, SF).collect()
    assert rows
    for r in rows:
        mask = r["day_mask"]
        assert mask > 0
        assert bin(mask).count("1") == r["active_days"]
        # lowest/highest set bits are the first/last active days
        assert (mask & -mask).bit_length() - 1 == r["first_day"]
        assert mask.bit_length() - 1 == r["last_day"]
        assert r["n_events"] >= r["active_days"]


def test_cms_never_undercounts(spark):
    rows = entrymod.queries()["user_count_cms_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cms_n"] >= r["exact_n"]
        assert r["overcount"] == r["cms_n"] - r["exact_n"] >= 0


def test_skyline_is_an_antichain(spark):
    rows = entrymod.queries()["part_price_size_skyline"](spark, SF).collect()
    assert rows
    size_at_price: dict[int, set[int]] = defaultdict(set)
    for r in rows:
        size_at_price[r["price_cents"]].add(r["p_size"])
    # one frontier size per price, strictly increasing with price
    prices = sorted(size_at_price)
    sizes = [size_at_price[p] for p in prices]
    assert all(len(s) == 1 for s in sizes)
    flat = [next(iter(s)) for s in sizes]
    assert all(a < b for a, b in zip(flat, flat[1:]))


def test_keyset_pages_partition_the_prefix(spark):
    from end2end_data_pipeline_spark.operators.reporting_ext import (
        N_PAGES,
        PAGE_SIZE,
    )

    rows = entrymod.queries()["orders_keyset_pagination"](spark, SF).collect()
    assert [r["page"] for r in rows] == list(range(len(rows)))
    assert len(rows) >= 1
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    expect_total = min(n_orders, N_PAGES * PAGE_SIZE)
    assert sum(r["n_rows"] for r in rows) == expect_total
    # cursor hand-off strictly advances (newest-first)
    cursors = [(r["cursor_date"], r["cursor_key"]) for r in rows]
    assert all(a > b for a, b in zip(cursors, cursors[1:]))
    assert len(set(r["cursor_key"] for r in rows)) == len(rows)


def test_listagg_is_rank_ordered(spark):
    rows = entrymod.queries()["nation_customer_listagg"](spark, SF).collect()
    assert rows
    cust = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_name", "c_custkey", "c_acctbal", "c_nationkey")
        .collect()
    )
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    by_nation = defaultdict(list)
    for c in cust:
        by_nation[nat[c["c_nationkey"]]].append(
            (-int(round(c["c_acctbal"] * 100)), c["c_custkey"], c["c_name"])
        )
    for r in rows:
        names = r["top_customers"].split(",")
        assert len(names) == r["n_listed"] <= 5
        expect = [t[2] for t in sorted(by_nation[r["nation"]])[:5]]
        assert names == expect


def test_chisq_marginals_are_consistent(spark):
    rows = entrymod.queries()["segment_nation_chisq"](spark, SF).collect()
    assert rows
    n_total = rows[0]["n_total"]
    assert all(r["n_total"] == n_total for r in rows)
    assert n_total == spark.read.parquet(f"{SF}/customer.parquet").count()
    seg_sum: dict[str, int] = defaultdict(int)
    nat_sum: dict[str, int] = defaultdict(int)
    for r in rows:
        assert r["chi2_term"] >= 0
        assert (
            r["dev_num"]
            == r["observed"] * n_total - r["seg_total"] * r["nat_total"]
        )
        seg_sum[r["segment"]] += r["observed"]
        nat_sum[r["nation"]] += r["observed"]
    for r in rows:
        assert seg_sum[r["segment"]] == r["seg_total"]
        assert nat_sum[r["nation"]] == r["nat_total"]
    assert sum(seg_sum.values()) == n_total


def test_gap_median_bands_are_tight(spark):
    from end2end_data_pipeline_spark.operators.reporting_ext import GAP_BAND_DAYS

    rows = entrymod.queries()["customer_order_gap_median"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["band_lo_days"] % GAP_BAND_DAYS == 0
        assert r["band_lo_days"] <= r["min_median"] <= r["max_median"]
        assert r["max_median"] < r["band_lo_days"] + GAP_BAND_DAYS
        assert r["n_customers"] > 0


def test_conjunctive_search_facets_recount(spark):
    from end2end_data_pipeline_spark.operators.reporting_ext import SEARCH_TERMS

    rows = entrymod.queries()["docs_conjunctive_search"](spark, SF).collect()
    assert rows
    text_of = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    totals = [r["tf_total"] for r in rows]
    assert totals == sorted(totals, reverse=True)
    for r in rows:
        toks = text_of[r["doc_id"]].split(" ")
        per_term = [toks.count(t) for t in SEARCH_TERMS]
        assert all(v > 0 for v in per_term)
        assert [r[f"tf_{t}"] for t in SEARCH_TERMS] == per_term
        assert r["tf_total"] == sum(per_term)
