"""Censored-lifetable invariants beyond the hash oracle: a Python
replay with censoring, reconciliation against the uncensored hazard
(censoring can only GROW the at-risk set, so the censored hazard is
never larger), and observation-count conservation."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import datetime

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.stats_ext import (
    LIFETABLE_MAX_GAP,
    STUDY_END,
)

SF = "/root/testdata/sf0.001"


def test_lifetable_matches_python(spark):
    rows = entrymod.queries()["customer_censored_lifetable"](
        spark, SF
    ).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderkey")
        .collect()
    )
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    end = datetime.fromisoformat(f"{STUDY_END}T00:00:00")
    events: Counter = Counter()
    censors: Counter = Counter()
    for seq in by_cust.values():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            events[int((b - a).total_seconds() // 86400)] += 1
        censors[int((end - seq[-1][0]).total_seconds() // 86400)] += 1
    allg = sorted(set(events) | set(censors))
    expect = []
    seen = 0
    total = sum(events.values()) + sum(censors.values())
    for g in allg:
        at_risk = total - seen
        if g <= LIFETABLE_MAX_GAP:
            expect.append(
                (g, events.get(g, 0), censors.get(g, 0), at_risk)
            )
        seen += events.get(g, 0) + censors.get(g, 0)
    got = [
        (r["gap_days"], r["n_events"], r["n_censored"], r["n_at_risk"])
        for r in rows
    ]
    assert got == expect
    for r in rows:
        assert abs(r["hazard"] - r["n_events"] / r["n_at_risk"]) < 1e-12
    # conservation: one censor record per customer, one event per
    # consecutive order pair
    assert sum(censors.values()) == len(by_cust)
    assert sum(events.values()) == len(orders) - len(by_cust)


def test_censoring_never_raises_hazard(spark):
    q = entrymod.queries()
    cens = {
        r["gap_days"]: r["hazard"]
        for r in q["customer_censored_lifetable"](spark, SF).collect()
    }
    uncens = {
        r["gap_days"]: r["hazard"]
        for r in q["customer_repurchase_hazard"](spark, SF).collect()
    }
    shared = set(cens) & set(uncens)
    assert shared
    # the censored at-risk set is a superset at every gap, so the
    # censored hazard can only be <= the naive one
    assert all(cens[g] <= uncens[g] + 1e-15 for g in shared)
