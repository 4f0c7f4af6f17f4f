"""Semantic invariants of the Markov backtest and the MAD anomaly
screen beyond the hash oracle: the backtest must reproduce a Python
train/test replay, and MAD flags must match a robust recomputation."""

from __future__ import annotations

from collections import Counter, defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_markov_backtest_matches_python_replay(spark):
    rows = entrymod.queries()["markov_backtest_hitrate"](spark, SF).collect()
    assert rows, "backtest returned no rows at sf0.001"
    # let Spark compute epoch-µs: collect() renders TimestampType in
    # the OS-local timezone, so Python-side re-derivation would skew
    # on non-UTC machines (r9 code review)
    from pyspark.sql import functions as F

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            "event_id",
            "event_type",
        )
        .collect()
    )
    stamps = [r["us"] for r in ev]
    split = (min(stamps) + max(stamps)) // 2
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_id"], r["event_type"]))
    train, test = Counter(), Counter()
    for seq in by_user.values():
        seq.sort()
        for (t1, _, a), (t2, _, b) in zip(seq, seq[1:]):
            if t2 < split:
                train[(a, b)] += 1
            elif t1 >= split:
                test[(a, b)] += 1
    model = {}
    per_prev = defaultdict(list)
    for (a, b), n in train.items():
        per_prev[a].append((-n, b))
    for a, cands in per_prev.items():
        model[a] = sorted(cands)[0][1]
    expect = {}
    for a, pred in model.items():
        n_test = sum(n for (p, _), n in test.items() if p == a)
        if n_test == 0:
            continue
        n_hits = test.get((a, pred), 0)
        n_train = sum(n for (p, _), n in train.items() if p == a)
        expect[a] = (pred, n_train, n_test, n_hits)
    got = {
        r["event_type"]: (r["pred_type"], r["n_train"], r["n_test"], r["n_hits"])
        for r in rows
    }
    assert got == expect
    for r in rows:
        assert r["hit_rate"] == float(r["n_hits"]) / r["n_test"]


def test_mad_flags_match_python_recomputation(spark):
    rows = entrymod.queries()["orders_daily_mad_anomalies"](spark, SF).collect()
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily = defaultdict(int)
    for r in orders:
        daily[str(r["o_orderdate"].date())] += round(r["o_totalprice"] * 100)

    def lower_median(pairs):
        # pairs sorted by (value, day); element at floor((n+1)/2)
        s = sorted(pairs)
        return s[(len(s) + 1) // 2 - 1][0]

    med = lower_median([(v, d) for d, v in daily.items()])
    mad = lower_median([(abs(v - med), d) for d, v in daily.items()])
    expect = sorted(
        (
            (d, v, med, mad, abs(v - med))
            for d, v in daily.items()
            if abs(v - med) > 5 * mad
        ),
        key=lambda t: (-t[4], t[0]),
    )[:50]
    got = [
        (r["day"], r["rev_cents"], r["med_cents"], r["mad_cents"], r["deviation_cents"])
        for r in rows
    ]
    assert got == expect


def test_relational_division_exactly_the_full_coverage_set(spark):
    rows = entrymod.queries()["suppliers_serving_all_regions"](
        spark, SF
    ).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .collect()
    )
    o = {
        r["o_orderkey"]: r["o_custkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    c = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    n = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    n_regions = spark.read.parquet(f"{SF}/region.parquet").count()
    reach = defaultdict(set)
    for r in li:
        reach[r["l_suppkey"]].add(n[c[o[r["l_orderkey"]]]])
    expect = sorted(s for s, rs in reach.items() if len(rs) == n_regions)
    assert [r["s_suppkey"] for r in rows] == expect
    # and no supplier outside the answer covers every region
    assert all(
        len(reach[s]) < n_regions for s in reach if s not in set(expect)
    )


def test_capacity_queue_sim_matches_python_replay(spark):
    """The two-sided clamp is the one genuinely sequential recurrence
    here — replay it independently (serve-then-drop order pinned)."""
    rows = entrymod.queries()["orders_capacity_queue_sim"](spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderdate")
        .collect()
    )
    daily = Counter(str(r["o_orderdate"].date()) for r in orders)
    import datetime

    d0 = datetime.date.fromisoformat(min(daily))
    d1 = datetime.date.fromisoformat(max(daily))
    spine = [
        str(d0 + datetime.timedelta(days=i))
        for i in range((d1 - d0).days + 1)
    ]
    total = sum(daily.values())
    cap = total // len(spine) + 1
    qmax = 5 * cap
    q, expect = 0, []
    for day in spine:
        a = daily.get(day, 0)
        avail = q + a
        served = min(avail, cap)
        rem = avail - served
        dropped = max(0, rem - qmax)
        q = rem - dropped
        expect.append((day, a, served, dropped, q))
    got = [
        (r["day"], r["arrivals"], r["served"], r["dropped"], r["queue_end"])
        for r in rows
    ]
    assert got == expect
    # conservation: arrivals = served + dropped + final queue
    assert total == sum(r["served"] for r in rows) + sum(
        r["dropped"] for r in rows
    ) + got[-1][4]


def test_udaf_median_matches_python(spark):
    rows = entrymod.queries()["nation_median_spend_udaf"](spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    spend = defaultdict(int)
    for r in orders:
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    per_nation = defaultdict(list)
    for ck, cents in spend.items():
        per_nation[nation[cust[ck]]].append(cents)
    expect = {}
    for nat, vals in per_nation.items():
        vals.sort()
        expect[nat] = (len(vals), vals[(len(vals) + 1) // 2 - 1])
    got = {
        r["nation"]: (r["n_customers"], r["median_spend_cents"]) for r in rows
    }
    assert got == expect
