"""Invariants of the nonparametric-statistics tier beyond the hash
oracle: each statistic is re-derived brute-force in Python from the
raw sf0.001 tables and must match the engine's exact integers."""

from __future__ import annotations

from collections import Counter, defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_orderdate", "o_totalprice", "o_custkey"
    ).collect()


def _weekly_rev(orders, key=lambda r: None):
    out: dict = defaultdict(lambda: defaultdict(int))
    epoch = None
    for r in orders:
        d = r["o_orderdate"].date()
        days = (d - type(d)(1992, 1, 1)).days
        out[key(r)][days // 7] += int(round(r["o_totalprice"] * 100))
    return out


def test_mann_kendall_matches_bruteforce(spark):
    orders = _orders(spark)
    weekly = _weekly_rev(orders, key=lambda r: r["o_orderpriority"])
    rows = entrymod.queries()["orders_weekly_mann_kendall"](spark, SF).collect()
    assert rows
    by_prio = {r["priority"]: r for r in rows}
    assert set(by_prio) == {p for p, wk in weekly.items() if len(wk) > 1}
    for prio, wk in weekly.items():
        seq = [v for _, v in sorted(wk.items())]
        n = len(seq)
        if n < 2:
            continue
        plus = minus = ties = 0
        for i in range(n):
            for j in range(i + 1, n):
                if seq[j] > seq[i]:
                    plus += 1
                elif seq[j] < seq[i]:
                    minus += 1
                else:
                    ties += 1
        r = by_prio[prio]
        assert r["n_weeks"] == n
        assert r["n_pairs"] == n * (n - 1) // 2 == plus + minus + ties
        assert (r["n_plus"], r["n_minus"], r["n_ties"]) == (plus, minus, ties)
        assert r["s_stat"] == plus - minus
        assert r["trend_score"] == (plus - minus) / r["n_pairs"]


def test_kendall_tau_matches_bruteforce(spark):
    orders = _orders(spark)
    cnt: dict[int, int] = defaultdict(int)
    rev: dict[int, int] = defaultdict(int)
    for r in orders:
        d = r["o_orderdate"].date()
        w = (d - type(d)(1992, 1, 1)).days // 7
        cnt[w] += 1
        rev[w] += int(round(r["o_totalprice"] * 100))
    weeks = sorted(cnt)
    xs = [cnt[w] for w in weeks]
    ys = [rev[w] for w in weeks]
    nc = nd = tx = ty = tb = 0
    for i in range(len(weeks)):
        for j in range(i + 1, len(weeks)):
            dx = (xs[j] > xs[i]) - (xs[j] < xs[i])
            dy = (ys[j] > ys[i]) - (ys[j] < ys[i])
            if dx * dy == 1:
                nc += 1
            elif dx * dy == -1:
                nd += 1
            elif dx == 0 and dy == 0:
                tb += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
    [r] = entrymod.queries()["orders_weekly_kendall_tau"](spark, SF).collect()
    assert r["n_weeks"] == len(weeks)
    assert r["n_pairs"] == len(weeks) * (len(weeks) - 1) // 2
    assert (r["concordant"], r["discordant"]) == (nc, nd)
    assert (r["ties_x"], r["ties_y"], r["ties_both"]) == (tx, ty, tb)
    assert r["tau_num"] == nc - nd
    assert -1.0 <= r["tau_a"] <= 1.0


def test_ks_distance_cdf_shape(spark):
    from end2end_data_pipeline_spark.operators.stats_ext import (
        KS_BAND_CENTS,
        KS_SEG_A,
        KS_SEG_B,
    )

    rows = entrymod.queries()["segment_price_ks_distance"](spark, SF).collect()
    assert rows
    seg_of = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    bands_a: Counter = Counter()
    bands_b: Counter = Counter()
    for r in _orders(spark):
        seg = seg_of[r["o_custkey"]]
        band = int(round(r["o_totalprice"] * 100)) // KS_BAND_CENTS
        if seg == KS_SEG_A:
            bands_a[band] += 1
        elif seg == KS_SEG_B:
            bands_b[band] += 1
    tot_a, tot_b = sum(bands_a.values()), sum(bands_b.values())
    # bands present and exact per-band counts
    assert {r["band"] for r in rows} == set(bands_a) | set(bands_b)
    cum_a = cum_b = 0
    best = 0.0
    for r in sorted(rows, key=lambda r: r["band"]):
        assert r["n_a"] == bands_a.get(r["band"], 0)
        assert r["n_b"] == bands_b.get(r["band"], 0)
        cum_a += r["n_a"]
        cum_b += r["n_b"]
        assert (r["cum_a"], r["cum_b"]) == (cum_a, cum_b)
        gap = cum_a / tot_a - cum_b / tot_b
        assert r["cdf_gap"] == gap
        best = max(best, abs(gap))
    assert (cum_a, cum_b) == (tot_a, tot_b)
    assert all(r["ks_d"] == best for r in rows)
    assert 0.0 <= best <= 1.0


def test_mwu_matches_bruteforce(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    ).collect()
    vals: dict[str, list[int]] = defaultdict(list)
    for r in li:
        vals[r["l_returnflag"]].append(int(r["l_quantity"]))
    rows = entrymod.queries()["returnflag_quantity_mwu"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        a, b = vals[r["flag_a"]], vals[r["flag_b"]]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        u2 = 0  # 2*U1 = sum over pairs of 2*[a<b] + 1*[a==b]
        cb = Counter(b)
        lt = 0
        eqs = {v: c for v, c in cb.items()}
        for v in sorted(set(a) | set(cb)):
            ca = sum(1 for x in a if x == v)
            u2 += ca * (2 * lt + eqs.get(v, 0))
            lt += eqs.get(v, 0)
        assert r["u1_x2"] == float(u2)
        # U1 + U2 = n_a * n_b  <=>  auc(a,b) + auc(b,a) = 1
        assert r["auc"] == u2 / (2 * len(a) * len(b))
        assert 0.0 <= r["auc"] <= 1.0


def test_runs_test_matches_bruteforce(spark):
    daily: dict[int, int] = defaultdict(int)
    for r in _orders(spark):
        d = r["o_orderdate"].date()
        daily[(d - type(d)(1992, 1, 1)).days] += int(
            round(r["o_totalprice"] * 100)
        )
    revs = sorted(
        (rev, day) for day, rev in daily.items()
    )  # deterministic tie-break mirrors (rev_cents, day_idx)
    n = len(revs)
    median = revs[(n + 1) // 2 - 1][0]
    seq = [1 if daily[day] > median else 0 for day in sorted(daily)]
    n_runs = sum(
        1 for i, v in enumerate(seq) if i == 0 or seq[i - 1] != v
    )
    [r] = entrymod.queries()["orders_daily_runs_test"](spark, SF).collect()
    assert r["n_days"] == n
    assert r["median_cents"] == median
    assert r["n_above"] == sum(seq)
    assert r["n_below"] == n - sum(seq)
    assert r["n_runs"] == n_runs
    assert r["expected_runs"] == 1.0 + 2.0 * r["n_above"] * r["n_below"] / n


def test_cms_selfjoin_estimate_bounds(spark):
    deg = Counter(
        r["l_partkey"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_partkey")
        .collect()
    )
    exact = sum(d * d for d in deg.values())
    [r] = entrymod.queries()["partkey_selfjoin_cms_estimate"](
        spark, SF
    ).collect()
    assert r["exact_pairs"] == float(exact)
    assert r["cms_estimate"] >= r["exact_pairs"]
    assert r["overcount_ratio"] >= 1.0
    assert (r["cms_width"], r["cms_depth"]) == (256, 4)


def test_drawdown_records_match_bruteforce(spark):
    daily: dict[str, int] = defaultdict(int)
    for r in _orders(spark):
        daily[r["o_orderdate"].date().isoformat()] += int(
            round(r["o_totalprice"] * 100)
        )
    peak = 0
    best = 0
    expect = []
    for day in sorted(daily):
        rev = daily[day]
        peak = max(peak, rev)
        dd = peak - rev
        if dd > 0 and dd > best:
            best = dd
            expect.append((day, rev, peak, dd))
    rows = entrymod.queries()["orders_daily_drawdown_records"](
        spark, SF
    ).collect()
    got = [
        (r["day"], r["rev_cents"], r["run_peak_cents"], r["drawdown_cents"])
        for r in rows
    ]
    assert got == expect
    for r in rows:
        assert r["drawdown_share"] == r["drawdown_cents"] / r["run_peak_cents"]
        # record depths strictly increase down the episode log
    depths = [r["drawdown_cents"] for r in rows]
    assert depths == sorted(depths) and len(set(depths)) == len(depths)
