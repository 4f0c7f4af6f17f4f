"""Semantic invariants of the Theil-Sen trend and quantile
normalization beyond the hash oracle: the slope must equal the Python
median of pairwise slopes, and normalized distributions must be
quantile-consistent with the pooled distribution."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_theilsen_matches_python_median_of_slopes(spark):
    rows = entrymod.queries()["orders_weekly_theilsen_trend"](
        spark, SF
    ).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
        .collect()
    )
    import datetime

    epoch = datetime.date(1992, 1, 1)
    weekly = defaultdict(lambda: defaultdict(int))
    for r in orders:
        w = (r["o_orderdate"].date() - epoch).days // 7
        weekly[r["o_orderpriority"]][w] += round(r["o_totalprice"] * 100)
    got = {r["priority"]: r for r in rows}
    for prio, series in weekly.items():
        pts = sorted(series.items())
        slopes = sorted(
            float(y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for x2, y2 in pts[i + 1 :]
        )
        if not slopes:
            assert prio not in got
            continue
        r = got[prio]
        assert r["n_weeks"] == len(pts)
        assert r["n_slopes"] == len(slopes)
        m = slopes[(len(slopes) + 1) // 2 - 1]  # lower median
        assert r["slope_cents_per_week"] == m
        resid = sorted(float(y) - m * x for x, y in pts)
        assert r["intercept_cents"] == resid[(len(resid) + 1) // 2 - 1]


def test_quantile_norm_aligns_distributions(spark):
    rows = entrymod.queries()["docs_quantile_norm_by_lang"](spark, SF).collect()
    assert rows
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "n_chars")
        .collect()
    )
    glob = sorted(r["n_chars"] for r in docs)
    N = len(glob)
    per_lang = defaultdict(list)
    for r in docs:
        per_lang[r["lang"]].append(r["n_chars"])
    for lang in per_lang:
        per_lang[lang].sort()
    seen = defaultdict(int)
    for r in rows:
        vals = per_lang[r["lang"]]
        n_l = len(vals)
        # nearest-rank inverse CDF at the value's upper within-lang rank
        cum_l = sum(1 for v in vals if v <= r["raw_value"])
        idx = -(-cum_l * N // n_l)  # ceil
        assert r["norm_value"] == glob[idx - 1]
        assert r["n_docs"] == vals.count(r["raw_value"])
        seen[r["lang"]] += r["n_docs"]
    # every document is mapped exactly once
    assert dict(seen) == {k: len(v) for k, v in per_lang.items()}
    # normalization is monotone within a language
    per = defaultdict(list)
    for r in rows:
        per[r["lang"]].append((r["raw_value"], r["norm_value"]))
    for lang, pairs in per.items():
        pairs.sort()
        norms = [n for _, n in pairs]
        assert norms == sorted(norms)
