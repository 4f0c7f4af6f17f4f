"""Gini and Fano invariants beyond the hash oracle: Python replays
plus the statistical laws (Gini in [0,1); Fano vs a variance
recomputation including the zero minutes)."""

from __future__ import annotations

from collections import Counter, defaultdict

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_gini_matches_python(spark):
    row = entrymod.queries()["customer_revenue_gini"](spark, SF).collect()[0]
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr(
            "o_custkey", "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents"
        )
        .collect()
    )
    spend: defaultdict = defaultdict(int)
    for r in orders:
        spend[r["o_custkey"]] += r["cents"]
    ordered = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    total = sum(c for _, c in ordered)
    weighted = sum((i + 1) * c for i, (_, c) in enumerate(ordered))
    gini = 2 * weighted / (n * total) - (n + 1) / n
    assert row["n_customers"] == n
    assert row["total_cents"] == total
    assert abs(row["gini"] - gini) < 1e-12
    assert 0.0 <= row["gini"] < 1.0


def test_fano_matches_python(spark):
    rows = entrymod.queries()["event_arrival_burstiness"](spark, SF).collect()
    assert rows
    ev = (
        load_table(spark, SF, "events")
        .selectExpr(
            "event_type", "CAST(date_trunc('minute', ts) AS BIGINT) div 60 AS m"
        )
        .collect()
    )
    counts: defaultdict = defaultdict(Counter)
    for r in ev:
        counts[r["event_type"]][r["m"]] += 1
    gmin = min(r["m"] for r in ev)
    gmax = max(r["m"] for r in ev)
    n_minutes = gmax - gmin + 1
    got = {
        r["event_type"]: (r["n_minutes"], r["n_events"], r["fano_factor"])
        for r in rows
    }
    for et, cc in counts.items():
        s = sum(cc.values())
        ssq = sum(v * v for v in cc.values())
        fano = (n_minutes * ssq - s * s) / (n_minutes * s)
        g = got[et]
        assert g[0] == n_minutes
        assert g[1] == s
        assert abs(g[2] - fano) < 1e-9
        # variance/mean of a counting process is nonnegative
        assert g[2] >= 0.0
