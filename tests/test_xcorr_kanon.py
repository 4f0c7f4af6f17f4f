"""Invariants of the lagged cross-correlation and the k-anonymity
audit beyond the hash oracle: Python recomputations from raw rows."""

from __future__ import annotations

import math
from collections import Counter

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.quality import (
    KANON_K,
    XCORR_LAGS,
    XCORR_X,
    XCORR_Y,
)

SF = "/root/testdata/sf0.001"


def test_crosscorr_matches_python(spark):
    rows = entrymod.queries()["event_minute_crosscorr_lags"](
        spark, SF
    ).collect()
    assert len(rows) == 2 * XCORR_LAGS + 1
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "CAST(date_trunc('minute', ts) AS BIGINT) div 60 AS em",
            "event_type",
        )
        .collect()
    )
    xs: Counter = Counter()
    ys: Counter = Counter()
    for r in ev:
        if r["event_type"] == XCORR_X:
            xs[r["em"]] += 1
        elif r["event_type"] == XCORR_Y:
            ys[r["em"]] += 1
    lo = min(r["em"] for r in ev)
    hi = max(r["em"] for r in ev)
    spine = range(lo, hi + 1)
    for row in rows:
        lag = row["lag_minutes"]
        pairs = [
            (xs.get(t, 0), ys.get(t + lag, 0))
            for t in spine
            if lo <= t + lag <= hi
        ]
        n = len(pairs)
        assert row["n_pairs"] == n
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        if den == 0:
            assert row["pearson_r"] is None
        else:
            expect = (n * sxy - sx * sy) / den
            assert abs(row["pearson_r"] - expect) < 1e-9
        assert row["pearson_r"] is None or -1.0 - 1e-9 <= row["pearson_r"] <= 1.0 + 1e-9


def test_kanonymity_matches_python(spark):
    rows = entrymod.queries()["customer_kanonymity_profile"](
        spark, SF
    ).collect()
    assert rows
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    classes: Counter = Counter()
    for r in cust:
        classes[
            (
                r["c_nationkey"],
                r["c_mktsegment"],
                math.floor(r["c_acctbal"] / 1000),
            )
        ] += 1
    hist: Counter = Counter(classes.values())
    got = {
        r["class_size"]: (r["n_classes"], r["n_customers"], r["below_k"])
        for r in rows
    }
    assert set(got) == set(hist)
    for k, n_cls in hist.items():
        assert got[k] == (n_cls, k * n_cls, int(k < KANON_K))
    # the histogram partitions the table exactly
    assert sum(r["n_customers"] for r in rows) == len(cust)
