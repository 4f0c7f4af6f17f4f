"""Linear-interpolation densification invariants beyond the hash
oracle: a Python recomputation from raw events, plus the contract
boundaries (observed minutes pass through; edges stay NULL; interior
fills lie between their endpoints)."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_lerp_matches_python(spark):
    rows = entrymod.queries()["event_minute_value_lerp"](spark, SF).collect()
    assert rows
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "CAST(date_trunc('minute', ts) AS BIGINT) div 60 AS em", "value"
        )
        .where("value IS NOT NULL")
        .collect()
    )
    obs: dict[int, float] = {}
    for r in ev:
        m, v = r["em"], r["value"]
        if m not in obs or v > obs[m]:
            obs[m] = v
    ms = sorted(obs)
    lo, hi = ms[0], ms[-1]
    # spine bounds come from ALL events (value nulls included)
    allm = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("CAST(date_trunc('minute', ts) AS BIGINT) div 60 AS em")
        .collect()
    )
    smin = min(r["em"] for r in allm)
    smax = max(r["em"] for r in allm)
    assert len(rows) == smax - smin + 1

    expect = {}
    import bisect

    for m in range(smin, smax + 1):
        if m in obs:
            expect[m] = obs[m]
        elif m < lo or m > hi:
            expect[m] = None
        else:
            i = bisect.bisect_left(ms, m)
            pm, nm = ms[i - 1], ms[i]
            pv, nv = obs[pm], obs[nm]
            expect[m] = pv + (nv - pv) * ((m - pm) / (nm - pm))
    got = [r["lerp_value"] for r in rows]
    for m, g in zip(range(smin, smax + 1), got):
        e = expect[m]
        if e is None:
            assert g is None
        else:
            assert g is not None and abs(g - e) < 1e-9 * max(1.0, abs(e))
    # interior fills are bracketed by their endpoints
    for r in rows:
        if r["is_filled"] == 1 and r["lerp_value"] is not None:
            assert (
                min(v for v in obs.values()) - 1e-9
                <= r["lerp_value"]
                <= max(v for v in obs.values()) + 1e-9
            )
