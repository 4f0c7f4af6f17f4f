"""Split-conformal band invariants beyond the hash oracle: a Python
replay of the hash split, nearest-rank bands, and held-out coverage —
and the statistical contract that coverage sits near the nominal
level."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.stats_ext import (
    CONF_HI,
    CONF_LO,
    CONF_SALT,
)
from end2end_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _is_cal(event_id: int) -> bool:
    h = int(
        hashlib.md5(f"{CONF_SALT}:{event_id}".encode()).hexdigest()[:15], 16
    )
    return h % 2 == 0


def _rank_pick(sorted_vals, q):
    idx = -(-q * len(sorted_vals) // 100)
    return sorted_vals[idx - 1]


def test_conformal_matches_python(spark):
    rows = entrymod.queries()["event_value_conformal_bands"](
        spark, SF
    ).collect()
    assert rows
    ev = (
        load_table(spark, SF, "events")
        .select("event_id", "event_type", "value")
        .where("value IS NOT NULL")
        .collect()
    )
    cal = defaultdict(list)
    ev_split = defaultdict(list)
    for r in ev:
        cents = round(r["value"] * 100)
        (cal if _is_cal(r["event_id"]) else ev_split)[r["event_type"]].append(
            cents
        )
    got = {
        r["event_type"]: (
            r["n_cal"],
            r["n_eval"],
            r["lo_cents"],
            r["hi_cents"],
            r["n_covered"],
            r["coverage"],
        )
        for r in rows
    }
    for et, vals in cal.items():
        if et not in ev_split:
            continue
        vals.sort()
        lo = _rank_pick(vals, CONF_LO)
        hi = _rank_pick(vals, CONF_HI)
        evs = ev_split[et]
        n_cov = sum(1 for c in evs if lo <= c <= hi)
        g = got[et]
        assert g[:5] == (len(vals), len(evs), lo, hi, n_cov)
        assert abs(g[5] - n_cov / len(evs)) < 1e-12
        # the honest-band contract: held-out coverage near nominal
        # (loose bound for the small sf0.001 corpus)
        nominal = (CONF_HI - CONF_LO) / 100
        assert abs(g[5] - nominal) < 0.15
