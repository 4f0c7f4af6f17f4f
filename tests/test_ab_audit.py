"""A/B audit invariants beyond the hash oracle: the hash bucketing and
per-arm metrics must equal a Python recomputation, arms must partition
the user base, and re-salting must re-randomize."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.event_analytics import AB_SALT

SF = "/root/testdata/sf0.001"


def _arm(salt: int, user_id: int) -> str:
    h = int(hashlib.md5(f"{salt}:{user_id}".encode()).hexdigest()[:15], 16)
    return "A" if h % 2 == 0 else "B"


def test_ab_audit_matches_python(spark):
    rows = entrymod.queries()["user_ab_experiment_audit"](spark, SF).collect()
    assert {r["arm"] for r in rows} == {"A", "B"}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type")
        .collect()
    )
    users = defaultdict(set)
    events = defaultdict(int)
    purchasers = defaultdict(set)
    purchases = defaultdict(int)
    for r in ev:
        a = _arm(AB_SALT, r["user_id"])
        users[a].add(r["user_id"])
        events[a] += 1
        if r["event_type"] == "purchase":
            purchasers[a].add(r["user_id"])
            purchases[a] += 1
    for r in rows:
        a = r["arm"]
        assert r["n_users"] == len(users[a])
        assert r["n_events"] == events[a]
        assert r["n_purchasers"] == len(purchasers[a])
        assert r["n_purchases"] == purchases[a]
        assert abs(r["conversion_rate"] - len(purchasers[a]) / len(users[a])) < 1e-12
        assert abs(r["events_per_user"] - events[a] / len(users[a])) < 1e-12
    # the arms partition the user base
    assert not (users["A"] & users["B"])
    total_users = len(users["A"] | users["B"])
    assert sum(r["n_users"] for r in rows) == total_users
    # no gross sample-ratio mismatch at this corpus size (loose bound:
    # each arm holds at least a quarter of users)
    for r in rows:
        assert r["n_users"] >= total_users // 4
    # a different salt re-randomizes: at least one user switches arms
    assert any(
        _arm(AB_SALT, u) != _arm(AB_SALT + 1, u)
        for u in list(users["A"] | users["B"])[:50]
    )
