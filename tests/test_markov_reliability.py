"""Markov reliability invariants beyond the hash oracle: the rows
must reconcile exactly with the registered backtest, confidence must
be the train-side argmax probability, and the gap must be their
difference."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_reliability_reconciles_with_backtest(spark):
    q = entrymod.queries()
    rel = {r["event_type"]: r for r in q["markov_reliability"](spark, SF).collect()}
    back = {
        r["event_type"]: r
        for r in q["markov_backtest_hitrate"](spark, SF).collect()
    }
    assert set(rel) == set(back)
    for et, r in rel.items():
        b = back[et]
        # shared columns agree exactly with the backtest
        assert r["pred_type"] == b["pred_type"]
        assert r["n_train"] == b["n_train"]
        assert r["n_test"] == b["n_test"]
        assert r["n_hits"] == b["n_hits"]
        assert abs(r["hit_rate"] - b["hit_rate"]) < 1e-15
        # confidence is exactly the argmax train share, in (0, 1]
        assert 0 < r["n_pred_train"] <= r["n_train"]
        assert abs(r["confidence"] - r["n_pred_train"] / r["n_train"]) < 1e-15
        assert 0.0 < r["confidence"] <= 1.0
        assert (
            abs(r["calibration_gap"] - (r["confidence"] - r["hit_rate"]))
            < 1e-15
        )
