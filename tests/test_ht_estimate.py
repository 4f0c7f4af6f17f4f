"""Horvitz-Thompson audit invariants beyond the hash oracle: a Python
replay of the hash sample and estimator, plus design-based sanity
(sampling fraction near nominal, estimate reconstruction)."""

from __future__ import annotations

import hashlib

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.sampling import HT_PCT, HT_SALT

SF = "/root/testdata/sf0.001"


def _sampled(orderkey: int) -> bool:
    h = int(
        hashlib.md5(f"{HT_SALT}:{orderkey}".encode()).hexdigest()[:15], 16
    )
    return h % 100 < HT_PCT


def test_ht_estimate_matches_python(spark):
    row = entrymod.queries()["orders_ht_estimate_audit"](spark, SF).collect()[
        0
    ]
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr(
            "o_orderkey", "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents"
        )
        .collect()
    )
    true_cents = sum(r["cents"] for r in orders)
    s_cents = sum(r["cents"] for r in orders if _sampled(r["o_orderkey"]))
    n_s = sum(1 for r in orders if _sampled(r["o_orderkey"]))
    est = s_cents * 100 // HT_PCT
    assert row["n_population"] == len(orders)
    assert row["n_sampled"] == n_s
    assert row["true_cents"] == true_cents
    assert row["ht_estimate_cents"] == est
    assert row["error_cents"] == est - true_cents
    assert abs(row["rel_error"] - (est - true_cents) / true_cents) < 1e-12
    # the hash sample lands near its nominal fraction, and the HT
    # estimate lands near the truth (loose n^-1/2-ish bounds for the
    # small corpus)
    assert abs(n_s / len(orders) - HT_PCT / 100) < 0.05
    assert abs(row["rel_error"]) < 0.15
