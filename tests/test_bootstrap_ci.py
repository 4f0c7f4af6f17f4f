"""Poisson-bootstrap CI invariants beyond the hash oracle: the full
deterministic replicate ensemble must equal a Python recomputation,
and the interval must bracket the point estimate with sane width."""

from __future__ import annotations

import hashlib

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.functions.texthash import MINHASH_P
from end2end_data_pipeline_spark.operators.stats_ext import (
    BOOT_B,
    BOOT_HI,
    BOOT_LO,
    BOOT_SALT,
    _boot_coeff_rows,
    _POIS_CUM,
)

SF = "/root/testdata/sf0.001"


def _h0(orderkey: int) -> int:
    h = int(
        hashlib.md5(f"{BOOT_SALT}:{orderkey}".encode()).hexdigest()[:15], 16
    )
    return h % (1 << 30)


def _weight(h: int) -> int:
    m = h % 10000
    for w, c in enumerate(_POIS_CUM):
        if m < c:
            return w
    return 6


def test_bootstrap_matches_python(spark):
    row = entrymod.queries()["orders_revenue_bootstrap_ci"](
        spark, SF
    ).collect()[0]
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .selectExpr(
            "o_orderkey", "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents"
        )
        .collect()
    )
    coeffs = _boot_coeff_rows()
    sums = [0] * BOOT_B
    point = 0
    for r in orders:
        h0 = _h0(r["o_orderkey"])
        c = r["cents"]
        point += c
        for j, a, b in coeffs:
            sums[j] += _weight((a * h0 + b) % MINHASH_P) * c
    sums.sort()
    lo = sums[-(-BOOT_LO * BOOT_B // 100) - 1]
    hi = sums[-(-BOOT_HI * BOOT_B // 100) - 1]
    assert row["point_cents"] == point
    assert row["n_orders"] == len(orders)
    assert row["n_replicates"] == BOOT_B
    assert row["ci_lo_cents"] == lo
    assert row["ci_hi_cents"] == hi
    # the interval brackets the point estimate and is nondegenerate
    assert lo < point < hi
    # width sanity: a Poisson bootstrap of a sum has relative CI width
    # on the order of n^-1/2 — far below 50% at any corpus size
    assert (hi - lo) / point < 0.5
