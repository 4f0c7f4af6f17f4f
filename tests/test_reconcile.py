"""Invariants of the reconciliation family (operators/reconcile.py and
the proration kernel in operators/relational_ext.py) that the
hash-oracle can't express:

- Bloom filters admit false positives but NEVER false negatives;
- largest-remainder proration conserves every order's total to the
  exact cent;
- the snapshot diff's class counts must equal an independent
  recomputation from the raw keys (not the same SQL run twice).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.reconcile import (
    _DEL_EVERY,
    _INS_EVERY,
    _UPD_EVERY,
)
from end2end_data_pipeline_spark.operators.relational_ext import (
    PRORATE_EVERY,
    _proration_sql,
)
from end2end_data_pipeline_spark.sources.tables import register_views

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives(spark):
    row = entrymod.queries()["bloom_prefilter_audit"](spark, SF).collect()[0]
    # the Bloom contract: every member probes positive
    assert row["n_true_pos"] == row["n_members"]
    assert row["n_members"] > 0  # fixture exercises the member branch
    assert row["n_false_pos"] >= 0
    assert row["n_setbits"] > 0


def test_proration_conserves_order_totals(spark):
    alloc = entrymod.queries()["order_allocation_proration"](spark, SF)
    per_order = alloc.groupBy("l_orderkey", "total_cents").agg(
        F.sum("alloc_cents").alias("alloc_sum"),
        F.count("*").alias("n_lines"),
    )
    bad = per_order.where(
        F.col("alloc_sum") != F.col("total_cents")
    ).collect()
    assert bad == [], f"cents leaked on orders: {bad[:5]}"
    assert per_order.count() > 0  # subset is non-empty at sf0.001


def test_proration_extra_cents_bounded_by_lines(spark):
    """Each line gets its floor share or floor+1 — never more."""
    register_views(spark, SF, "lineitem", "orders")
    sql = _proration_sql("spark").replace(
        "SELECT k AS l_orderkey",
        "SELECT CAST(rk <= total - base_sum AS INT) AS got_extra,"
        " base_cents, k AS l_orderkey",
    )
    rows = spark.sql(sql).collect()
    assert rows, "fixture subset empty"
    for r in rows:
        assert r["alloc_cents"] - r["base_cents"] == r["got_extra"]
        assert r["got_extra"] in (0, 1)


def test_snapshot_reconcile_counts_match_key_arithmetic(spark):
    """Recompute the four class counts from the raw keys with plain
    DataFrame set algebra (no digests) and compare."""
    got = {
        r["diff_class"]: r["n_rows"]
        for r in entrymod.queries()["snapshot_reconcile_audit"](
            spark, SF
        ).collect()
    }
    keys = [
        r["o_orderkey"]
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey")
        .collect()
    ]
    deleted = {k for k in keys if k % _DEL_EVERY == 0}
    added = {k for k in keys if k % _INS_EVERY == 0}
    changed = {
        k for k in keys if k % _UPD_EVERY == 0 and k not in deleted
    }
    expect = {
        "added": len(added),
        "deleted": len(deleted),
        "changed": len(changed),
        "unchanged": len(keys) - len(deleted) - len(changed),
    }
    assert got == {c: n for c, n in expect.items() if n > 0}


@pytest.mark.parametrize(
    "name",
    [
        "snapshot_reconcile_audit",
        "bloom_prefilter_audit",
        "order_allocation_proration",
    ],
)
def test_survives_empty_inputs(spark, name, tmp_path):
    for t in ("orders", "customer", "lineitem"):
        (
            spark.read.parquet(f"{SF}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(str(tmp_path / f"{t}.parquet"))
        )
    entrymod.queries()[name](spark, str(tmp_path)).collect()


def test_prorate_subset_is_stable():
    # the oracle SQL and the Spark SQL must agree on the subset knob
    assert f"% {PRORATE_EVERY}" in _proration_sql("duck")
