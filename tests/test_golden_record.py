"""Replay test for ``customer_golden_record`` (r10): the election is
recomputed in pure pandas — a third implementation sharing no SQL
with either engine — because the dual-engine oracle cannot catch a
rule both engines mis-state identically (the r9 empty-frame SUM
lesson). Covers every branch: multi-copy customers, per-field nulls,
whole-field dead (all copies null), and the freshness tie-impossible
invariant."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.reconcile import GOLDEN_MAX_COPIES

SF = "/root/testdata/sf0.001"


def _expected(customer: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, c in customer.iterrows():
        key = int(c["c_custkey"])
        copies = []
        for r in range(key % GOLDEN_MAX_COPIES + 1):
            fresh = (key * 31 + r * 17) % 100
            copies.append(
                {
                    "freshness": fresh,
                    "name_v": None if (key + r) % 4 == 0 else f"{c['c_name']}-v{r}",
                    "seg_v": None
                    if (key + r) % 5 == 0
                    else f"{c['c_mktsegment']}/v{r}",
                    "bal_v": None
                    if (key + r) % 7 == 0
                    else round(float(c["c_acctbal"]) * 100) + r,
                }
            )
        # tie-impossible freshness within one customer (r in 0..2)
        freshes = [cp["freshness"] for cp in copies]
        assert len(freshes) == len(set(freshes))

        def elect(field):
            live = [cp for cp in copies if cp[field] is not None]
            if not live:
                return None
            return max(live, key=lambda cp: cp["freshness"])[field]

        name_g, seg_g, bal_g = elect("name_v"), elect("seg_v"), elect("bal_v")
        rows.append(
            {
                "c_custkey": key,
                "n_copies": len(copies),
                "name_golden": name_g,
                "seg_golden": seg_g,
                "bal_golden_cents": bal_g,
                "n_dead_fields": sum(
                    v is None for v in (name_g, seg_g, bal_g)
                ),
            }
        )
    return pd.DataFrame(rows).sort_values("c_custkey").reset_index(drop=True)


@pytest.mark.slow
def test_golden_record_matches_pure_python_replay(spark):
    got = (
        entrymod.queries()["customer_golden_record"](spark, SF)
        .toPandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    customer = pd.read_parquet(f"{SF}/customer.parquet")
    want = _expected(customer)
    assert len(got) == len(want) == len(customer)

    def norm(series):
        # nullable BIGINTs arrive as float64-with-NaN from toPandas;
        # compare as int-or-None so NaN != NaN can't false-fail
        out = []
        for x in series:
            if pd.isna(x):
                out.append(None)
            elif isinstance(x, float) and x.is_integer():
                out.append(int(x))
            else:
                out.append(x)
        return out

    for col in want.columns:
        g, w = norm(got[col]), norm(want[col])
        assert g == w, f"column {col} diverges from the replay"
