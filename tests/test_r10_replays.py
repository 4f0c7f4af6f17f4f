"""Pure-Python replays for the round-10 operators whose Spark and
DuckDB forms share authored logic (CASE ladders / dialect-switched
SQL) — the class where the dual-engine oracle is blind to a rule
mis-stated identically on both sides (the r9 empty-frame SUM lesson).
Each replay is a third implementation: pandas + plain loops, no SQL."""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.stats_ext import MASE_SEASON_DAYS
from end2end_data_pipeline_spark.operators.temporal import (
    ATTR_SCALE,
    ATTR_WINDOW_S,
)

SF = "/root/testdata/sf0.001"


def _load_events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # the fixture stores naive microsecond timestamps; integer µs is
    # all the replay needs (same quantity unix_micros/epoch_us read).
    # Normalize to ns FIRST: pandas 2.x preserves the parquet's [us]
    # unit, so a bare astype(int64)//1000 would yield MILLISECONDS and
    # silently widen the lookback window 1000x (this replay's own
    # first bug — the engines were right)
    ev = ev[ev["event_type"].isin(["purchase", "view", "click"])].copy()
    ev["em"] = ev["ts"].astype("datetime64[ns]").astype("int64") // 1000
    return ev


@pytest.mark.slow
def test_attribution_model_compare_matches_replay(spark):
    got = {
        (r["model"], r["channel"]): (r["n_purchases"], r["millicredits"])
        for r in entrymod.queries()["purchase_attribution_model_compare"](
            spark, SF
        ).collect()
    }

    ev = _load_events()
    acc: dict[tuple[str, str], list[int]] = {}

    def credit(model, channel, credits):
        cell = acc.setdefault((model, channel), [0, 0])
        cell[0] += 1
        cell[1] += credits

    win = ATTR_WINDOW_S * 1_000_000
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("em")
        ems = g["em"].tolist()
        types = g["event_type"].tolist()
        for i, (em, typ) in enumerate(zip(ems, types)):
            if typ != "purchase":
                continue
            touches = [
                (ems[j], types[j])
                for j in range(len(ems))
                if em - win <= ems[j] <= em - 1
                and types[j] in ("view", "click")
            ]
            nv = sum(1 for _, t in touches if t == "view")
            nc = len(touches) - nv
            if not touches:
                credit("first_touch", "unattributed", ATTR_SCALE)
                credit("last_touch", "unattributed", ATTR_SCALE)
                credit("linear", "unattributed", ATTR_SCALE)
                continue
            # fixed tie rule: click wins on an equal microsecond
            first = min(touches, key=lambda x: (x[0], x[1] != "click"))
            last = max(touches, key=lambda x: (x[0], x[1] == "click"))
            credit("first_touch", first[1], ATTR_SCALE)
            credit("last_touch", last[1], ATTR_SCALE)
            mc = ATTR_SCALE // (nv + nc)
            if nv:
                credit("linear", "view", nv * mc)
            if nc:
                credit("linear", "click", nc * mc)
    want = {k: tuple(v) for k, v in acc.items()}
    assert got == want


@pytest.mark.slow
def test_seasonal_naive_mase_matches_replay(spark):
    row = (
        entrymod.queries()["orders_seasonal_naive_mase"](spark, SF)
        .collect()[0]
        .asDict()
    )

    o = pd.read_parquet(f"{SF}/orders.parquet")
    day = o["o_orderdate"].dt.floor("D")
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    daily = cents.groupby(day).sum()
    idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
    dense = daily.reindex(idx, fill_value=0).tolist()
    s = MASE_SEASON_DAYS
    sae_seasonal = sum(
        abs(dense[i] - dense[i - s]) for i in range(s, len(dense))
    )
    sae_naive = sum(
        abs(dense[i] - dense[i - 1]) for i in range(s, len(dense))
    )
    assert row["n_days_eval"] == len(dense) - s
    assert row["sae_seasonal_cents"] == sae_seasonal
    assert row["sae_naive_cents"] == sae_naive
    assert row["mase"] == sae_seasonal / sae_naive
