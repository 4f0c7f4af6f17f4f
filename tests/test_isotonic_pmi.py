"""Semantic invariants of the isotonic fit and the PMI collocations
beyond the hash oracle: the minimax isotonic fit must equal an
independent pool-adjacent-violators (PAVA) run, and the PMI top-k must
equal a plain Counter recomputation."""

from __future__ import annotations

from collections import Counter

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.text_analysis import (
    PMI_MIN_SUPPORT,
    PMI_TOP_K,
)

SF = "/root/testdata/sf0.001"


def test_isotonic_fit_matches_pava(spark):
    rows = entrymod.queries()["orders_weekly_isotonic_fit"](
        spark, SF
    ).collect()
    assert rows
    # raw weekly series straight off the parquet, same cents contract
    weekly = {
        r["week_idx"]: (r["n_orders"], r["week_avg_cents"]) for r in rows
    }
    ordered = sorted(weekly)
    # independent PAVA over (sum_cents, n_orders) integer pairs
    ys = [round(weekly[w][1] * weekly[w][0]) for w in ordered]
    ws = [weekly[w][0] for w in ordered]
    blocks: list[tuple[int, int, int]] = []  # (sum, weight, width)
    for y, w in zip(ys, ws):
        blocks.append((y, w, 1))
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            s2, w2, k2 = blocks.pop()
            s1, w1, k1 = blocks.pop()
            blocks.append((s1 + s2, w1 + w2, k1 + k2))
    expect = []
    for s, w, k in blocks:
        expect.extend([s / w] * k)
    got = [r["iso_fit_cents"] for r in rows]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert abs(g - e) < 1e-6 * max(1.0, abs(e))
    # the fit is non-decreasing and preserves the weighted mean
    assert all(a <= b + 1e-9 for a, b in zip(got, got[1:]))
    total_w = sum(ws)
    assert (
        abs(
            sum(f * w for f, w in zip(got, ws)) / total_w
            - sum(ys) / total_w
        )
        < 1e-6
    )


def test_pmi_matches_python_counter(spark):
    rows = entrymod.queries()["docs_pmi_collocations"](spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    uni: Counter = Counter()
    big: Counter = Counter()
    for r in docs:
        ts = r["text"].split(" ")
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    n_uni = sum(uni.values())
    scored = [
        (
            (c12 * n_uni) / (uni[w1] * uni[w2]),
            w1,
            w2,
            c12,
            uni[w1],
            uni[w2],
        )
        for (w1, w2), c12 in big.items()
        if c12 >= PMI_MIN_SUPPORT
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = scored[:PMI_TOP_K]
    got = [
        (r["pmi_lift"], r["w1"], r["w2"], r["c12"], r["c1"], r["c2"])
        for r in rows
    ]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[1:] == e[1:]
        assert abs(g[0] - e[0]) < 1e-12 * max(1.0, e[0])
    # every reported pair really beats independence at the floor
    assert all(r["c12"] >= PMI_MIN_SUPPORT for r in rows)
