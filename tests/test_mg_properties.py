"""Property tests for the batched mergeable Misra-Gries candidate
pass (r10 rewrite of ``operators/text_analysis._mg_candidates``).

The exact-verify filter downstream makes the FINAL query output
correct as long as MG emits a SUPERSET of the true heavy hitters —
that superset guarantee is therefore the one property the rewrite
must never lose, under EVERY batch split (Arrow batch boundaries are
an execution detail; ``tools/partition_stress.py`` runs 7-row batches
for the same reason). Verified here pure-Python against brute-force
counts, for random streams, random batch splits, and a small counter
budget so evictions actually happen."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from end2end_data_pipeline_spark.operators import text_analysis as ta

TOKEN = st.sampled_from([f"t{i}" for i in range(12)])


def _run_mg(tokens: list[str], cuts: list[int], k: int):
    """Drive _mg_candidates with an explicit batch split and counter
    budget; return (candidate set, reported total)."""
    bounds = sorted({c % (len(tokens) + 1) for c in cuts})
    pieces, prev = [], 0
    for b in bounds + [len(tokens)]:
        if b > prev:
            pieces.append(tokens[prev:b])
            prev = b
    frames = (pd.DataFrame({"token": p}) for p in pieces if p)
    old_k = ta.MG_COUNTERS
    ta.MG_COUNTERS = k
    try:
        out = pd.concat(list(ta._mg_candidates(frames)), ignore_index=True)
    finally:
        ta.MG_COUNTERS = old_k
    cands = set(out.loc[out["token"].notna(), "token"])
    total = int(out.loc[out["token"].isna(), "n"].sum())
    return cands, total


@given(
    toks=st.lists(TOKEN, min_size=1, max_size=300),
    cuts=st.lists(st.integers(0, 300), max_size=8),
    k=st.integers(2, 6),
)
@settings(max_examples=200, deadline=None)
def test_mg_candidates_superset_of_heavy_hitters(toks, cuts, k):
    cands, total = _run_mg(toks, cuts, k)
    assert total == len(toks)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    heavy = {t for t, c in counts.items() if c * k > len(toks)}
    assert heavy <= cands, (heavy - cands, counts, k)


@given(
    toks=st.lists(TOKEN, min_size=1, max_size=300),
    cuts=st.lists(st.integers(0, 300), max_size=8),
    k=st.integers(2, 6),
)
@settings(max_examples=100, deadline=None)
def test_mg_state_stays_bounded(toks, cuts, k):
    """The merge must trim back to at most k surviving counters —
    the whole point of MG is O(k) state per partition."""
    cands, _ = _run_mg(toks, cuts, k)
    assert len(cands) <= k
