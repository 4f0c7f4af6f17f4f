"""Incremental cross-snapshot dedup: the persisted-store contract.

The production property under test: screening an appended batch
against yesterday's corpus must reuse the PERSISTED fingerprint store
— the prior corpus's text is never re-read and its signatures are
never recomputed. We prove it by persisting the two store tiers to
parquet, dropping the prior text entirely, and showing the decisions
from the read-back store are identical to the registered query (which
derives both snapshots inline).
"""

from __future__ import annotations

from end2end_data_pipeline_spark.operators.dedup import signatures_for
from end2end_data_pipeline_spark.operators.incremental import (
    _decisions_df,
    _snapshots,
    exact_store_for,
    incremental_decisions,
)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_decisions_from_persisted_store_match_inline(spark, sf_dir, tmp_path):
    prior, batch = _snapshots(spark, sf_dir)

    # day 0: build + persist the store (the only pass over prior text)
    exact_store_for(prior).write.parquet(str(tmp_path / "exact_store"))
    signatures_for(prior).write.parquet(str(tmp_path / "minhash_store"))

    # day 1: screen the appended batch against the READ-BACK store —
    # the loaded frames carry no text column, so prior signatures are
    # structurally impossible to recompute here
    exact_store = spark.read.parquet(str(tmp_path / "exact_store"))
    minhash_store = spark.read.parquet(str(tmp_path / "minhash_store"))
    assert "text" not in exact_store.columns
    assert "text" not in minhash_store.columns

    from_store = incremental_decisions(batch, exact_store, minhash_store)
    assert _rows(from_store) == _rows(_decisions_df(spark, sf_dir))


def test_all_tiers_fire_and_provenance_is_prior(spark, sf_dir):
    decisions = _decisions_df(spark, sf_dir).collect()
    by_decision: dict[str, list] = {}
    for r in decisions:
        by_decision.setdefault(r["decision"], []).append(r)
    # the replay injection guarantees exact drops; the corpus's
    # near-dups guarantee minhash drops; most docs are novel
    assert set(by_decision) == {"drop_exact", "drop_minhash", "keep"}
    for r in by_decision["keep"]:
        assert r["matched_doc_id"] == -1
    for tier in ("drop_exact", "drop_minhash"):
        for r in by_decision[tier]:
            # provenance points at a PRIOR-snapshot doc, never the batch
            assert r["matched_doc_id"] >= 0
            assert r["matched_doc_id"] % 4 != 0
