"""Hot-key guard tests for the dedup layer.

Two caps protect candidate generation from quadratic blowup on skewed
corpora: the shingle document-frequency cap in exact n-gram Jaccard
(``SHINGLE_DF_CAP``) and the LSH bucket-size cap in MinHash banding
(``LSH_BUCKET_CAP``). Both must (a) be no-ops on the benign driver
fixture — the default caps change nothing — and (b) actually gate a
synthetic hot-key corpus where every shingle/bucket is oversize.
"""

from __future__ import annotations

import os

import pytest

from end2end_data_pipeline_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    SHINGLE_DF_CAP,
    dedup_minhash_pairs,
    dedup_ngram_jaccard_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    """A degenerate corpus: 20 identical documents. Every shingle has
    document frequency 20 and every LSH band bucket holds all 20 docs,
    so an uncapped index generates all 190 pairs."""
    out = str(tmp_path_factory.mktemp("hotcorpus"))
    text = " ".join(f"tok{i}" for i in range(30))
    rows = [(i, text, "en", "synthetic", len(text)) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(os.path.join(out, "documents.parquet"))
    return out


def test_ngram_cap_inert_on_benign_corpus(spark):
    """Default cap == uncapped results on the driver fixture (no
    shingle there is hot), so the guard costs no recall."""
    capped = dedup_ngram_jaccard_pairs(spark, SF, df_cap=SHINGLE_DF_CAP).collect()
    uncapped = dedup_ngram_jaccard_pairs(spark, SF, df_cap=1 << 40).collect()
    assert capped == uncapped
    assert len(capped) > 0


def test_ngram_cap_gates_hot_shingles(spark, hot_dir):
    # uncapped: 20 identical docs -> all 190 pairs at jaccard 1.0
    uncapped = dedup_ngram_jaccard_pairs(spark, hot_dir, df_cap=1 << 40).collect()
    assert len(uncapped) == 20 * 19 // 2
    # every shingle has df=20 > 10 -> dropped from the index ->
    # no candidates survive, bounding the join away from quadratic
    capped = dedup_ngram_jaccard_pairs(spark, hot_dir, df_cap=10).collect()
    assert capped == []


def test_minhash_bucket_cap_inert_on_benign_corpus(spark):
    capped = dedup_minhash_pairs(spark, SF, bucket_cap=LSH_BUCKET_CAP).collect()
    uncapped = dedup_minhash_pairs(spark, SF, bucket_cap=1 << 40).collect()
    assert capped == uncapped
    assert len(capped) > 0


def test_minhash_bucket_cap_gates_hot_buckets(spark, hot_dir):
    # identical docs share identical signatures -> one bucket of 20
    # per band -> uncapped yields all 190 verified pairs
    uncapped = dedup_minhash_pairs(spark, hot_dir, bucket_cap=1 << 40).collect()
    assert len(uncapped) == 20 * 19 // 2
    capped = dedup_minhash_pairs(spark, hot_dir, bucket_cap=10).collect()
    assert capped == []


def test_prefix_filter_exact_and_complete(spark, hot_dir):
    """Prefix filtering is EXACT at the threshold: it must reproduce
    the uncapped ground truth everywhere — including on the hot corpus
    where the df-cap surrenders recall (hot shingles sort LAST in the
    rarest-first prefix order but identical 30-shingle sets still
    collide inside their 16-element prefixes)."""
    from end2end_data_pipeline_spark.operators.dedup import (
        dedup_prefixfilter_pairs,
    )

    pref = {
        (r.doc_a, r.doc_b) for r in dedup_prefixfilter_pairs(spark, SF).collect()
    }
    truth = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard_pairs(spark, SF, df_cap=1 << 40).collect()
    }
    assert pref == truth and len(pref) > 0
    hot = dedup_prefixfilter_pairs(spark, hot_dir).collect()
    assert len(hot) == 20 * 19 // 2


@pytest.fixture(scope="module")
def hot_size_dir(spark, tmp_path_factory):
    """A degenerate catalog: 40 parts in ONE size block. Uncapped, the
    size-only truth universe is all C(40,2)=780 pairs; the block cap
    must bound it to C(cap,2) regardless of block population."""
    out = str(tmp_path_factory.mktemp("hotcatalog"))
    rows = [
        (i, f"peach plum pear no{i}", f"Brand#{i % 3}", 7) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_size int"
    )
    df.coalesce(1).write.parquet(os.path.join(out, "part.parquet"))
    return out


def test_typo_block_cap_inert_on_benign_catalog(spark):
    """Default cap == uncapped results on the driver fixture (no size
    block there reaches the cap), so the guard costs no eval fidelity
    at rehearsal scales."""
    from end2end_data_pipeline_spark.operators.affinity import (
        TYPO_BLOCK_CAP,
        typo_blocking_recall_eval,
    )

    capped = typo_blocking_recall_eval(
        spark, SF, block_cap=TYPO_BLOCK_CAP
    ).collect()
    uncapped = typo_blocking_recall_eval(spark, SF, block_cap=1 << 40).collect()
    assert capped == uncapped
    assert capped[0]["n_truth_parts"] == capped[0]["n_parts"] > 0


def test_typo_block_cap_bounds_hot_size_block(spark, hot_size_dir):
    """VERDICT r10 #4: doubling a skewed-size fixture must NOT grow the
    truth universe past |size domain| x C(cap, 2) — the cap keeps the
    candidate count flat, exactly like LSH_BUCKET_CAP."""
    from end2end_data_pipeline_spark.operators.affinity import (
        typo_blocking_recall_eval,
    )

    uncapped = typo_blocking_recall_eval(
        spark, hot_size_dir, block_cap=1 << 40
    ).collect()[0]
    assert uncapped["n_relaxed_candidates"] == 40 * 39 // 2

    capped = typo_blocking_recall_eval(
        spark, hot_size_dir, block_cap=10
    ).collect()[0]
    assert capped["n_parts"] == 40
    assert capped["n_truth_parts"] == 10
    assert capped["n_relaxed_candidates"] == 10 * 9 // 2
