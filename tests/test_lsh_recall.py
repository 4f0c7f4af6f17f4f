"""LSH recall-eval invariants beyond the hash oracle: the counts must
reconcile with the two component queries it composes, precision must
be exactly 1.0 (candidates are exact-verified), and recall must be a
proper fraction."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_lsh_recall_reconciles_with_components(spark):
    q = entrymod.queries()
    row = q["dedup_lsh_recall_eval"](spark, SF).collect()[0]
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in q["dedup_ngram_jaccard_pairs"](spark, SF).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in q["dedup_minhash_pairs"](spark, SF).collect()
    }
    assert row["n_true_pairs"] == len(truth)
    assert row["n_lsh_pairs"] == len(lsh)
    assert row["n_found"] == len(truth & lsh)
    # candidates are exact-Jaccard verified: LSH pairs are a SUBSET of
    # the truth, so precision is 1.0 by construction
    assert lsh <= truth
    assert row["precision"] == 1.0
    assert abs(row["recall"] - len(truth & lsh) / len(truth)) < 1e-12
    assert 0.0 < row["recall"] <= 1.0
