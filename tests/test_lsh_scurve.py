"""LSH S-curve invariants beyond the hash oracle: band counts must
reconcile with the component pair queries, detection must be perfect
at the top band, and the analytic curve must be monotone."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.operators.dedup import (
    N_BANDS,
    N_MINHASH,
    SCURVE_BANDS,
)

SF = "/root/testdata/sf0.001"


def test_scurve_reconciles_with_components(spark):
    q = entrymod.queries()
    rows = q["dedup_lsh_scurve_eval"](spark, SF).collect()
    assert rows
    truth = q["dedup_ngram_jaccard_pairs"](spark, SF).collect()
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in q["dedup_minhash_pairs"](spark, SF).collect()
    }
    bands = {}
    for r in truth:
        b = math.floor(r["jaccard"] * SCURVE_BANDS)
        n, d = bands.get(b, (0, 0))
        bands[b] = (n + 1, d + ((r["doc_a"], r["doc_b"]) in lsh))
    got = {r["jaccard_band"]: (r["n_true"], r["n_detected"]) for r in rows}
    assert got == bands
    r_rows = N_MINHASH // N_BANDS
    for r in rows:
        s = r["jaccard_band"] / SCURVE_BANDS
        analytic = 1.0 - (1.0 - s**r_rows) ** N_BANDS
        assert abs(r["analytic_floor_prob"] - analytic) < 1e-12
        assert 0.0 <= r["detect_rate"] <= 1.0
    # identical documents (band 20) can never be missed by banding
    top = [r for r in rows if r["jaccard_band"] == SCURVE_BANDS]
    for r in top:
        assert r["detect_rate"] == 1.0
