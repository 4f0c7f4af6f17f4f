"""Ranking-eval invariants beyond the hash oracle: precision@k and
MRR must equal a Python recomputation over the quantized-cosine
neighbor lists, and both metrics must sit in (0, 1]."""

from __future__ import annotations

import math
from collections import defaultdict

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.functions.vectors import SCALE
from end2end_data_pipeline_spark.operators.similarity import (
    QUERY_STRIDE,
    RR_SCALE,
    TOP_K,
)

SF = "/root/testdata/sf0.001"


def test_ranking_eval_matches_python(spark):
    rows = entrymod.queries()["knn_ranking_eval"](spark, SF).collect()
    assert rows
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    qv = {
        r["vec_id"]: [round(float(x) * SCALE) for x in r["embedding"]]
        for r in emb
    }
    label = {r["vec_id"]: r["label"] for r in emb}
    norm = {
        vid: math.sqrt(float(sum(x * x for x in v))) for vid, v in qv.items()
    }
    per_label = defaultdict(lambda: [0, 0, 0])  # n_queries, n_rel, rr_sum
    for q in sorted(qv):
        if q % QUERY_STRIDE != 0:
            continue
        sims = sorted(
            (
                (
                    -(
                        float(sum(x * y for x, y in zip(qv[q], qv[c])))
                        / (norm[q] * norm[c])
                    ),
                    c,
                )
                for c in qv
                if c != q
            ),
        )[:TOP_K]
        rel = [label[c] == label[q] for _, c in sims]
        acc = per_label[label[q]]
        acc[0] += 1
        acc[1] += sum(rel)
        if any(rel):
            acc[2] += RR_SCALE // (rel.index(True) + 1)
    got = {
        r["label"]: (
            r["n_queries"],
            r["n_rel_total"],
            r["rr_sum"],
            r["precision_at_k"],
            r["mrr"],
        )
        for r in rows
    }
    assert set(got) == set(per_label)
    for lbl, (nq, nrel, rr) in per_label.items():
        g = got[lbl]
        assert g[:3] == (nq, nrel, rr)
        assert abs(g[3] - nrel / (nq * TOP_K)) < 1e-12
        assert abs(g[4] - rr / (RR_SCALE * nq)) < 1e-12
        assert 0.0 <= g[3] <= 1.0 and 0.0 <= g[4] <= 1.0
