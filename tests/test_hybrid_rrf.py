"""Semantic invariants of hybrid RRF fusion beyond the hash oracle:
the fused list must equal a Python recomputation that composes the
registered BM25 ranking with a NumPy-free quantized-cosine ranking."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.functions.vectors import SCALE
from end2end_data_pipeline_spark.operators.reporting_ext import (
    RRF_K,
    RRF_QUERY_ID,
    RRF_SEM_POOL,
    RRF_TOP,
)

SF = "/root/testdata/sf0.001"


def test_rrf_matches_python_fusion(spark):
    fused = entrymod.queries()["docs_hybrid_rrf_search"](spark, SF).collect()
    assert 0 < len(fused) <= RRF_TOP

    # lexical ranks: straight from the registered BM25 query
    lex_rows = entrymod.queries()["docs_bm25_search"](spark, SF).collect()
    lex_rank = {r["doc_id"]: i + 1 for i, r in enumerate(lex_rows)}

    # semantic ranks: quantized cosine against the anchor, in Python
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    qv = {
        r["vec_id"]: [round(float(x) * SCALE) for x in r["embedding"]]
        for r in emb
    }
    anchor = qv[RRF_QUERY_ID]
    a_norm = math.sqrt(float(sum(x * x for x in anchor)))
    sims = []
    for vid, v in qv.items():
        if vid == RRF_QUERY_ID:
            continue
        dot = sum(x * y for x, y in zip(v, anchor))
        sims.append(
            (float(dot) / (math.sqrt(float(sum(x * x for x in v))) * a_norm), vid)
        )
    sims.sort(key=lambda t: (-t[0], t[1]))
    sem_rank = {vid: i + 1 for i, (_, vid) in enumerate(sims[:RRF_SEM_POOL])}

    pool = set(lex_rank) | set(sem_rank)
    scored = sorted(
        (
            (
                -(
                    (1.0 / (RRF_K + lex_rank[d]) if d in lex_rank else 0.0)
                    + (1.0 / (RRF_K + sem_rank[d]) if d in sem_rank else 0.0)
                ),
                d,
            )
            for d in pool
        ),
    )[:RRF_TOP]
    expect = [
        (d, lex_rank.get(d), sem_rank.get(d), -s) for s, d in scored
    ]
    got = [
        (r["doc_id"], r["lex_rank"], r["sem_rank"], r["rrf_score"])
        for r in fused
    ]
    assert [g[:3] for g in got] == [e[:3] for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[3] - e[3]) < 1e-12
    # a doc present in both pools must outrank one at the same single
    # rank; fusion scores are monotone non-increasing down the list
    assert all(a[3] >= b[3] for a, b in zip(got, got[1:]))
