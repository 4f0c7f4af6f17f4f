"""Split-drift and vocabulary-coverage invariants beyond the hash
oracle: Python replays plus the structural laws (cosine in (0, 1],
coverage monotone to 1.0)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import __spark_entry__ as entrymod
from end2end_data_pipeline_spark.functions.vectors import SCALE
from end2end_data_pipeline_spark.operators.similarity import DRIFT_SALT
from end2end_data_pipeline_spark.operators.text_analysis import VOCAB_KS

SF = "/root/testdata/sf0.001"


def _in_a(vec_id: int) -> bool:
    h = int(
        hashlib.md5(f"{DRIFT_SALT}:{vec_id}".encode()).hexdigest()[:15], 16
    )
    return h % 2 == 0


def test_split_drift_matches_python(spark):
    rows = entrymod.queries()["embedding_split_drift"](spark, SF).collect()
    assert rows
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    sums = defaultdict(lambda: [None, None, 0, 0])  # sa, sb, na, nb
    for r in emb:
        qv = [round(float(x) * SCALE) for x in r["embedding"]]
        e = sums[r["label"]]
        if _in_a(r["vec_id"]):
            e[0] = qv if e[0] is None else [a + b for a, b in zip(e[0], qv)]
            e[2] += 1
        else:
            e[1] = qv if e[1] is None else [a + b for a, b in zip(e[1], qv)]
            e[3] += 1
    got = {
        r["label"]: (r["n_a"], r["n_b"], r["centroid_cosine"]) for r in rows
    }
    for lbl, (sa, sb, na, nb) in sums.items():
        g = got[lbl]
        assert g[:2] == (na, nb)
        dot = sum(a * b for a, b in zip(sa, sb))
        cos = dot / (
            math.sqrt(sum(a * a for a in sa)) * math.sqrt(sum(b * b for b in sb))
        )
        assert abs(g[2] - cos) < 1e-9
        # a proper cosine; NOTE the synthetic labels are not tight
        # clusters, so values near (even below) zero are the CORRECT
        # report — the audit exists to expose exactly that
        assert -1.0 - 1e-12 <= g[2] <= 1.0 + 1e-12


def test_coverage_curve_matches_python(spark):
    rows = entrymod.queries()["vocab_coverage_curve"](spark, SF).collect()
    assert len(rows) == len(VOCAB_KS)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts: Counter = Counter()
    for r in docs:
        counts.update(r["text"].split(" "))
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    got = {
        r["vocab_k"]: (
            r["n_vocab"],
            r["n_tokens"],
            r["covered_tokens"],
            r["coverage"],
        )
        for r in rows
    }
    prev = 0.0
    for k in VOCAB_KS:
        covered = sum(c for _, c in ordered[:k])
        g = got[k]
        assert g[:3] == (len(counts), total, covered)
        assert abs(g[3] - covered / total) < 1e-12
        # coverage is monotone nondecreasing in k, bounded by 1
        assert prev <= g[3] <= 1.0 + 1e-12
        prev = g[3]
