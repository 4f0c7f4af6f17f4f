"""Pure-Python replays for the round-10 second-wave operators — same
rationale as test_r10_replays.py: the Spark query and the DuckDB
oracle share authored hash/shingle logic, so a rule mis-stated
identically on both sides would sail through the dual-engine gate.
Each replay here re-derives everything from the written spec (md5 of
the salt string, first 15 hex digits, affine combine mod MINHASH_P)
with hashlib + plain dicts — no texthash builders, no SQL."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

MINHASH_P = 1_073_741_789
BASE_MOD = 1 << 30


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _positional_shingle_hashes(text: str, n: int) -> tuple[int, list[int]]:
    """(n_tokens, positional n-gram hashes) re-derived from the spec."""
    toks = text.split(" ")
    th = [_md5_int(t) % BASE_MOD for t in toks]
    cs = [_md5_int(f"shingle_c_{k}") % BASE_MOD for k in range(n)]
    ph = [
        sum(c * th[i + k] for k, c in enumerate(cs)) % MINHASH_P
        for i in range(len(th) - n + 1)
    ]
    return len(toks), ph


@pytest.mark.slow
def test_repeated_ngram_coverage_matches_replay(spark):
    from end2end_data_pipeline_spark.operators.dedup import DUPSPAN_N

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_positions"],
            r["n_dup_ngrams"],
            r["covered_tokens"],
            r["dup_coverage"],
        )
        for r in entrymod.queries()["dedup_repeated_ngram_coverage"](
            spark, SF
        ).collect()
    }

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_doc: dict[int, tuple[int, list[int]]] = {
        int(r.doc_id): _positional_shingle_hashes(r.text, DUPSPAN_N)
        for r in docs.itertuples()
    }
    docs_with: dict[int, set[int]] = {}
    for doc_id, (_, ph) in per_doc.items():
        for h in ph:
            docs_with.setdefault(h, set()).add(doc_id)
    dup = {h for h, ds in docs_with.items() if len(ds) >= 2}

    assert len(got) == len(per_doc)
    for doc_id, (n_tokens, ph) in per_doc.items():
        starts = [i for i, h in enumerate(ph) if h in dup]
        covered = set()
        for i in starts:
            covered.update(range(i, i + DUPSPAN_N))
        want = (
            n_tokens,
            len(ph),
            len(starts),
            len(covered),
            len(covered) / n_tokens,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
